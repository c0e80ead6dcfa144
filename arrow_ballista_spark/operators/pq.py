"""Product quantization (PQ) over an embedding column — the memory-
compression half of a billion-scale ANN index (Jégou et al. 2011,
"Product Quantization for Nearest Neighbor Search" — public method):
split each d-dim vector into ``m`` subspaces of d/m dims, quantize each
subvector to one of ``k`` codewords, store m small codes instead of d
floats (64 floats -> 8 bytes at m=8, k<=256).

No reference parity: arrow-ballista has no ML operators (SURVEY.md §2 —
extension beyond the reference surface).  Design mirrors the repo's
IVF/k-means conventions so the whole pipeline is value-exact against a
generated DuckDB oracle:

- **Codebooks are deterministic and bounded**: per subspace, the
  codewords are the subvectors of the ``k`` corpus vectors with the
  smallest md5(id) — the same engine-portable seeded sample as IVF's
  coarse centroids (``operators/ivf.py:choose_centroids``); collect is
  k rows, driver work O(k*d), corpus-size-independent.  (Production PQ
  trains per-subspace k-means; the assignment dataflow below is
  identical — swap the codebook source.)
- **Assignment is map-only in spirit**: the m*k codebook broadcasts;
  each (vector, subspace) computes k squared-L2 distances with the
  deterministic left-to-right fold and keeps the argmin via
  ``min_by(code, struct(dist, code))`` — ties break to the smallest
  code, matching the SQL oracle's ``row_number() ORDER BY dist, code``.
- **Regroup is one keyed agg**: codes collect per vector ordered by
  subspace; the reconstruction error is the sum of per-subspace minima
  (rounded — summation order across subspaces is the one
  nondeterministic reduce).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pq_codebooks(
    corpus: DataFrame, id_col: str, vec: str, m: int, k: int
) -> list[list[list[float]]]:
    """``codebooks[s][c]`` = codeword ``c`` of subspace ``s``: the
    subvectors of the k smallest-md5 corpus vectors (md5 of the STRING id
    — bit-identical in DuckDB), code order = md5 order."""
    rows = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec).alias("_v"))
        .orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
        .limit(k)
        .collect()
    )
    if not rows:
        raise ValueError("pq_codebooks: empty corpus")
    d = len(rows[0]["_v"])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    return [
        [[float(x) for x in r["_v"][s * sub : (s + 1) * sub]] for r in rows]
        for s in range(m)
    ]


def pq_encode(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 8,
    k: int = 16,
    books: "list[list[list[float]]] | None" = None,
) -> DataFrame:
    """Encode every vector: ``(id_col, codes array<int> length m,
    recon_err double)`` with ``recon_err`` the total squared quantization
    error (sum over subspaces of the winning codeword's squared L2
    distance — unrounded; callers round for oracle output).  ``books``
    lets a caller that already collected the codebooks (ADC search)
    skip the duplicate sample job."""
    spark = df.sparkSession
    if books is None:
        books = pq_codebooks(df, id_col, vec_col, m, k)
    sub = len(books[0][0])
    cb = spark.createDataFrame(
        [
            (s, c, books[s][c])
            for s in range(m)
            for c in range(k)
        ],
        "s int, code int, cw array<double>",
    )
    e = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    # (vector, subspace) rows: slice is JVM-side, no Python
    sv = e.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
        F.col("_v").alias("_v"),
    ).select(
        id_col,
        "s",
        F.expr(f"slice(_v, s * {sub} + 1, {sub})").alias("sv"),
    )
    scored = sv.join(F.broadcast(cb), "s").withColumn(
        "dist",
        F.expr(
            f"aggregate(sequence(1, {sub}), cast(0.0 as double),"
            " (acc, i) -> acc + (sv[i-1] - cw[i-1]) * (sv[i-1] - cw[i-1]))"
        ),
    )
    best = scored.groupBy(id_col, "s").agg(
        F.expr("min_by(code, struct(dist, code))").alias("code"),
        F.min("dist").alias("dist"),
    )
    return best.groupBy(id_col).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(s, code))),"
            " x -> x.code)"
        ).alias("codes"),
        F.sum("dist").alias("recon_err"),
    )


def pq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec: str = "embedding",
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes — the search half of
    Jégou 2011: the corpus is stored as m codes per vector; each query
    precomputes an (m x n_codes) table of exact subspace distances to
    every codeword, and the approximate distance is the sum of m table
    lookups — the corpus floats are never touched at query time.

    Returns ``(query_id, corpus_id, approx_dist, rnk)`` with rnk by
    (ROUNDED approx_dist ASC, corpus_id): ranking on the 6dp-rounded sum
    makes the kept set engine-stable — identical-code vectors produce
    sums equal to the last ulp, and cross-engine summation-order noise
    (~1e-15 over m=8 addends) cannot flip a 1e-6-rounded key, so ties
    resolve by id identically on both sides (the tfidf lesson: rank by
    the rounded value, not the raw one).

    Scale shape: the query tables (nq * m * n_codes rows) BROADCAST to
    the code join — the corpus side never shuffles before the partial
    (query, corpus) aggregation; per-query top-k is a bounded window.
    """
    from pyspark.sql import Window

    spark = corpus.sparkSession
    books = pq_codebooks(corpus, corpus_id, vec, m, n_codes)
    sub = len(books[0][0])
    cb = spark.createDataFrame(
        [(s, c, books[s][c]) for s in range(m) for c in range(n_codes)],
        "s int, code int, cw array<double>",
    )
    codes = pq_encode(
        corpus, vec, corpus_id, m=m, k=n_codes, books=books
    ).select(corpus_id, F.posexplode("codes").alias("s", "code"))
    qsv = queries.select(
        F.col(query_id),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
        F.col(vec).cast("array<double>").alias("_v"),
    ).select(
        query_id,
        "s",
        F.expr(f"slice(_v, s * {sub} + 1, {sub})").alias("qv"),
    )
    tables = qsv.join(F.broadcast(cb), "s").select(
        query_id,
        "s",
        "code",
        F.expr(
            f"aggregate(sequence(1, {sub}), cast(0.0 as double),"
            " (acc, i) -> acc + (qv[i-1] - cw[i-1]) * (qv[i-1] - cw[i-1]))"
        ).alias("tdist"),
    )
    scored = (
        codes.join(F.broadcast(tables), ["s", "code"])
        .filter(F.col(query_id) != F.col(corpus_id))
        .groupBy(query_id, corpus_id)
        .agg(F.sum("tdist").alias("adist"))
    )
    rounded = (
        F.floor(F.abs(F.col("adist")) * 1e6 + F.lit(0.5)) / 1e6
    )  # adist >= 0: cround without the sign branch
    w = Window.partitionBy(query_id).orderBy(
        rounded.asc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            query_id,
            corpus_id,
            rounded.alias("approx_dist"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
