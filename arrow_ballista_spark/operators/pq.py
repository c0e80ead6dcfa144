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
- **Assignment is map-only** (r12): the m*k codebook rides as one
  constant-folded nested-array literal; each vector computes, per
  subspace, k squared-L2 distances with the deterministic left-to-right
  fold and keeps the argmin via ``array_min`` over ``struct(dist,
  code)`` — ties break to the smallest code, matching the SQL oracle's
  ``row_number() ORDER BY dist, code``.  No explode, no codebook join,
  no (id, s) re-aggregation.
- **Codes and recon_err are projections**: the codes array and the
  reconstruction error (per-subspace minima folded in subspace order)
  come straight off the per-row struct array — zero shuffles in the
  encode (rounded by callers — the 6dp registry contract absorbs
  summation-order noise).
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


def _sq_fold(vec, cw, s, sub: int):
    """Squared-L2 between subvector ``s`` of ``vec`` and codeword ``cw``
    via the canonical left-to-right fold — the SAME addend order as the
    pre-r12 slice+aggregate form and the DuckDB oracles' list_reduce, so
    the map-only kernels below are bit-identical to the joined shape
    they replaced."""
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(sub)),
        F.lit(0.0).cast("double"),
        lambda acc, i: acc
        + (vec[s * F.lit(sub) + i - 1] - cw[i - 1])
        * (vec[s * F.lit(sub) + i - 1] - cw[i - 1]),
    )


def _books_literal(books) -> F.Column:
    """The m*k*sub codebook as ONE parsed SQL array literal.  r13:
    ``F.lit(books)`` converted every nested element through py4j
    individually — ~2 s of pure driver plan-build for the trained
    16x32x4 codebook, the dominant cost of ext_sim_topk_pq_trained
    (measured: adc_build 2.0 s -> ~0.05 s with the parsed form).  The
    repr round-trip CAST is the repo's exact-float64 literal contract
    (``similarity._dlit``), so the column holds bit-identical doubles."""
    from arrow_ballista_spark.operators.similarity import _sql_array

    return F.expr(
        "array("
        + ", ".join(
            "array(" + ", ".join(_sql_array(cw) for cw in sb) + ")"
            for sb in books
        )
        + ")"
    )


def _pq_dist_tables(vec, books):
    """Per-query ADC table as a nested-array column: ``tbl[s][code]`` =
    exact subspace distance from ``vec``'s subvector ``s`` to codeword
    ``code`` — same fold as :func:`_sq_fold`, shaped for the map-only
    ``tbl[s][codes[s]]`` lookup in the search paths (replaces the
    (s, code)-keyed join + per-(query, corpus) SUM: the m addends now
    fold in subspace order inside one row; the ranking key rounds to
    6dp before comparison, so summation-order noise ~1e-15 cannot move
    it — the pq_adc_topk engine-stability contract)."""
    sub = len(books[0][0])
    return F.transform(
        _books_literal(books),
        lambda sb, s: F.transform(
            sb, lambda cw, c: _sq_fold(vec, cw, s, sub)
        ),
    )


def _adc_sum(m: int):
    """The map-only ADC distance: sum of the per-subspace table lookups,
    folded in subspace order over the ``_qt``/``_codes`` columns."""
    return F.expr(
        f"aggregate(sequence(0, {m - 1}), cast(0.0 as double),"
        " (acc, s) -> acc + _qt[s][_codes[s]])"
    )


def _pq_assign_arrow(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    books: "list[list[list[float]]]",
    cents: "list[list[float]] | None" = None,
    residual: bool = False,
) -> DataFrame:
    """ONE vectorized pass over the corpus computing, per row: the IVF
    cell (when ``cents`` is given), the residual basis swap (when
    ``residual``), and the per-subspace PQ assignment — returned as
    ``(id_col[, cell int], _codes array<int>, _dists array<double>)``.

    Why a Python kernel (guide §4.2): the per-row work here is k*m
    squared-L2 folds (+ n_cells cosine folds for IVF) — higher-order
    SQL array functions evaluate this INTERPRETED (CodegenFallback),
    measured ~1 us per multiply-add, while the pre-r12 shape paid an
    explode to (vector, subspace) rows, a codebook broadcast join and a
    groupBy(id, s) argmin shuffle around the same interpreted folds.
    One ``mapInArrow`` batch hands the whole block to numpy: measured
    5x faster than the join shape at sf0.1 (0.25 s vs 1.21 s for the
    encode pass) with ZERO exchanges — the corpus never shuffles.

    Bit-exactness contract (the oracle equality argument, preserved
    term by term):

    - subspace distance: ``acc += (sv_i - cw_i)^2`` accumulated in
      ``i`` order — elementwise float64, identical to the SQL
      ``aggregate`` left-to-right fold and the DuckDB ``list_reduce``;
    - argmin ties: ``np.argmin`` keeps the FIRST minimum = smallest
      code, the ``min_by(code, struct(dist, code))`` /
      ``row_number() ORDER BY dist, code`` contract;
    - cell cosine: dot and row-norm accumulated in coordinate order
      (the ``_sql_dot`` fold), centroid norms from the same Python
      floats that ``ivf.assign_cells`` embeds as literals, ``argmax``
      first-max ties = ``array_position(sims, array_max(sims))``;
    - residual: elementwise ``v - centroid[cell]`` = ``zip_with``.

    Only (id, vector) cross the Python boundary (column-pruned select —
    guide §4.1); numpy state is built once per task before the batch
    loop (§4.5).  Callers must pre-filter zero-norm rows when ``cents``
    is given (the serving-index population), as the JVM path always did.

    Input contract (ADVICE r12): non-NULL, fixed-dimension vectors —
    ``flatten().reshape(n, d)`` raises on NULL/ragged rows; all callers
    feed dense fixture embeddings.  Zero-norm CENTROIDS are rejected at
    setup below.
    """
    import math

    from pyspark.sql import types as T

    m = len(books)
    sub = len(books[0][0])
    d = m * sub
    books_py = [[[float(x) for x in cw] for cw in sb] for sb in books]
    cents_py = (
        [[float(x) for x in c] for c in cents] if cents is not None else None
    )
    # centroid norms as the SAME Python floats assign_cells bakes into
    # its SQL literals (math.sqrt over the Python left-to-right sum)
    cnorms_py = (
        [math.sqrt(sum(x * x for x in c)) for c in cents_py]
        if cents_py is not None
        else None
    )
    if cnorms_py is not None and not all(x > 0 for x in cnorms_py):
        # fail fast (ADVICE r12): a zero-norm centroid would make the
        # kernel's sims NaN and argmax could pick the NaN lane, silently
        # diverging from the JVM nullif path that ignores that centroid.
        # choose_centroids never emits one; only caller-supplied cents
        # (ivf_pq_residual_topk) could.
        raise ValueError(
            "_pq_assign_arrow: zero-norm centroid in cents — the cosine "
            "cell assignment is undefined for it; filter it out (the "
            "JVM nullif path ignores such centroids)"
        )

    def assign(batches):
        import numpy as np
        import pyarrow as pa

        B = np.asarray(books_py, dtype=np.float64)
        C = (
            np.asarray(cents_py, dtype=np.float64)
            if cents_py is not None
            else None
        )
        cn = (
            np.asarray(cnorms_py, dtype=np.float64)
            if cnorms_py is not None
            else None
        )
        for batch in batches:
            ids = batch.column(0)
            va = batch.column(1)
            n = len(va)
            V = va.flatten().to_numpy(zero_copy_only=False).reshape(n, d)
            cols, names = [ids], [id_col]
            X = V
            if C is not None:
                nc = C.shape[0]
                accd = np.zeros((n, nc), dtype=np.float64)
                accn = np.zeros(n, dtype=np.float64)
                for i in range(d):  # coordinate order == the SQL fold
                    accd += V[:, i : i + 1] * C[:, i][None, :]
                    accn += V[:, i] * V[:, i]
                sims = accd / (np.sqrt(accn)[:, None] * cn[None, :])
                cell = sims.argmax(axis=1)  # first max == smallest cell
                if residual:
                    X = V - C[cell]
                cols.append(pa.array(cell.astype(np.int32)))
                names.append("cell")
            codes = np.empty((n, m), dtype=np.int32)
            dists = np.empty((n, m), dtype=np.float64)
            for s in range(m):
                SV = X[:, s * sub : (s + 1) * sub]
                acc = np.zeros((n, B.shape[1]), dtype=np.float64)
                for i in range(sub):  # i order == the SQL fold
                    diff = SV[:, i : i + 1] - B[s, :, i][None, :]
                    acc += diff * diff
                cs = acc.argmin(axis=1)  # first min == smallest code
                codes[:, s] = cs
                dists[:, s] = acc[np.arange(n), cs]
            off = pa.array(np.arange(0, (n + 1) * m, m, dtype=np.int32))
            cols.append(
                pa.ListArray.from_arrays(
                    off, pa.array(codes.reshape(-1), type=pa.int32())
                )
            )
            cols.append(
                pa.ListArray.from_arrays(
                    off, pa.array(dists.reshape(-1), type=pa.float64())
                )
            )
            yield pa.RecordBatch.from_arrays(cols, names + ["_codes", "_dists"])

    fields = [T.StructField(id_col, df.schema[id_col].dataType)]
    if cents is not None:
        fields.append(T.StructField("cell", T.IntegerType()))
    fields += [
        T.StructField("_codes", T.ArrayType(T.IntegerType())),
        T.StructField("_dists", T.ArrayType(T.DoubleType())),
    ]
    src = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    return src.mapInArrow(assign, T.StructType(fields))


def pq_code_rows(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 8,
    k: int = 16,
    books: "list[list[list[float]]] | None" = None,
) -> DataFrame:
    """Per-subspace PQ assignment as ``(id_col, s, code, dist)`` ROWS —
    the encode dataflow of :func:`pq_encode` stopped before its final
    per-id array aggregation.  Since r12 the assignment is the
    :func:`_pq_assign_arrow` vectorized pass; the only Generate in the
    plan posexplodes m ALREADY-DECIDED rows per vector — no codebook
    join, no (id, s) shuffle.  ``dist`` is the winning codeword's
    squared L2 distance (feeds recon_err)."""
    if books is None:
        books = pq_codebooks(df, id_col, vec_col, m, k)
    kern = _pq_assign_arrow(df, id_col, vec_col, books)
    return kern.select(
        F.col(id_col),
        F.posexplode(F.arrays_zip("_codes", "_dists")).alias("s", "b"),
    ).select(
        id_col,
        F.col("s").cast("int").alias("s"),
        F.col("b._codes").alias("code"),
        F.col("b._dists").alias("dist"),
    )


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
    distance — unrounded; callers round for oracle output).  Map-only
    since r12: codes and recon_err project straight off
    :func:`_pq_assign_arrow`, deleting the explode + groupBy(id, s) +
    groupBy(id) collect_list round-trip (2 exchanges) from the encode.
    The cross-subspace sum folds in subspace order — one of the orders
    the previous nondeterministic ``SUM`` could produce; callers round
    to 6dp (the registry contract), which absorbs order noise.
    ``books`` lets a caller that already collected the codebooks skip
    the duplicate sample job."""
    if books is None:
        books = pq_codebooks(df, id_col, vec_col, m, k)
    kern = _pq_assign_arrow(df, id_col, vec_col, books)
    return kern.select(
        id_col,
        F.col("_codes").alias("codes"),
        F.expr(
            "aggregate(_dists, cast(0.0 as double), (acc, x) -> acc + x)"
        ).alias("recon_err"),
    )


def _ranked_topk(scored, query_id: str, corpus_id: str, k: int,
                 dist_col: str, out_col: str):
    """The shared engine-stability ranking tail: 6dp-rounded distance
    then id ties, row_number window, top-k — ONE implementation of the
    rounding/tie contract (pq_adc_topk's docstring) so a change to it
    cannot diverge across the four search paths."""
    from pyspark.sql import Window

    rounded = (
        F.floor(F.abs(F.col(dist_col)) * 1e6 + F.lit(0.5)) / 1e6
    )  # dist >= 0: cround without the sign branch
    w = Window.partitionBy(query_id).orderBy(rounded.asc(), F.col(corpus_id))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            query_id,
            corpus_id,
            rounded.alias(out_col),
            F.col("rnk").cast("int").alias("rnk"),
        )
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
    books: "list[list[list[float]]] | None" = None,
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

    Scale shape (r12): the corpus encodes in one vectorized map-only
    pass (:func:`_pq_assign_arrow`); the nq query ADC tables
    (:func:`_pq_dist_tables`, bounded) broadcast into a nested-loop
    join and the distance is m array lookups per (query, corpus) row —
    the corpus never shuffles before the per-query top-k window.  The
    pre-r12 shape paid two exchanges here (codes groupBy(id, s) + the
    (query, corpus) SUM)."""
    if books is None:  # quality path: train_codebooks(...)
        books = pq_codebooks(corpus, corpus_id, vec, m, n_codes)
    coded = _pq_assign_arrow(corpus, corpus_id, vec, books).select(
        F.col(corpus_id), F.col("_codes")
    )
    qt = queries.select(
        F.col(query_id), F.col(vec).cast("array<double>").alias("_qv")
    ).select(
        F.col(query_id), _pq_dist_tables(F.col("_qv"), books).alias("_qt")
    )
    scored = (
        coded.crossJoin(F.broadcast(qt))
        .filter(F.col(query_id) != F.col(corpus_id))
        .withColumn("adist", _adc_sum(len(books)))
    )
    return _ranked_topk(scored, query_id, corpus_id, k, "adist",
                        "approx_dist")


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    books: "list[list[list[float]]] | None" = None,
) -> DataFrame:
    """IVF-PQ top-k — the standard billion-scale ANN composition (the
    faiss ``IVFx,PQy`` index; Jégou 2011 §V): the IVF coarse quantizer
    prunes the search to ``nprobe`` of ``n_cells`` cells, and within the
    probed cells distances are ADC table lookups over the m-byte PQ
    codes — the corpus embeddings are touched only at INDEX time, never
    at query time, so the serving working set is codes + cell ids
    (9 bytes/vector here vs 256 for raw float64x8... per subspace).

    Non-residual variant: codes quantize the raw vectors (one global
    codebook set), not the cell residuals — the dataflow is identical
    and the residual refinement is a codebook-source swap, the same
    caveat as :func:`pq_codebooks` vs trained k-means.

    Ranking key is (6dp-rounded ADC distance, corpus_id) — the
    :func:`pq_adc_topk` engine-stability contract.  Scale shape (r12):
    the n_cells centroids and the m*k codebook are bounded driver
    artifacts; ONE vectorized pass over the corpus computes both the
    cell assignment and the PQ codes (:func:`_pq_assign_arrow` — no
    idx/codes branch to persist); the nq*nprobe probed (query, cell)
    rows carry their ADC tables and broadcast into a cell-keyed join,
    so the corpus never shuffles — the pre-r12 shape's codes groupBy,
    corpus_id-keyed candidate join, and (query, corpus) SUM exchanges
    are all gone.  At rest the corpus is written partitioned by cell so
    a probe prunes at the file level (the ext_sim_topk_ivf layout
    note)."""
    from arrow_ballista_spark.operators import ivf
    from arrow_ballista_spark.operators.similarity import norm

    cents = ivf.choose_centroids(corpus, corpus_id, vec, n_cells)
    if books is None:  # quality path: train_codebooks(...)
        books = pq_codebooks(corpus, corpus_id, vec, m, n_codes)
    nz = corpus.select(
        F.col(corpus_id), F.col(vec).cast("array<double>").alias("_v")
    ).filter(norm(F.col("_v")) > 0)
    coded = _pq_assign_arrow(nz, corpus_id, "_v", books, cents=cents)
    qt = ivf.probe_cells(
        queries.select(
            F.col(query_id), F.col(vec).cast("array<double>").alias("_qv")
        ),
        "_qv",
        cents,
        nprobe,
    ).select(
        F.col(query_id),
        F.col("cell"),
        _pq_dist_tables(F.col("_qv"), books).alias("_qt"),
    )
    scored = (
        coded.join(F.broadcast(qt), "cell")
        .filter(F.col(query_id) != F.col(corpus_id))
        .withColumn("adist", _adc_sum(len(books)))
    )
    return _ranked_topk(scored, query_id, corpus_id, k, "adist",
                        "approx_dist")


def train_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec: str,
    m: int = 8,
    k: int = 16,
    sample: int = 4096,
    iters: int = 10,
) -> list[list[list[float]]]:
    """QUALITY codebooks: per-subspace Lloyd's k-means trained driver-side
    on the ``sample`` smallest-id vectors (numpy, deterministic smallest-id
    init, first-min ties) — the production PQ training step, bounded like
    :func:`whitening_literals <arrow_ballista_spark.operators.pca.whitening_literals>`.

    The md5-sample codebooks of :func:`pq_codebooks` keep the ENCODE
    dataflow value-exact against plain SQL but quantize with near-random
    distortion; trained codebooks are what makes ADC distances rank
    meaningfully (measured: recall@10 vs exact-L2 on the clustered
    fixture jumps from ~0.3 to >0.9 — SCALING.md r6 ANN table).  Returns
    the same ``books[s][c]`` shape; feed to :func:`pq_encode` /
    :func:`pq_adc_topk` / :func:`ivf_pq_topk` via ``books=``."""
    X = _sample_matrix(corpus, id_col, vec, sample, nonzero=False)
    return _lloyd_books(X, m, k, iters)


def _lloyd_books(X, m: int, k: int, iters: int) -> list[list[list[float]]]:
    """Per-subspace Lloyd's on a fixed float64 sample matrix — the shared
    numpy kernel behind :func:`train_codebooks` (Spark sample) and
    :func:`train_codebooks_literals` (pyarrow sample): deterministic
    smallest-id init, argmin first-min ties, fixed iteration order, so
    identical inputs produce bit-identical codebooks from either path."""
    import numpy as np

    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books = []
    for s in range(m):
        S = X[:, s * sub : (s + 1) * sub]
        C = S[:k].copy()  # smallest-id init
        for _ in range(iters):
            dist = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = dist.argmin(axis=1)
            for c in range(k):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append([[float(x) for x in row] for row in C])
    return books


def train_codebooks_literals(
    sf_dir: str,
    m: int = 16,
    k: int = 32,
    sample: int = 4096,
    iters: int = 10,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> list[list[list[float]]]:
    """:func:`train_codebooks` without a SparkSession — the literal-oracle
    twin (the ``whitening_literals`` precedent, ``operators/pca.py``):
    stream the parquet row groups with pyarrow keeping only the ``sample``
    smallest-id vectors (driver memory O(sample + batch), not O(corpus)),
    then the SAME numpy Lloyd kernel.  Because both paths sort the same
    ids and feed the same float64 matrix to :func:`_lloyd_books`, the
    codebooks are bit-identical — so the SAME literals can drive the
    Spark plan and a generated DuckDB oracle."""
    import os

    import numpy as np

    from arrow_ballista_spark.operators.pca import smallest_id_sample

    path = os.path.join(sf_dir, f"{table}.parquet")
    smallest = smallest_id_sample(path, id_col, [vec], sample)
    X = np.array(smallest[vec].tolist(), dtype=np.float64)
    return _lloyd_books(X, m, k, iters)


def adaptive_shortlist_size(n: int, k: int = 10) -> int:
    """Scale-adaptive ADC shortlist R (VERDICT r7 item 3): with R fixed
    at 100, rerank recall@10 is 0.984 at 500 vectors but 0.768 at 20k
    (SCALING.md r7) — PQ quantization noise makes the true neighbors'
    ADC rank drift outward roughly with corpus size, so the exact-rerank
    window must track it.  ``max(100, 10k, ceil(0.02 n))`` restores
    ≥0.95 at every measured scale while the rerank stays a vanishing
    fraction of the corpus (2% of n, and the compressed index still
    prunes the other 98%)."""
    import math

    return max(100, 10 * k, math.ceil(0.02 * n))


def pq_rerank_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec: str = "embedding",
    k: int = 10,
    m: int = 16,
    n_codes: int = 32,
    books: "list[list[list[float]]] | None" = None,
    R: int = None,
) -> DataFrame:
    """The DEFAULT compressed-ANN quality composition — trained-codebook
    ADC shortlist → exact squared-L2 rerank — with the shortlist size
    derived from the corpus (one bounded ``count()`` job) via
    :func:`adaptive_shortlist_size` unless ``R`` is pinned.  This is the
    library entry point callers should reach for: the fixed-R recall
    cliff (0.768@20k with R=100, SCALING.md r7) cannot ship by default.
    ``ext_sim_topk_pq_trained`` pins R=100 at its registry SF (500
    vectors, where adaptive R resolves to the same 100) for oracle
    stability."""
    if books is None:
        books = train_codebooks(corpus, corpus_id, vec, m=m, k=n_codes)
    if R is None:
        R = adaptive_shortlist_size(corpus.count(), k)
    shortlist = pq_adc_topk(
        queries, corpus, query_id, corpus_id, vec,
        k=R, m=m, n_codes=n_codes, books=books,
    )
    return adc_rerank_exact(
        shortlist, queries, corpus, query_id, corpus_id, vec, k=k
    )


def adc_rerank_exact(
    shortlist: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Two-stage retrieval refine (the faiss ``IVFPQR`` / re-ranking
    step): exact squared-L2 on the ADC SHORTLIST only, then top-k.

    Why it exists (measured, SCALING.md r6): PQ distances resolve
    BETWEEN clusters but not within them — on the clustered fixture the
    quantization error dwarfs intra-cluster distance differences, so
    ADC recall@10 vs exact-L2 is ~0.07 while the CLUSTER is almost
    always right.  Reranking the ADC top-R with exact distances
    restores recall at R << corpus (0.95+ at R=400 on 20k vectors)
    while the compressed index still prunes the other ~98%.

    Scale shape: the shortlist is nq*R rows — the raw-vector join
    touches only those corpus rows (keyed equi-join; the scan is
    column-pruned to (id, vec)); ranking key (6dp-rounded dist, id) as
    everywhere."""
    q = queries.select(
        F.col(query_id), F.col(vec).cast("array<double>").alias("qv")
    )
    c = corpus.select(
        F.col(corpus_id), F.col(vec).cast("array<double>").alias("cv")
    )
    j = (
        shortlist.select(query_id, corpus_id)
        .join(F.broadcast(q), query_id)
        .join(c, corpus_id)
        .withColumn(
            "dist",
            F.expr(
                "aggregate(sequence(1, size(qv)), cast(0.0 as double),"
                " (acc, i) -> acc + (qv[i-1] - cv[i-1]) * (qv[i-1] - cv[i-1]))"
            ),
        )
    )
    return _ranked_topk(j, query_id, corpus_id, k, "dist", "dist")


def _sample_matrix(
    corpus: DataFrame,
    id_col: str,
    vec: str,
    sample: int,
    nonzero: bool = False,
):
    """The shared smallest-id training sample as a float64 matrix — one
    implementation for every Spark-side trainer (train_codebooks /
    train_residual_codebooks / train_coarse_centroids), so the sampling
    contract can never drift between them.  ``nonzero=True`` excludes
    zero-norm vectors, matching what the SERVING index does
    (``ivf.choose_centroids`` / ``assign_cells`` filter norm > 0) — the
    residual/coarse trainers must train on the population they serve.
    (:func:`train_codebooks` keeps nonzero=False: its literal twin
    :func:`train_codebooks_literals` pins that exact sample.)"""
    import numpy as np

    from arrow_ballista_spark.operators.similarity import norm

    df = corpus.select(F.col(id_col).alias("_id"), F.col(vec).alias("_v"))
    if nonzero:
        df = df.filter(norm(F.col("_v")) > 0)
    rows = df.orderBy("_id").limit(sample).collect()
    if not rows:
        raise ValueError("_sample_matrix: empty corpus")
    return np.array([list(r["_v"]) for r in rows], dtype=np.float64)


def _cosine_cells(X, C):
    """Driver-side nearest-cosine-centroid assignment (first-max ties —
    the :func:`ivf.assign_cells` contract)."""
    import numpy as np

    xn = np.linalg.norm(X, axis=1, keepdims=True)
    cn = np.linalg.norm(C, axis=1, keepdims=True)
    den = xn * cn.T
    sims = (X @ C.T) / np.where(den == 0, np.inf, den)
    return sims.argmax(axis=1)


def train_residual_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec: str,
    centroids: list[list[float]],
    m: int = 16,
    k: int = 32,
    sample: int = 4096,
    iters: int = 10,
    X=None,
) -> list[list[list[float]]]:
    """RESIDUAL codebooks — the true faiss ``IVFx,PQy`` training step
    (Jegou 2011 §V.A): quantize ``v - centroid(cell(v))`` instead of the
    raw vectors, so the PQ codebooks only have to cover the within-cell
    residual distribution (much tighter than the global one).  Bounded
    like :func:`train_codebooks`: the ``sample`` smallest-id NONZERO
    vectors (the serving-index population) collect, assign to their
    nearest cosine centroid driver-side, and the SAME Lloyd kernel
    trains on the residual matrix.  ``X`` lets a caller that already
    collected the sample (:func:`ivf_pq_residual_topk`'s default path)
    skip the duplicate job."""
    import numpy as np

    if X is None:
        X = _sample_matrix(corpus, id_col, vec, sample, nonzero=True)
    C = np.array(centroids, dtype=np.float64)
    cells = _cosine_cells(X, C)
    return _lloyd_books(X - C[cells], m, k, iters)

def ivf_pq_residual_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    m: int = 16,
    n_codes: int = 32,
    books: "list[list[list[float]]] | None" = None,
    cents: "list[list[float]] | None" = None,
) -> DataFrame:
    """RESIDUAL IVF-PQ top-k — completes :func:`ivf_pq_topk`'s
    "residual refinement is a codebook-source swap" caveat with the
    actual dataflow: corpus vectors encode their residual against their
    cell centroid, and each query builds a PER-PROBED-CELL distance
    table over its own residual ``q - centroid(cell)`` (the asymmetric
    distance then approximates the exact ``||q - x||^2`` with the
    coarse term absorbed).  Ranking contract as everywhere: 6dp-rounded
    distance, id ties.

    Scale shape (r12): centroids and codebooks stay bounded driver
    artifacts; ONE vectorized pass over the corpus computes cell,
    residual and PQ codes (:func:`_pq_assign_arrow` with
    ``residual=True`` — the pre-r12 idx persist + two centroid joins +
    codes groupBy are gone), and the per-(query, probed cell) residual
    tables broadcast into a single cell-keyed join, so the corpus never
    shuffles before the per-query top-k window.

    The ``nprobe=4`` default targets CLUSTERED corpora — the regime
    real embedding spaces produce, where it measures 1.000 recall@10
    at library defaults (SCALING.md r9).  On weakly-clustered or
    isotropic data cell pruning itself costs recall (measured ladder:
    0.686/0.860/0.930/0.954 at nprobe 4/8/12/16 on the adversarial
    isotropic 10x fixture, where nprobe=16 exactly meets the no-IVF
    PQ+rerank ceiling): raise nprobe toward ``n_cells``, or drop IVF
    and use :func:`pq_rerank_topk` whose adaptive-R default already
    meets 0.95 there."""
    from arrow_ballista_spark.operators import ivf
    from arrow_ballista_spark.operators.similarity import norm

    if books is not None and cents is None:
        # residual codebooks are only meaningful in the basis of the
        # centroids they were trained against — silently training fresh
        # centroids here would compute ADC distances in a mismatched
        # basis with no error signal
        raise ValueError(
            "ivf_pq_residual_topk: books= requires the cents= they "
            "were trained against (train_residual_codebooks centroids)"
        )
    if cents is None or books is None:
        # collect the training sample ONCE for both trainers
        X = _sample_matrix(corpus, corpus_id, vec, 4096, nonzero=True)
        if cents is None:
            # residuals only shrink against cell MEANS — default to the
            # Lloyd-trained coarse quantizer, not the md5 point sample
            cents = train_coarse_centroids(
                corpus, corpus_id, vec, n_cells, X=X
            )
        if books is None:
            books = train_residual_codebooks(
                corpus, corpus_id, vec, cents, m=m, k=n_codes, X=X
            )
    nz = corpus.select(
        F.col(corpus_id), F.col(vec).cast("array<double>").alias("_v")
    ).filter(norm(F.col("_v")) > 0)
    coded = _pq_assign_arrow(
        nz, corpus_id, "_v", books, cents=cents, residual=True
    )
    # r13: one parsed SQL literal instead of F.lit(nested list) — the
    # latter crosses py4j once per element (~1 s of plan build for
    # 16x64 doubles; the _books_literal finding)
    from arrow_ballista_spark.operators.similarity import _sql_array

    centlit = F.expr(
        "array(" + ", ".join(_sql_array(c) for c in cents) + ")"
    )
    qt = (
        ivf.probe_cells(
            queries.select(
                F.col(query_id), F.col(vec).cast("array<double>").alias("_qv")
            ),
            "_qv",
            cents,
            nprobe,
        )
        .withColumn(
            "_qrv",
            F.zip_with(
                F.col("_qv"), centlit[F.col("cell")], lambda a, b: a - b
            ),
        )
        .select(
            F.col(query_id),
            F.col("cell"),
            _pq_dist_tables(F.col("_qrv"), books).alias("_qt"),
        )
    )
    scored = (
        coded.join(F.broadcast(qt), "cell")
        .filter(F.col(query_id) != F.col(corpus_id))
        .withColumn("adist", _adc_sum(len(books)))
    )
    return _ranked_topk(scored, query_id, corpus_id, k, "adist",
                        "approx_dist")


def train_coarse_centroids(
    corpus: DataFrame,
    id_col: str,
    vec: str,
    n_cells: int = 16,
    sample: int = 4096,
    iters: int = 10,
    X=None,
) -> list[list[float]]:
    """Lloyd-TRAINED coarse centroids for residual IVF-PQ — the faiss
    coarse quantizer is k-means, not a random sample, and this matters
    specifically for RESIDUAL encoding: subtracting a random corpus
    point (``ivf.choose_centroids``) does not shrink the residual
    distribution (measured: residual recon error 1.3x WORSE than global
    books under md5 centroids), while subtracting trained cell MEANS
    does.  Cosine assignment (the :func:`ivf.assign_cells` metric,
    first-max ties) + mean update — spherical k-means on the bounded
    smallest-id sample; same deterministic-driver contract as
    :func:`train_codebooks`."""
    if X is None:
        X = _sample_matrix(corpus, id_col, vec, sample, nonzero=True)
    return _spherical_kmeans(X, n_cells, iters)


def _spherical_kmeans(X, n_cells: int, iters: int) -> list[list[float]]:
    """Spherical-k-means numpy kernel on a fixed float64 sample matrix —
    shared by :func:`train_coarse_centroids` (Spark sample) and
    :func:`train_residual_literals` (pyarrow sample) so the two paths
    produce bit-identical centroids from identical inputs (the
    :func:`_lloyd_books` precedent)."""
    import numpy as np

    if len(X) < n_cells:
        # silently truncating to len(X) centroids would hand callers a
        # smaller index space than configured (mirrors the `dim not
        # divisible by m` guard in _lloyd_books)
        raise ValueError(
            f"coarse-quantizer training sample has {len(X)} nonzero "
            f"vectors < n_cells={n_cells}; lower n_cells or raise sample"
        )
    C = X[:n_cells].copy()  # smallest-id init (nonzero by construction)
    xn = np.linalg.norm(X, axis=1, keepdims=True)  # invariant across iters
    for _ in range(iters):
        cn = np.linalg.norm(C, axis=1, keepdims=True)
        den = xn * cn.T
        sims = (X @ C.T) / np.where(den == 0, np.inf, den)
        assign = sims.argmax(axis=1)
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return [[float(x) for x in row] for row in C]


def train_residual_literals(
    sf_dir: str,
    n_cells: int = 16,
    m: int = 16,
    k: int = 32,
    sample: int = 4096,
    iters: int = 10,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec: str = "embedding",
):
    """:func:`train_coarse_centroids` + :func:`train_residual_codebooks`
    without a SparkSession — the literal-oracle twin for the residual
    IVF-PQ registry entry (the :func:`train_codebooks_literals`
    precedent): stream the parquet row groups keeping the ``sample``
    smallest-id NONZERO vectors (the serving-index population —
    ``_sample_matrix(nonzero=True)``'s exact contract), then the SAME
    numpy kernels.  Returns ``(cents, books)`` bit-identical to the
    Spark-side trainers on the same file, so the same literals can
    drive the Spark plan and a generated DuckDB oracle."""
    import os

    import numpy as np

    from arrow_ballista_spark.operators.pca import smallest_id_sample

    path = os.path.join(sf_dir, f"{table}.parquet")
    smallest = smallest_id_sample(path, id_col, [vec], sample,
                                  nonzero_vec=vec)
    X = np.array(smallest[vec].tolist(), dtype=np.float64)
    cents = _spherical_kmeans(X, n_cells, iters)
    C = np.array(cents, dtype=np.float64)
    books = _lloyd_books(X - C[_cosine_cells(X, C)], m, k, iters)
    return cents, books
