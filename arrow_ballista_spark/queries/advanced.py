"""Second extension bank: advanced SQL surface (recursive CTE, UNPIVOT),
per-source quality caps, IR/text statistics (inverted index, TF-IDF),
distinct sketches (register-based HLL), exact set-similarity joins
(prefix-filtered PPJoin), graph analytics (triangle counting), and
product quantization.

Same contract as queries/extensions.py: every entry is implemented twice
— idiomatic PySpark (Catalyst plans the physical strategy) and a DuckDB
oracle SQL string computing the identical values.  Hashes are the
md5-derived 60-bit portable family; float aggregates are rounded with the
portable floor macro (queries.R) so the driver's value hash cannot be
flipped by summation order.

Reference parity anchors: the reference's SQL surface is DataFusion's
(recursive CTEs: datafusion/sqllogictest cte.slt; UNPIVOT is absent there
— this engine exceeds it via Spark's native UNPIVOT); the IR/sketch/graph
entries extend the LLM-corpus toolkit of SURVEY.md §2 extensions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_ballista_spark.catalog import load_table
from arrow_ballista_spark.queries import R, cround, query
from arrow_ballista_spark.queries.extensions import _sql_dot, _sql_hex15

_SOURCE_CAP = 15


@query(
    "ext_quality_source_cap",
    f"""
SELECT doc_id, source, rk FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id
         ) AS rk
  FROM documents
) WHERE rk <= {_SOURCE_CAP}
""",
    doc=(
        "Per-source document cap (RefinedWeb/Dolma-style domain "
        "rebalancing): keep at most N documents per source, preferring "
        "the longest — prevents one crawl domain from dominating the "
        "training mixture.  One shuffle on the source key + a "
        "row_number window with a total order (n_chars DESC, doc_id) so "
        "the kept set is deterministic.  At 100 TB a single hot domain "
        "can skew the window partition; the cap itself bounds the "
        "retained rows, and AQE skew-split handles the sort — no "
        "driver-side state."
    ),
)
def ext_quality_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    )
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= _SOURCE_CAP)
    )


@query(
    "sql_unpivot",
    f"""
WITH agg AS (
  SELECT l_returnflag,
         CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
         CAST(SUM(l_extendedprice) AS DOUBLE) AS sum_price,
         CAST(SUM(l_discount) AS DOUBLE) AS sum_disc
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, metric, {R('val', 2)} AS val FROM (
  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS val FROM agg
  UNION ALL
  SELECT l_returnflag, 'sum_price', sum_price FROM agg
  UNION ALL
  SELECT l_returnflag, 'sum_disc', sum_disc FROM agg
) u
""",
    doc=(
        "SQL UNPIVOT surface (wide aggregate -> long (metric, value) "
        "rows) via Spark's native UNPIVOT clause — the inverse of the "
        "PIVOT path (pivot_conditional).  The oracle lowers UNPIVOT to "
        "the portable UNION ALL form, pinning the exact relational "
        "semantics Spark's clause implements (no nulls dropped here: "
        "all measures are non-null aggregates).  Map-only over the "
        "3-row aggregate; the heavy lifting is the upstream two-phase "
        "agg."
    ),
)
def sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "li_unpivot"
    )
    return spark.sql(
        f"""
WITH agg AS (
  SELECT l_returnflag,
         CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
         CAST(SUM(l_extendedprice) AS DOUBLE) AS sum_price,
         CAST(SUM(l_discount) AS DOUBLE) AS sum_disc
  FROM li_unpivot GROUP BY l_returnflag
)
SELECT l_returnflag, metric, {R('val', 2)} AS val
FROM agg UNPIVOT (val FOR metric IN (sum_qty, sum_price, sum_disc))
"""
    )


@query(
    "sql_recursive_cte",
    f"""
WITH RECURSIVE m(mo) AS (
  SELECT 1 UNION ALL SELECT mo + 1 FROM m WHERE mo < 12
), o AS (
  SELECT CAST(month(o_orderdate) AS INT) AS mo,
         COUNT(*) AS n_orders,
         CAST(SUM(o_totalprice) AS DOUBLE) AS tot
  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1
)
SELECT m.mo, CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
       {R('COALESCE(o.tot, 0.0)', 2)} AS total_price
FROM m LEFT JOIN o ON m.mo = o.mo
""",
    doc=(
        "Recursive CTE (SQL:1999 WITH RECURSIVE, Spark 4.x native): a "
        "12-row calendar spine generated recursively, left-joined onto "
        "monthly 1995 order totals — the standard gap-filling pattern "
        "(months with zero orders still appear).  DataFusion parity: "
        "the reference engine supports recursive CTEs "
        "(datafusion sqllogictest cte.slt); this pins Spark's "
        "UnionLoop execution against DuckDB's recursive evaluation.  "
        "The recursion is driver-bounded (12 iterations over 1-row "
        "frames); the scan side stays a pushed-down year filter + "
        "two-phase agg."
    ),
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_rcte"
    )
    return spark.sql(
        f"""
WITH RECURSIVE m(mo) AS (
  SELECT 1 UNION ALL SELECT mo + 1 FROM m WHERE mo < 12
), o AS (
  SELECT CAST(month(o_orderdate) AS INT) AS mo,
         COUNT(*) AS n_orders,
         CAST(SUM(o_totalprice) AS DOUBLE) AS tot
  FROM orders_rcte WHERE year(o_orderdate) = 1995 GROUP BY 1
)
SELECT m.mo, CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
       {R('COALESCE(o.tot, 0.0)', 2)} AS total_price
FROM m LEFT JOIN o ON m.mo = o.mo
"""
    )


# --- HyperLogLog distinct sketch -------------------------------------------

_HLL_P = 8
_HLL_M = 1 << _HLL_P
# identical literal on both sides: alpha_256 * m^2 * 2^50 (the scaled
# numerator; operators/sketch.py:hll_estimate computes the same float)
from arrow_ballista_spark.operators.sketch import (  # noqa: E402
    _HLL_RHO_CAP,
    _HLL_SCALE,
    hll_alpha,
)

_HLL_NUM = repr(hll_alpha(_HLL_M) * _HLL_M * _HLL_M * float(1 << _HLL_SCALE))


@query(
    "ext_sketch_hll",
    f"""
WITH tok AS (
  SELECT doc_id || ':' || unnest(string_split_regex(text, ' +')) AS w
  FROM documents
), hv AS (
  SELECT {_sql_hex15("'hll:' || w")} AS h FROM tok
), rr AS (
  SELECT h % {_HLL_M} AS bucket, h >> {_HLL_P} AS wv FROM hv
), rho AS (
  SELECT bucket,
         CASE WHEN wv = 0 THEN {_HLL_RHO_CAP}
              ELSE least(length(bin(wv & -wv)), {_HLL_RHO_CAP}) END AS rho
  FROM rr
), regs AS (
  SELECT bucket, MAX(rho) AS m_j FROM rho GROUP BY bucket
), spine AS (
  SELECT r AS bucket FROM range(0, {_HLL_M}) t(r)
), mm AS (
  SELECT COALESCE(regs.m_j, 0) AS m_j
  FROM spine LEFT JOIN regs USING (bucket)
), agg AS (
  SELECT CAST(SUM(1::BIGINT << ({_HLL_SCALE} - m_j)) AS BIGINT) AS s_scaled,
         CAST(SUM(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zeros
  FROM mm
), ex AS (
  SELECT COUNT(DISTINCT w) AS exact_distinct FROM tok
)
, fin AS (
  SELECT CASE WHEN {_HLL_NUM} / s_scaled <= 2.5 * {_HLL_M} AND zeros > 0
              THEN {_HLL_M} * ln({_HLL_M} / CAST(zeros AS DOUBLE))
              ELSE {_HLL_NUM} / s_scaled END AS est_c,
         s_scaled, zeros
  FROM agg
)
SELECT {_HLL_M} AS m,
       CAST({_HLL_M} - zeros AS BIGINT) AS nonzero_regs,
       s_scaled,
       {R('est_c', 2)} AS est,
       CAST(exact_distinct AS BIGINT) AS exact_distinct,
       {R('(est_c - exact_distinct) / exact_distinct', 4)} AS rel_err
FROM fin, ex
""",
    doc=(
        "HyperLogLog distinct-count sketch (Flajolet et al., AofA 2007) "
        "over the corpus posting universe (distinct (doc, term) pairs — "
        "~12k at test SF, squarely in the raw-estimator regime): 256 "
        "registers, each the bucket-max of the lowest-set-bit position "
        "of the md5-derived hash — the bounded-memory complement to "
        "COUNT(DISTINCT), whose exact state at 100 TB is the value "
        "universe itself.  Registers merge by MAX (shard/stream "
        "citizen, like the count-min cells); the build is ONE map-side-"
        "combined groupBy onto <= 256 rows, the estimate a broadcast-"
        "spine join.  Value-exact across engines: rho is pure integer "
        "bit arithmetic (length(bin(w & -w)), capped at 40), the "
        "harmonic sum is the exact BIGINT sum of 2^(50-M_j), the one "
        "double division uses an identical numerator literal, and the "
        "small-range linear-counting branch (m*ln(m/V) when raw <= "
        "2.5m) rounds at 1e-2, absorbing any libm last-ulp skew — the "
        "entry emits est vs COUNT(DISTINCT) so the ~1.04/sqrt(256) = "
        "6.5% error envelope is itself oracled "
        "(operators/sketch.py:hll_build/hll_estimate)."
    ),
)
def ext_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_ballista_spark.operators import sketch as sk

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.expr("split(text, ' +')")).alias("t"), "doc_id"
    ).select(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("t"))
        .alias("w")
    )
    regs = sk.hll_build(tok, "w", p=_HLL_P)
    est = sk.hll_estimate(regs, p=_HLL_P)
    exact = tok.agg(F.count_distinct("w").alias("exact_distinct"))
    return est.crossJoin(F.broadcast(exact)).select(
        "m",
        "nonzero_regs",
        "s_scaled",
        cround(F.col("est"), 2).alias("est"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        cround(
            (F.col("est") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err"),
    )


# --- IR statistics: inverted index + TF-IDF ---------------------------------

_POSTINGS_CAP = 20


@query(
    "ext_text_inverted_index",
    f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(text, ' +')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       array_to_string((list_sort(list(doc_id)))[1:{_POSTINGS_CAP}], ',')
         AS postings_head
FROM tf GROUP BY term
""",
    doc=(
        "Inverted-index build (term -> document frequency, total term "
        "frequency, posting-list head): the search-engine-shaped "
        "complement to the BM25 scorer (ext_text_bm25) — BM25 *queries* "
        "need exactly this structure precomputed.  Two keyed "
        "aggregations, both map-side combined: (doc, term) -> tf, then "
        "term -> (df, sum tf, sorted postings head).  The posting list "
        "is capped at {cap} doc ids (full lists for a stopword at "
        "100 TB are the corpus itself; real systems shard postings — "
        "the cap keeps rows bounded and the head deterministic via "
        "sort).  Emitted as a comma-joined string so the value hash is "
        "representation-stable across engines.".format(cap=_POSTINGS_CAP)
    ),
)
def ext_text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.expr("split(text, ' +')")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("total_tf"),
        F.concat_ws(
            ",",
            F.expr(
                f"transform(slice(sort_array(collect_list(doc_id)), 1, "
                f"{_POSTINGS_CAP}), x -> cast(x as string))"
            ),
        ).alias("postings_head"),
    )


_TFIDF_TOPK = 3


@query(
    "ext_text_tfidf",
    f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(text, ' +')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT COUNT(*) AS n FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS score
  FROM tf JOIN df USING (term), n
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, {R('score', 4)} AS tfidf
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term
  ) AS rk FROM scored
) WHERE rk <= {_TFIDF_TOPK}
""",
    doc=(
        "Per-document top-{k} TF-IDF terms (tf * ln(N/df)) — keyword "
        "extraction / document signatures for retrieval-augmented "
        "training sets.  Scale shape: two map-side-combined aggs "
        "((doc,term)->tf, term->df), a keyed join of the gram stream "
        "onto the df table (vocabulary-sized, NOT broadcast — at crawl "
        "scale the vocabulary is GBs; Catalyst picks broadcast at test "
        "SF from stats, both are keyed equi-joins), a 1-row N "
        "broadcast, and a per-doc top-k window with a total order "
        "(score DESC, term).  Both engines rank by the UNROUNDED "
        "score (rounding at 1e-4 applies only to the emitted tfidf "
        "column), so kept-set stability rests on the cross-engine "
        "ln() bit-identity contract (tf, N, df are exact integers; "
        "IEEE-754 double ln agrees to the last bit between Spark's "
        "JVM StrictMath-backed log and DuckDB's libm on these "
        "inputs, verified by the hash match) plus the lexicographic "
        "term tie-break for equal scores.".format(k=_TFIDF_TOPK)
    ),
)
def ext_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.expr("split(text, ' +')")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            (
                F.col("tf")
                * F.log(F.col("n").cast("double") / F.col("df"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TFIDF_TOPK)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            cround(F.col("score"), 4).alias("tfidf"),
        )
    )


_PPJOIN_TAU = 0.9

_SQL_BIGRAM_SETS = """
SELECT doc_id,
       list_distinct(CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
           ELSE list_transform(generate_series(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i + 1]) END) AS toks
FROM (SELECT doc_id,
             list_filter(string_split_regex(text, ' +'), w -> w <> '') AS toks
      FROM documents)
"""


@query(
    "ext_dedup_ppjoin",
    f"""
WITH b AS ({_SQL_BIGRAM_SETS})
SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
       {R("len(list_intersect(a.toks, b2.toks))"
          " / CAST(len(list_distinct(list_concat(a.toks, b2.toks)))"
          " AS DOUBLE)", 6)} AS jaccard
FROM b a JOIN b b2 ON a.doc_id < b2.doc_id
WHERE len(a.toks) > 0 AND len(b2.toks) > 0
  AND len(list_intersect(a.toks, b2.toks))
        / CAST(len(list_distinct(list_concat(a.toks, b2.toks))) AS DOUBLE)
      >= {_PPJOIN_TAU}
""",
    doc=(
        "PPJoin-style EXACT set-similarity self-join (Xiao et al. 2008): "
        "all pairs with word-bigram-set Jaccard >= 0.9 (the near-dup "
        "operating point), via the lossless prefix + POSITIONAL filters "
        "— tokens sort by (document frequency ASC, token), a size-s set "
        "indexes only its first s - ceil(t*s) + 1 tokens, any pair at "
        "J >= t must share a prefix token (pigeonhole), and the shared "
        "token's remaining-suffix budget must still allow the required "
        "overlap, so the candidate join + length filter + exact verify "
        "EQUALS the all-pairs definition (recall exactly 1, unlike "
        "MinHash-LSH) — which is why the oracle is the plain brute-force "
        "SQL.  Scale shape: df agg + per-doc prefix window + one join "
        "keyed on rare tokens (operators/dedup.py:ppjoin_pairs); the "
        "bigram universe keeps prefixes selective on the narrow test "
        "vocabulary.  Measured at sf0.1: t=0.6 prefixes (40% of tokens) "
        "admit 4.1M candidates on this heavy-shared-bigram corpus; "
        "t=0.9 + the positional filter cut that to 180k for the same "
        "25-pair truth set — threshold IS the probe budget here.  Completes the dedup family's THIRD exact-blocking "
        "proof pattern (ED-Join rare-grams, winnowing fingerprints, "
        "PPJoin prefixes)."
    ),
)
def ext_dedup_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_ballista_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    out = dedup.ppjoin_pairs(
        docs, "text", "doc_id", threshold=_PPJOIN_TAU, token="bigram"
    )
    return out.select(
        "id_a", "id_b", cround(F.col("jaccard"), 6).alias("jaccard")
    )


@query(
    "ext_graph_triangles",
    """
WITH g AS (
SELECT doc_id,
       list_distinct(CASE WHEN len(toks) < 3 THEN toks
           ELSE list_transform(generate_series(1, len(toks) - 2),
                i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) END)
         AS grams
FROM (SELECT doc_id, string_split_regex(text, ' +') AS toks FROM documents)
),
p AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM g a JOIN g b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.grams, b.grams))
          / CAST(len(list_distinct(list_concat(a.grams, b.grams)))
                 AS DOUBLE) >= 0.5
),
tri AS (
  SELECT e1.ia AS a, e1.ib AS b, e2.ib AS c
  FROM p e1
  JOIN p e2 ON e1.ib = e2.ia
  JOIN p e3 ON e3.ia = e1.ia AND e3.ib = e2.ib
),
n AS (
  SELECT a AS doc_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM n GROUP BY doc_id
""",
    doc=(
        "Per-node triangle counts over the near-duplicate graph (word-"
        "3-gram Jaccard >= 0.5 edges — the ext_graph_pagerank graph): "
        "the clustering-coefficient primitive for community/cluster "
        "density analysis.  Algorithm: DEGREE-ordered orientation "
        "(operators/pagerank.py:triangle_counts, the Schank/Wagner "
        "node-iterator++ refinement): every edge points from its lower-"
        "(degree, id) endpoint, so each triangle's wedge pivot is its "
        "MINIMUM-degree vertex — a degree-D hub that would pivot O(D^2) "
        "wedges under id orientation generates near-linear wedge counts "
        "here (measured on a 5%-hub fixture: tools/measure_triangles.py, "
        "SCALING.md r7).  Orientation does not change the counts, so the "
        "exact all-pairs-Jaccard oracle is unchanged.  Same recall "
        "caveat as ext_graph_pagerank: Spark edges come from MinHash-LSH "
        "banding, the oracle from exact all-pairs Jaccard; fixture pairs "
        "sit far from the 0.5 threshold."
    ),
)
def ext_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_ballista_spark.operators import dedup
    from arrow_ballista_spark.operators.caching import tracked_persist
    from arrow_ballista_spark.operators.pagerank import triangle_counts

    docs = load_table(spark, sf_dir, "documents")
    p = tracked_persist(
        dedup.minhash_dedup_pairs(
            docs, "text", "doc_id", threshold=0.5, num_perm=128,
            rows_per_band=4,
        ).select("id_a", "id_b")
    )
    # materialize the edge set EAGERLY before the operator's multi-branch
    # wedge join (the r6 persist-race lesson); the operator persists its
    # oriented edges separately.
    p.count()
    return triangle_counts(p, "id_a", "id_b", orient="degree").select(
        F.col("node").alias("doc_id"), "n_triangles"
    )


_PQ_M, _PQ_K, _PQ_SUB = 8, 16, 8


@query(
    "ext_embed_pq",
    f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cbsrc AS (
  SELECT v, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                               vec_id) - 1 AS code
  FROM e
  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                             vec_id) <= {_PQ_K}
), cb AS (
  SELECT s, code, v[s * {_PQ_SUB} + 1 : s * {_PQ_SUB} + {_PQ_SUB}] AS cw
  FROM cbsrc, UNNEST(generate_series(0, {_PQ_M - 1})) AS t(s)
), sv AS (
  SELECT vec_id, s, v[s * {_PQ_SUB} + 1 : s * {_PQ_SUB} + {_PQ_SUB}] AS sv
  FROM e, UNNEST(generate_series(0, {_PQ_M - 1})) AS t(s)
), d AS (
  SELECT vec_id, s, code,
         list_reduce(list_transform(generate_series(1, {_PQ_SUB}),
                     i -> (sv[i] - cw[i]) * (sv[i] - cw[i])),
                     (acc, x) -> acc + x) AS dist
  FROM sv JOIN cb USING (s)
), best AS (
  SELECT vec_id, s, code, dist,
         row_number() OVER (PARTITION BY vec_id, s
                            ORDER BY dist, code) AS rn
  FROM d
)
SELECT vec_id,
       array_to_string(list(code ORDER BY s), '-') AS codes,
       {R("SUM(dist)", 6)} AS recon_err
FROM best WHERE rn = 1
GROUP BY vec_id
""",
    doc=(
        "Product quantization encode (Jegou et al. 2011): split each "
        "64-d vector into 8 subspaces of 8 dims, quantize each to one "
        "of 16 codewords, emit the 8-code string + total squared "
        "reconstruction error — the memory-compression step of a "
        "billion-scale ANN index (64 floats -> 8 codes).  Deterministic "
        "codebooks: per subspace, the subvectors of the 16 smallest-"
        "md5(id) corpus vectors (the IVF-centroid sample pattern), so "
        "the whole encode is value-exact in SQL: same left-to-right "
        "distance fold, argmin ties to the smallest code on both sides "
        "(min_by struct vs ORDER BY dist, code).  Scale shape: m*k "
        "codebook broadcasts, assignment is a keyed agg over (vector, "
        "subspace) rows, codes regroup with one vec_id-keyed agg "
        "(operators/pq.py); recon_err rounds — the cross-subspace sum "
        "is the one order-free reduce."
    ),
)
def ext_embed_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_ballista_spark.operators.pq import pq_encode

    emb = load_table(spark, sf_dir, "embeddings")
    out = pq_encode(emb, "embedding", "vec_id", m=_PQ_M, k=_PQ_K)
    return out.select(
        "vec_id",
        F.expr(
            "array_join(transform(codes, c -> cast(c as string)), '-')"
        ).alias("codes"),
        cround(F.col("recon_err"), 6).alias("recon_err"),
    )


@query(
    "ext_sim_topk_pq_adc",
    f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cbsrc AS (
  SELECT v, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                               vec_id) - 1 AS code
  FROM e
  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                             vec_id) <= {_PQ_K}
), cb AS (
  SELECT s, code, v[s * {_PQ_SUB} + 1 : s * {_PQ_SUB} + {_PQ_SUB}] AS cw
  FROM cbsrc, UNNEST(generate_series(0, {_PQ_M - 1})) AS t(s)
), sv AS (
  SELECT vec_id, s, v[s * {_PQ_SUB} + 1 : s * {_PQ_SUB} + {_PQ_SUB}] AS sv
  FROM e, UNNEST(generate_series(0, {_PQ_M - 1})) AS t(s)
), d AS (
  SELECT vec_id, s, code,
         list_reduce(list_transform(generate_series(1, {_PQ_SUB}),
                     i -> (sv[i] - cw[i]) * (sv[i] - cw[i])),
                     (acc, x) -> acc + x) AS dist
  FROM sv JOIN cb USING (s)
), best AS (
  SELECT vec_id, s, code,
         row_number() OVER (PARTITION BY vec_id, s
                            ORDER BY dist, code) AS rn
  FROM d
), q AS (
  SELECT vec_id AS query_id, v FROM e WHERE vec_id < 10
), qsv AS (
  SELECT query_id, s, v[s * {_PQ_SUB} + 1 : s * {_PQ_SUB} + {_PQ_SUB}] AS qv
  FROM q, UNNEST(generate_series(0, {_PQ_M - 1})) AS t(s)
), tb AS (
  SELECT query_id, s, code,
         list_reduce(list_transform(generate_series(1, {_PQ_SUB}),
                     i -> (qv[i] - cw[i]) * (qv[i] - cw[i])),
                     (acc, x) -> acc + x) AS tdist
  FROM qsv JOIN cb USING (s)
), sc AS (
  SELECT query_id, best.vec_id AS corpus_id, SUM(tdist) AS adist
  FROM best JOIN tb ON best.s = tb.s AND best.code = tb.code
  WHERE best.rn = 1 AND query_id <> best.vec_id
  GROUP BY query_id, best.vec_id
), rk AS (
  SELECT query_id, corpus_id, {R("adist", 6)} AS approx_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {R("adist", 6)}, corpus_id) AS rnk
  FROM sc
)
SELECT query_id, corpus_id, approx_dist, CAST(rnk AS INT) AS rnk
FROM rk WHERE rnk <= 5
""",
    doc=(
        "Asymmetric-distance (ADC) top-5 over PQ codes — the search "
        "half of Jegou 2011 completing ext_embed_pq: each query "
        "precomputes an (m x k) table of exact subspace distances to "
        "every codeword, approximate distance = sum of m table lookups; "
        "the corpus FLOATS are never touched at query time (the codes "
        "table is 8 bytes/vector).  Ranked by the 6dp-ROUNDED distance "
        "then corpus_id so the kept set is engine-stable: identical-"
        "code vectors tie exactly and cross-engine summation-order "
        "noise (~1e-15 over 8 addends) cannot flip a 1e-6 key.  Scale "
        "shape: query tables broadcast (nq*m*k rows), codes join is "
        "broadcast-hash — the corpus never shuffles before the partial "
        "(query, corpus) agg; per-query top-k is a bounded window "
        "(operators/pq.py:pq_adc_topk)."
    ),
)
def ext_sim_topk_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_ballista_spark.operators.pq import pq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
    return pq_adc_topk(
        queries_df, corpus, "query_id", "corpus_id", "embedding",
        k=5, m=_PQ_M, n_codes=_PQ_K,
    ).select(
        "query_id",
        "corpus_id",
        cround(F.col("approx_dist"), 6).alias("approx_dist"),
        "rnk",
    )


_IVFPQ_CELLS, _IVFPQ_NPROBE = 16, 4


@query(
    "ext_sim_topk_ivfpq",
    f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), nz AS (
  SELECT vec_id, v FROM e WHERE sqrt({_sql_dot("v", "v")}) > 0
), cent AS (
  SELECT v AS ce,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                            vec_id) - 1 AS cell
  FROM nz
  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                             vec_id) <= {_IVFPQ_CELLS}
), cw AS (
  SELECT cell, ce, sqrt({_sql_dot("ce", "ce")}) AS cen FROM cent
), c AS (
  SELECT vec_id AS corpus_id, v AS cv,
         sqrt({_sql_dot("v", "v")}) AS cn
  FROM nz
), asg AS (
  SELECT corpus_id, cell,
         row_number() OVER (PARTITION BY corpus_id
                            ORDER BY sim DESC, cell ASC) AS r
  FROM (SELECT corpus_id, cell,
               {_sql_dot("cv", "ce")} / nullif(cn * cen, 0.0) AS sim
        FROM c CROSS JOIN cw)
), idx AS (
  SELECT corpus_id, cell FROM asg WHERE r = 1
), qa AS (
  SELECT vec_id AS query_id, v AS qv,
         sqrt({_sql_dot("v", "v")}) AS qn
  FROM e WHERE vec_id < 10
), qs AS (
  SELECT query_id, cell,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, cell DESC) AS r
  FROM (SELECT query_id, cell,
               {_sql_dot("qv", "ce")} / nullif(qn * cen, 0.0) AS sim
        FROM qa CROSS JOIN cw)
), pr AS (
  SELECT query_id, cell FROM qs WHERE r <= {_IVFPQ_NPROBE}
), cbsrc AS (
  SELECT v, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                               vec_id) - 1 AS code
  FROM e
  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                             vec_id) <= {_PQ_K}
), cb AS (
  SELECT s, code, v[s * {_PQ_SUB} + 1 : s * {_PQ_SUB} + {_PQ_SUB}] AS cw2
  FROM cbsrc, UNNEST(generate_series(0, {_PQ_M - 1})) AS t(s)
), sv AS (
  SELECT vec_id, s, v[s * {_PQ_SUB} + 1 : s * {_PQ_SUB} + {_PQ_SUB}] AS sv
  FROM e, UNNEST(generate_series(0, {_PQ_M - 1})) AS t(s)
), d AS (
  SELECT vec_id, s, code,
         list_reduce(list_transform(generate_series(1, {_PQ_SUB}),
                     i -> (sv[i] - cw2[i]) * (sv[i] - cw2[i])),
                     (acc, x) -> acc + x) AS dist
  FROM sv JOIN cb USING (s)
), best AS (
  SELECT vec_id, s, code,
         row_number() OVER (PARTITION BY vec_id, s
                            ORDER BY dist, code) AS rn
  FROM d
), qsv AS (
  SELECT query_id, s, qv[s * {_PQ_SUB} + 1 : s * {_PQ_SUB} + {_PQ_SUB}] AS qsv
  FROM qa, UNNEST(generate_series(0, {_PQ_M - 1})) AS t(s)
), tb AS (
  SELECT query_id, s, code,
         list_reduce(list_transform(generate_series(1, {_PQ_SUB}),
                     i -> (qsv[i] - cw2[i]) * (qsv[i] - cw2[i])),
                     (acc, x) -> acc + x) AS tdist
  FROM qsv JOIN cb USING (s)
), cand AS (
  SELECT query_id, corpus_id
  FROM pr JOIN idx USING (cell)
  WHERE query_id <> corpus_id
), sc AS (
  SELECT cand.query_id, cand.corpus_id, SUM(tdist) AS adist
  FROM cand
  JOIN best ON best.vec_id = cand.corpus_id AND best.rn = 1
  JOIN tb ON tb.query_id = cand.query_id AND tb.s = best.s
         AND tb.code = best.code
  GROUP BY cand.query_id, cand.corpus_id
), rk AS (
  SELECT query_id, corpus_id, {R("adist", 6)} AS approx_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {R("adist", 6)}, corpus_id) AS rnk
  FROM sc
)
SELECT query_id, corpus_id, approx_dist, CAST(rnk AS INT) AS rnk
FROM rk WHERE rnk <= 5
""",
    doc=(
        "IVF-PQ top-5 — the standard billion-scale ANN composition (the "
        "faiss IVFx,PQy index; Jegou 2011 SV): the IVF coarse quantizer "
        "prunes to nprobe=4 of 16 cells, and within probed cells "
        "distances are ADC table lookups over the 8-byte PQ codes — the "
        "corpus floats are touched only at index time; the serving "
        "working set is codes + cell ids.  Non-residual variant (global "
        "codebooks; the residual composition is implemented — "
        "pq.ivf_pq_residual_topk with a Lloyd-trained coarse quantizer, "
        "measured in SCALING.md r7).  "
        "NOTE: this entry demonstrates the DATAFLOW with md5-sample "
        "codebooks (value-exact in plain SQL but ~0.3 recall by "
        "construction); the production-quality composition — trained "
        "codebooks + ADC shortlist + exact rerank, recall@10 0.984 at "
        "registry settings — is the oracled ext_sim_topk_pq_trained "
        "entry; compose the IVF stage on clustered corpora via "
        "ivf_pq_topk(books=train_codebooks(...)).  "
        "Value-exact oracle composing the ext_sim_topk_ivf cell CTEs "
        "(md5-ordered centroids, sim-DESC/cell-ASC assignment, "
        "sim-DESC/cell-DESC probes) with the ext_embed_pq code CTEs and "
        "the ADC ranking contract (6dp-rounded distance, id ties).  "
        "Scale shape: bounded centroid/codebook driver artifacts, "
        "map-only assignment + encode, probes broadcast, cell-"
        "partitioned layout prunes at the file level "
        "(operators/pq.py:ivf_pq_topk)."
    ),
)
def ext_sim_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_ballista_spark.operators.pq import ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
    return ivf_pq_topk(
        queries_df, corpus, "query_id", "corpus_id", "embedding",
        k=5, n_cells=_IVFPQ_CELLS, nprobe=_IVFPQ_NPROBE,
        m=_PQ_M, n_codes=_PQ_K,
    ).select(
        "query_id",
        "corpus_id",
        cround(F.col("approx_dist"), 6).alias("approx_dist"),
        "rnk",
    )


# trained-PQ quality-path registry settings: m=16 subspaces of 4 dims,
# 32 Lloyd-trained codewords each, ADC shortlist R=100, exact top-10 —
# recall@10 vs exact-L2 = 0.97 on the driver's isotropic sf0.01 fixture
# (tools/measure_ann_recall.py; isotropic is the WORST case for PQ)
_PQT_M, _PQT_K, _PQT_SUB = 16, 32, 4
_PQT_R, _PQT_TOPK = 100, 10

from arrow_ballista_spark.queries.extensions import (  # noqa: E402
    _ORACLE_SF_DIR,
)


def _pq_trained_oracle(sf_dir: str = _ORACLE_SF_DIR) -> str | None:
    """Generated literal-codebook oracle for the trained-PQ quality path
    (the whitening-literal precedent, queries/extensions.py): the
    per-subspace Lloyd codebooks for ``sf_dir`` are computed by the SAME
    deterministic bounded driver pass the Spark entry uses
    (operators/pq.py:train_codebooks_literals — bit-identical float64),
    embedded as a 512-row VALUES table, and the trained-ADC shortlist +
    exact-rerank composition replayed in SQL.  Returns None only when the
    fixture file is absent; warns loudly on a present-but-failing
    fixture (the _whitened_oracle contract)."""
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(emb_path):
        return None
    try:
        from arrow_ballista_spark.operators.pq import train_codebooks_literals

        books = train_codebooks_literals(sf_dir, m=_PQT_M, k=_PQT_K)
    except Exception as e:
        import warnings

        warnings.warn(
            "ext_sim_topk_pq_trained oracle generation FAILED on a present "
            f"fixture ({emb_path}): {e!r} — registering rows-only.",
            stacklevel=2,
        )
        return None
    rows = ",\n    ".join(
        "({}, {}, [{}])".format(
            s,
            c,
            ", ".join(
                f"CAST('{float(x)!r}' AS DOUBLE)" for x in books[s][c]
            ),
        )
        for s in range(_PQT_M)
        for c in range(_PQT_K)
    )
    sq = (
        f"list_reduce(list_transform(generate_series(1, {_PQT_SUB}),"
        " i -> ({v}[i] - cw[i]) * ({v}[i] - cw[i])),"
        " (acc, x) -> acc + x)"
    )
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cb(s, code, cw) AS (
  VALUES
    {rows}
), sv AS (
  SELECT vec_id, s,
         v[s * {_PQT_SUB} + 1 : s * {_PQT_SUB} + {_PQT_SUB}] AS sv
  FROM e, UNNEST(generate_series(0, {_PQT_M - 1})) AS t(s)
), d AS (
  SELECT vec_id, s, code, {sq.format(v="sv")} AS dist
  FROM sv JOIN cb USING (s)
), best AS (
  SELECT vec_id, s, code,
         row_number() OVER (PARTITION BY vec_id, s
                            ORDER BY dist, code) AS rn
  FROM d
), q AS (
  SELECT vec_id AS query_id, v FROM e WHERE vec_id < 10
), qsv AS (
  SELECT query_id, s,
         v[s * {_PQT_SUB} + 1 : s * {_PQT_SUB} + {_PQT_SUB}] AS qv
  FROM q, UNNEST(generate_series(0, {_PQT_M - 1})) AS t(s)
), tb AS (
  SELECT query_id, s, code, {sq.format(v="qv")} AS tdist
  FROM qsv JOIN cb USING (s)
), sc AS (
  SELECT query_id, best.vec_id AS corpus_id, SUM(tdist) AS adist
  FROM best JOIN tb ON best.s = tb.s AND best.code = tb.code
  WHERE best.rn = 1 AND query_id <> best.vec_id
  GROUP BY query_id, best.vec_id
), sl AS (
  SELECT query_id, corpus_id
  FROM (SELECT query_id, corpus_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY {R("adist", 6)}, corpus_id)
                 AS srnk
        FROM sc)
  WHERE srnk <= {_PQT_R}
), rr AS (
  SELECT sl.query_id, sl.corpus_id,
         list_reduce(list_transform(list_zip(q.v, ce.v),
                     x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
                        * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))),
                     (acc, x) -> acc + x) AS dist
  FROM sl
  JOIN q ON q.query_id = sl.query_id
  JOIN e ce ON ce.vec_id = sl.corpus_id
)
SELECT query_id, corpus_id, {R("dist", 6)} AS dist, CAST(rnk AS INT) AS rnk
FROM (SELECT query_id, corpus_id, dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY {R("dist", 6)}, corpus_id) AS rnk
      FROM rr)
WHERE rnk <= {_PQT_TOPK}
"""


@query(
    "ext_sim_topk_pq_trained",
    _pq_trained_oracle(),
    doc=(
        "The PRODUCTION-shaped compressed-ANN quality path, externally "
        "witnessed end-to-end (VERDICT r6 item 1): per-subspace Lloyd-"
        "TRAINED PQ codebooks (m=16 subspaces x 32 codewords over 64-d, "
        "trained on the 4096 smallest-id vectors — bounded deterministic "
        "driver pass, operators/pq.py:train_codebooks_literals), "
        "asymmetric-distance shortlist of the top-100 per query, then "
        "EXACT squared-L2 re-ranking of the shortlist to top-10 (the "
        "faiss IVFPQR refine step; Jegou 2011).  Quality at these exact "
        "registry settings: recall@10 vs exact-L2 = 0.97 on the driver's "
        "isotropic sf0.01 fixture and 1.00 on the clustered-GMM fixture "
        "(tools/measure_ann_recall.py --trained) — vs ~0.3 for the "
        "md5-sample codebooks that keep ext_sim_topk_ivfpq value-exact "
        "in plain SQL.  Value-exact oracle via the literal-codebook "
        "pattern (the whitening-matrix precedent): the SAME bit-"
        "identical float64 codebooks feed the Spark plan and a generated "
        "512-row VALUES table in SQL; ADC sums and exact distances rank "
        "by the 6dp-ROUNDED value then id (engine-stable ties).  The "
        "IVF cell stage is deliberately omitted at registry settings: "
        "on isotropic data cell pruning caps recall at ~0.67 (measured) "
        "— it is the structure-dependent layer, composable via "
        "ivf_pq_topk(books=...) when the corpus clusters.  Scale shape: "
        "codebooks broadcast (512 x 4 doubles), encode is a keyed agg "
        "over (vector, subspace) rows, query tables broadcast, the "
        "corpus never shuffles before the (query, corpus) partial agg; "
        "rerank touches only nq*R corpus rows via a keyed equi-join."
    ),
)
def ext_sim_topk_pq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_ballista_spark.operators.pq import (
        adc_rerank_exact,
        pq_adc_topk,
        train_codebooks_literals,
    )

    books = train_codebooks_literals(sf_dir, m=_PQT_M, k=_PQT_K)
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
    shortlist = pq_adc_topk(
        queries_df, corpus, "query_id", "corpus_id", "embedding",
        k=_PQT_R, m=_PQT_M, n_codes=_PQT_K, books=books,
    )
    return adc_rerank_exact(
        shortlist, queries_df, corpus,
        "query_id", "corpus_id", "embedding", k=_PQT_TOPK,
    )


# residual IVF-PQ registry settings: 16 Lloyd-trained coarse cells,
# nprobe=12 (the isotropic sf fixture is the worst case for cell
# pruning — nprobe=4 caps rerank recall at 0.87, 12 reaches 0.97;
# measured, SCALING.md r8), residual m=16x32 codebooks, ADC shortlist
# R=100, exact rerank top-10
_RIVF_CELLS, _RIVF_NPROBE, _RIVF_R = 16, 12, 100


def _ivfpq_residual_oracle(sf_dir: str = _ORACLE_SF_DIR) -> str | None:
    """Generated literal oracle for the RESIDUAL IVF-PQ quality path
    (VERDICT r7 item 2 — the faiss ``IVFx,PQy`` composition, Jegou 2011
    §V.A): the Lloyd-trained coarse centroids AND residual codebooks
    for ``sf_dir`` come from the same deterministic bounded driver pass
    the Spark entry uses (operators/pq.py:train_residual_literals —
    bit-identical float64, verified by test), embedded as VALUES
    tables; the oracle replays cell assignment (sim DESC / cell ASC
    ties — the ivf.assign_cells contract), nprobe probing (sim DESC /
    cell DESC — probe_cells), residual encode, per-probed-cell ADC
    tables over the QUERY residual, shortlist top-R, and the exact-L2
    rerank to top-10.  Returns None only when the fixture is absent;
    warns loudly on a present-but-failing fixture."""
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(emb_path):
        return None
    try:
        from arrow_ballista_spark.operators.pq import train_residual_literals

        cents, books = train_residual_literals(
            sf_dir, n_cells=_RIVF_CELLS, m=_PQT_M, k=_PQT_K
        )
    except Exception as e:
        import warnings

        warnings.warn(
            "ext_sim_topk_ivfpq_residual oracle generation FAILED on a "
            f"present fixture ({emb_path}): {e!r} — registering rows-only.",
            stacklevel=2,
        )
        return None
    cent_rows = ",\n    ".join(
        "({}, [{}])".format(
            i, ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in c)
        )
        for i, c in enumerate(cents)
    )
    cb_rows = ",\n    ".join(
        "({}, {}, [{}])".format(
            s,
            c,
            ", ".join(
                f"CAST('{float(x)!r}' AS DOUBLE)" for x in books[s][c]
            ),
        )
        for s in range(_PQT_M)
        for c in range(_PQT_K)
    )
    sq = (
        f"list_reduce(list_transform(generate_series(1, {_PQT_SUB}),"
        " i -> ({v}[i] - cw[i]) * ({v}[i] - cw[i])),"
        " (acc, x) -> acc + x)"
    )
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cent(cell, ce) AS (
  VALUES
    {cent_rows}
), cw AS (
  SELECT cell, ce, sqrt({_sql_dot("ce", "ce")}) AS cen FROM cent
), cb(s, code, cwv) AS (
  VALUES
    {cb_rows}
), c AS (
  SELECT vec_id AS corpus_id, v AS cv, sqrt({_sql_dot("v", "v")}) AS cn
  FROM e WHERE sqrt({_sql_dot("v", "v")}) > 0
), asg AS (
  SELECT corpus_id, cell,
         row_number() OVER (PARTITION BY corpus_id
                            ORDER BY sim DESC, cell ASC) AS r
  FROM (SELECT corpus_id, cell,
               {_sql_dot("cv", "ce")} / nullif(cn * cen, 0.0) AS sim
        FROM c CROSS JOIN cw)
), idx AS (
  SELECT corpus_id, cell FROM asg WHERE r = 1
), rc AS (
  SELECT c.corpus_id, idx.cell,
         list_transform(generate_series(1, len(c.cv)),
                        i -> c.cv[i] - cent.ce[i]) AS rv
  FROM c JOIN idx USING (corpus_id) JOIN cent USING (cell)
), sv AS (
  SELECT corpus_id, s,
         rv[s * {_PQT_SUB} + 1 : s * {_PQT_SUB} + {_PQT_SUB}] AS svv
  FROM rc, UNNEST(generate_series(0, {_PQT_M - 1})) AS t(s)
), d AS (
  SELECT corpus_id, s, code,
         {sq.format(v="svv").replace("cw[", "cwv[")} AS dist
  FROM sv JOIN cb USING (s)
), best AS (
  SELECT corpus_id, s, code,
         row_number() OVER (PARTITION BY corpus_id, s
                            ORDER BY dist, code) AS rn
  FROM d
), qa AS (
  SELECT vec_id AS query_id, v AS qv, sqrt({_sql_dot("v", "v")}) AS qn
  FROM e WHERE vec_id < 10
), qs AS (
  SELECT query_id, cell,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, cell DESC) AS r
  FROM (SELECT query_id, cell,
               {_sql_dot("qv", "ce")} / nullif(qn * cen, 0.0) AS sim
        FROM qa CROSS JOIN cw)
), pr AS (
  SELECT query_id, cell FROM qs WHERE r <= {_RIVF_NPROBE}
), qr AS (
  SELECT qa.query_id, pr.cell,
         list_transform(generate_series(1, len(qa.qv)),
                        i -> qa.qv[i] - cent.ce[i]) AS qrv
  FROM qa JOIN pr USING (query_id) JOIN cent USING (cell)
), qsv AS (
  SELECT query_id, cell, s,
         qrv[s * {_PQT_SUB} + 1 : s * {_PQT_SUB} + {_PQT_SUB}] AS qsvv
  FROM qr, UNNEST(generate_series(0, {_PQT_M - 1})) AS t(s)
), tb AS (
  SELECT query_id, cell, s, code,
         {sq.format(v="qsvv").replace("cw[", "cwv[")} AS tdist
  FROM qsv JOIN cb USING (s)
), cand AS (
  SELECT pr.query_id, idx.corpus_id, pr.cell
  FROM pr JOIN idx USING (cell)
  WHERE pr.query_id <> idx.corpus_id
), sc AS (
  SELECT cand.query_id, cand.corpus_id, SUM(tb.tdist) AS adist
  FROM cand
  JOIN best ON best.corpus_id = cand.corpus_id AND best.rn = 1
  JOIN tb ON tb.query_id = cand.query_id AND tb.cell = cand.cell
         AND tb.s = best.s AND tb.code = best.code
  GROUP BY cand.query_id, cand.corpus_id
), sl AS (
  SELECT query_id, corpus_id
  FROM (SELECT query_id, corpus_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY {R("adist", 6)}, corpus_id)
                 AS srnk
        FROM sc)
  WHERE srnk <= {_RIVF_R}
), rr AS (
  SELECT sl.query_id, sl.corpus_id,
         list_reduce(list_transform(generate_series(1, len(qa.qv)),
                     i -> (qa.qv[i] - ce2.v[i]) * (qa.qv[i] - ce2.v[i])),
                     (acc, x) -> acc + x) AS dist
  FROM sl
  JOIN qa ON qa.query_id = sl.query_id
  JOIN e ce2 ON ce2.vec_id = sl.corpus_id
)
SELECT query_id, corpus_id, {R("dist", 6)} AS dist, CAST(rnk AS INT) AS rnk
FROM (SELECT query_id, corpus_id, dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY {R("dist", 6)}, corpus_id) AS rnk
      FROM rr)
WHERE rnk <= {_PQT_TOPK}
"""


@query(
    "ext_sim_topk_ivfpq_residual",
    _ivfpq_residual_oracle(),
    doc=(
        "RESIDUAL IVF-PQ with exact rerank — the faiss-complete "
        "``IVFx,PQy`` composition (Jegou 2011 §V.A), promoted from a "
        "library path to a witnessed entry (VERDICT r7 item 2): a "
        "Lloyd-TRAINED coarse quantizer (16 spherical-k-means cells "
        "over the bounded smallest-id nonzero sample — trained cell "
        "MEANS are what make residuals shrink; a random point sample "
        "makes them 1.3x WORSE, measured in SCALING.md r7) prunes to "
        "nprobe=12 cells; corpus vectors PQ-encode their residual "
        "v - centroid(cell(v)) against m=16x32 residual codebooks; "
        "each query builds per-probed-cell ADC tables over its own "
        "residual; the top-100 ADC shortlist reranks with exact "
        "squared-L2 to top-10.  Recall@10 vs exact-L2 at these exact "
        "registry settings: 0.97 on the isotropic sf0.01 fixture "
        "(nprobe=4 would cap it at 0.87 — cell pruning is the "
        "structure-dependent layer; measured, SCALING.md r8).  "
        "Value-exact oracle via the literal pattern: "
        "train_residual_literals streams the parquet row groups "
        "(O(sample) driver memory) and produces bit-identical "
        "centroids+codebooks to the Spark-side trainers (pinned by "
        "test), embedded as VALUES tables; assignment/probe tie "
        "contracts as ext_sim_topk_ivfpq, ranking by 6dp-rounded "
        "distance then id.  Scale shape: centroids+codebooks are "
        "bounded broadcast artifacts; assignment and residual encode "
        "are map-only over a broadcast centroid join; candidates come "
        "from the probed-cell equi-join (never all-pairs); rerank "
        "touches nq*R corpus rows via a keyed equi-join."
    ),
)
def ext_sim_topk_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_ballista_spark.operators.pq import (
        adc_rerank_exact,
        ivf_pq_residual_topk,
        train_residual_literals,
    )

    cents, books = train_residual_literals(
        sf_dir, n_cells=_RIVF_CELLS, m=_PQT_M, k=_PQT_K
    )
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
    shortlist = ivf_pq_residual_topk(
        queries_df, corpus, "query_id", "corpus_id", "embedding",
        k=_RIVF_R, n_cells=_RIVF_CELLS, nprobe=_RIVF_NPROBE,
        m=_PQT_M, n_codes=_PQT_K, books=books, cents=cents,
    )
    return adc_rerank_exact(
        shortlist, queries_df, corpus,
        "query_id", "corpus_id", "embedding", k=_PQT_TOPK,
    )


@query(
    "ext_sketch_hll_by_lang",
    f"""
WITH tok AS (
  SELECT lang,
         doc_id || ':' || unnest(string_split_regex(text, ' +')) AS w
  FROM documents
), hv AS (
  SELECT lang, {_sql_hex15("'hll:' || w")} AS h FROM tok
), rr AS (
  SELECT lang, h % {_HLL_M} AS bucket, h >> {_HLL_P} AS wv FROM hv
), rho AS (
  SELECT lang, bucket,
         CASE WHEN wv = 0 THEN {_HLL_RHO_CAP}
              ELSE least(length(bin(wv & -wv)), {_HLL_RHO_CAP}) END AS rho
  FROM rr
), regs AS (
  SELECT lang, bucket, MAX(rho) AS m_j FROM rho GROUP BY lang, bucket
), spine AS (
  SELECT lang, r AS bucket
  FROM (SELECT DISTINCT lang FROM tok), range(0, {_HLL_M}) t(r)
), mm AS (
  SELECT spine.lang, COALESCE(regs.m_j, 0) AS m_j
  FROM spine LEFT JOIN regs USING (lang, bucket)
), agg AS (
  SELECT lang,
         CAST(SUM(1::BIGINT << ({_HLL_SCALE} - m_j)) AS BIGINT) AS s_scaled,
         CAST(SUM(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zeros
  FROM mm GROUP BY lang
), ex AS (
  SELECT lang, COUNT(DISTINCT w) AS exact_distinct FROM tok GROUP BY lang
), fin AS (
  SELECT lang,
         CASE WHEN {_HLL_NUM} / s_scaled <= 2.5 * {_HLL_M} AND zeros > 0
              THEN {_HLL_M} * ln({_HLL_M} / CAST(zeros AS DOUBLE))
              ELSE {_HLL_NUM} / s_scaled END AS est_c,
         s_scaled, zeros
  FROM agg
)
SELECT fin.lang,
       CAST({_HLL_M} - zeros AS BIGINT) AS nonzero_regs,
       s_scaled,
       {R('est_c', 2)} AS est,
       CAST(exact_distinct AS BIGINT) AS exact_distinct
FROM fin JOIN ex ON fin.lang = ex.lang
""",
    doc=(
        "Per-GROUP HyperLogLog: approximate distinct posting count per "
        "language in ONE two-phase aggregation — the GROUP BY "
        "citizenship that is the whole point of a mergeable sketch "
        "(exact per-group COUNT(DISTINCT) state is each group's value "
        "universe; the sketch is n_groups * 256 register rows BY "
        "CHOICE, and groups merge across shards/micro-batches by "
        "re-MAXing registers).  Same exact-integer register arithmetic "
        "as ext_sketch_hll, per-group empty-register spine = distinct "
        "langs x 256 bucket ids (never the data), small-range "
        "correction per group; est vs per-group COUNT(DISTINCT) both "
        "emitted so the error envelope is oracled "
        "(operators/sketch.py:hll_build_by/hll_estimate_by)."
    ),
)
def ext_sketch_hll_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_ballista_spark.operators import sketch as sk

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang",
        F.explode(F.expr("split(text, ' +')")).alias("t"),
        "doc_id",
    ).select(
        "lang",
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("t"))
        .alias("w"),
    )
    regs = sk.hll_build_by(tok, "w", ["lang"], p=_HLL_P)
    est = sk.hll_estimate_by(regs, ["lang"], p=_HLL_P)
    exact = tok.groupBy("lang").agg(
        F.count_distinct("w").alias("exact_distinct")
    )
    return est.join(exact, "lang").select(
        "lang",
        "nonzero_regs",
        "s_scaled",
        cround(F.col("est"), 2).alias("est"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
    )


_BPE_K = 8


def _bpe_oracle(k: int = _BPE_K) -> str:
    """Unrolled k-iteration BPE training chain in portable SQL (the
    pagerank unrolled-CTE precedent): word-frequency table -> per
    iteration, adjacent-pair counts over the |-separated symbol strings,
    deterministic argmax (count DESC, left ASC, right ASC), literal
    string-replace merge.  No generated literals — the whole algorithm
    is SQL-expressible, so the oracle is static and SF-independent."""
    parts = [
        """
WITH words AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT lower(w0) AS w
        FROM (SELECT unnest(string_split_regex(text, ' +')) AS w0
              FROM documents))
  WHERE regexp_matches(w, '^[a-z0-9]+$')
  GROUP BY w
), r0 AS MATERIALIZED (
  SELECT w, regexp_replace(w, '(.)', '|\\1|', 'g') || '|</w>|' AS r, n
  FROM words
)"""
    ]
    for i in range(k):
        parts.append(
            f""", p{i} AS (
  SELECT s[j] AS l, s[j + 1] AS rr, CAST(SUM(n) AS BIGINT) AS cnt
  FROM (SELECT list_filter(string_split(r, '|'), x -> x <> '') AS s, n
        FROM r{i}),
       UNNEST(generate_series(1, len(s) - 1)) AS t(j)
  GROUP BY s[j], s[j + 1]
), b{i} AS MATERIALIZED (
  SELECT l, rr, cnt FROM p{i} ORDER BY cnt DESC, l ASC, rr ASC LIMIT 1
), r{i + 1} AS MATERIALIZED (
  SELECT w, replace(r,
                 '|' || (SELECT l FROM b{i}) || '||'
                     || (SELECT rr FROM b{i}) || '|',
                 '|' || (SELECT l FROM b{i})
                     || (SELECT rr FROM b{i}) || '|') AS r, n
  FROM r{i}
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INT) AS rank, l AS left_tok, rr AS right_tok,"
        f" cnt AS pair_count FROM b{i}"
        for i in range(k)
    )
    return "".join(parts) + "\n" + union + "\n"


def _bpe_tokenize_oracle(k: int = _BPE_K) -> str:
    """The APPLY half on the same unrolled chain: per-word subword
    counts from the final representation r{k}, joined back onto the
    document word stream, aggregated per doc."""
    chain = _bpe_oracle(k)
    # reuse everything up to (and including) the last r{k} CTE, drop the
    # train entry's UNION tail
    cut = chain.rindex(")\n")
    prefix = chain[: cut + 1]
    return (
        prefix
        + f""", toks AS (
  SELECT w,
         CAST(len(s) - CASE WHEN s[-1] = '</w>' THEN 1 ELSE 0 END
              AS BIGINT) AS toks
  FROM (SELECT w, list_filter(string_split(r, '|'), x -> x <> '') AS s
        FROM r{k})
), occ AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, lower(w0) AS w
        FROM (SELECT doc_id,
                     unnest(string_split_regex(text, ' +')) AS w0
              FROM documents))
  WHERE regexp_matches(w, '^[a-z0-9]+$')
)
SELECT occ.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(length(occ.w)) AS BIGINT) AS n_chars,
       CAST(SUM(toks.toks) AS BIGINT) AS n_tokens
FROM occ JOIN toks USING (w)
GROUP BY occ.doc_id
"""
    )


@query(
    "ext_text_bpe_train",
    _bpe_oracle(),
    doc=(
        "Distributed BPE tokenizer-merge training (Sennrich et al. 2016 "
        "— the public byte-pair-encoding algorithm behind modern LLM "
        "tokenizer families): learn the first 8 merge rules on the "
        "corpus, emitting (rank, left_tok, right_tok, pair_count) in "
        "training order.  Engine: operators/text.py:bpe_train_merges — "
        "the corpus shuffles ONCE into the word-frequency table "
        "(vocabulary-sized at any corpus scale, Heaps' law); each "
        "iteration is one vocabulary-sized pair-count agg + a map-only "
        "literal-replace merge, collecting exactly one argmax row "
        "(bounded driver work, the IVF-centroid pattern).  The merge "
        "application is a single non-overlapping left-to-right string "
        "replace on |-separated symbol strings — exactly BPE's greedy "
        "order, identical semantics in Spark and DuckDB.  Oracle: the "
        "same 8 iterations unrolled as a static CTE chain (the pagerank "
        "precedent) — no generated literals, deterministic argmax ties "
        "(count DESC, left ASC, right ASC; binary collation both "
        "engines).  Cross-checked against a pure-Python BPE reference "
        "in tests/test_extensions.py."
    ),
)
def ext_text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_ballista_spark.operators.text import bpe_train_merges

    docs = load_table(spark, sf_dir, "documents")
    return bpe_train_merges(docs, "text", k=_BPE_K)


@query(
    "ext_text_bpe_tokenize",
    _bpe_tokenize_oracle(),
    doc=(
        "APPLY half of the BPE tokenizer (completing ext_text_bpe_train "
        "into a train+tokenize pair): tokenize every document against "
        "the vocabulary learned by the 8 trained merges, emitting "
        "(doc_id, n_words, n_chars, n_tokens) — n_chars/n_tokens is the "
        "compression the merges buy, the statistic a token-budgeted "
        "corpus pipeline needs per document.  Engine: "
        "operators/text.py:bpe_token_counts — the per-word subword "
        "count is computed ONCE per distinct word on the "
        "vocabulary-sized representation table, then a word-keyed join "
        "onto the document word stream + one per-doc agg; the trained "
        "tokenizer never re-walks characters at apply time (at 100 TB "
        "the vocab table broadcasts and apply is map-side).  Oracle: "
        "the same unrolled 8-iteration MATERIALIZED chain extended with "
        "the subword-count join — static SQL, no literals."
    ),
)
def ext_text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_ballista_spark.operators.text import bpe_token_counts

    docs = load_table(spark, sf_dir, "documents")
    return bpe_token_counts(docs, "text", "doc_id", k=_BPE_K)
