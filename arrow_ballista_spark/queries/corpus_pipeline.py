"""Corpus-construction pipeline queries: deterministic sampling, shard
packing, decontamination, canonical dedup, range join, PII redaction,
normalization, n-gram corpus stats.

These extend the reference surface (arrow-ballista has no corpus ops —
SURVEY.md §2 extensions): the stages between "raw documents" and "training
shards".  Every oracle is value-exact: sampling keys are md5-of-string
(bit-identical across engines on ASCII), weights/counts are integers, and
the one double computation (interval bounds) is min/max arithmetic with no
summation-order dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arrow_ballista_spark.catalog import load_table
from arrow_ballista_spark.operators import corpus, dedup
from arrow_ballista_spark.queries import query
from arrow_ballista_spark.queries.extensions import _SQL_WORD_GRAMS

# DuckDB twin of operators.corpus.hash_bucket
def _sql_hash_bucket(expr: str, digits: int = 4) -> str:
    return f"substr(md5(CAST({expr} AS VARCHAR)), 1, {digits})"


@query(
    "ext_sample_hash",
    f"""
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM documents
WHERE {_sql_hash_bucket('doc_id')} < '4000'
""",
    doc=(
        "deterministic Bernoulli sample (~25%): keep rows whose md5(id) hex "
        "prefix sorts below the threshold.  Map-only (filter rides the "
        "scan — no shuffle, no rand()), reproducible across reruns and "
        "task retries, so a 100 TB sample is resumable and auditable."
    ),
)
def ext_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return corpus.hash_sample(docs, "doc_id", "4000").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )


@query(
    "ext_split_train_val_test",
    f"""
SELECT doc_id,
       CASE WHEN {_sql_hash_bucket('doc_id')} < 'c000' THEN 'train'
            WHEN {_sql_hash_bucket('doc_id')} < 'e000' THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
    doc=(
        "deterministic train/val/test split (75/12.5/12.5) by md5-of-id "
        "hex range.  Map-only and a pure function of the row id — stable "
        "across reruns, retries, and cluster sizes (randomSplit is none "
        "of these), so a 100 TB split is reproducible and every "
        "document's membership is auditable (operators/corpus.py"
        ":train_val_test_split)."
    ),
)
def ext_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return corpus.train_val_test_split(docs, "doc_id").select(
        "doc_id", "split"
    )


@query(
    "ext_pack_sequences",
    """
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n_toks
  FROM documents
), c AS (
  SELECT doc_id, n_toks,
         COALESCE(SUM(n_toks) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM t
), s AS (
  SELECT doc_id, n_toks, cum_before,
         unnest(generate_series(
             CAST(floor(cum_before / 1000) AS BIGINT),
             CAST(floor((cum_before + n_toks - 1) / 1000) AS BIGINT)))
           AS seq_id
  FROM c WHERE n_toks > 0
)
SELECT doc_id, seq_id,
       CAST(greatest(0, cum_before - seq_id * 1000) AS BIGINT) AS tok_start,
       CAST(least(1000, cum_before + n_toks - seq_id * 1000) AS BIGINT)
         AS tok_end
FROM s
""",
    doc=(
        "Fixed-length sequence packing (the LLM pretraining layout): "
        "documents concatenate in id order, the token stream cuts every "
        "1000 tokens, and each (doc, sequence) overlap row carries the "
        "doc's [tok_start, tok_end) slot — attention-boundary metadata "
        "for the sequence writer.  Distributed two-pass prefix sum, "
        "never a single-task window (operators/corpus.py"
        ":pack_sequences); integer-exact, oracle = one-window SQL."
    ),
)
def ext_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " +")).cast("long").alias("n_toks"),
    )
    return corpus.pack_sequences(toks, "doc_id", "n_toks", seq_len=1000)


@query(
    "ext_mix_rebalance",
    f"""
WITH stats AS (
  SELECT lang, CAST(SUM(n_chars) AS DOUBLE) AS chars_l
  FROM documents GROUP BY lang
), tgt AS (
  SELECT MIN(chars_l) AS min_chars FROM stats
), frac AS (
  SELECT lang, min_chars / chars_l AS keep_frac FROM stats, tgt
), kept AS (
  SELECT d.doc_id, d.lang, d.n_chars, f.keep_frac
  FROM documents d JOIN frac f USING (lang)
  WHERE CAST(concat('0x', {_sql_hash_bucket('doc_id')}) AS INTEGER)
          / 65536.0 < f.keep_frac
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
       (floor(abs(MIN(keep_frac)) * 1000000 + 0.5) / 1000000e0 *
        (CASE WHEN (MIN(keep_frac)) < 0 THEN -1 ELSE 1 END)) AS keep_frac
FROM kept GROUP BY lang
""",
    doc=(
        "Deterministic corpus-mixture rebalancing: downsample every "
        "language to the smallest language's character budget "
        "(keep_frac_l = min_chars / chars_l), applied as a per-language "
        "md5-fraction filter — the data-mixing step of corpus curation, "
        "rand()-free so the rebalanced corpus is reproducible.  Scale "
        "shape: the per-language stats are |langs| rows, broadcast back; "
        "the keep decision is map-only on the corpus scan."
    ),
)
def ext_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_ballista_spark.queries import cround

    docs = load_table(spark, sf_dir, "documents")
    stats = docs.groupBy("lang").agg(
        F.sum("n_chars").cast("double").alias("chars_l")
    )
    tgt = stats.agg(F.min("chars_l").alias("min_chars"))
    frac = stats.crossJoin(F.broadcast(tgt)).select(
        "lang", (F.col("min_chars") / F.col("chars_l")).alias("keep_frac")
    )
    hash_frac = (
        F.conv(corpus.hash_bucket(F.col("doc_id"), 4), 16, 10).cast("double")
        / 65536.0
    )
    kept = docs.join(F.broadcast(frac), "lang").where(
        hash_frac < F.col("keep_frac")
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars_kept"),
        cround(F.min("keep_frac"), 6).alias("keep_frac"),
    )


@query(
    "ext_sample_stratified",
    f"""
SELECT doc_id, lang FROM documents
QUALIFY row_number() OVER (
  PARTITION BY lang ORDER BY {_sql_hash_bucket('doc_id', 8)}, doc_id) <= 20
""",
    doc=(
        "EXACT per-language 20-doc uniform sample via deterministic hash "
        "rank.  Skew-safe two-level top-k (rank within (lang, salt) first, "
        "then within lang over <= k*salt survivors) — one hot language "
        "cannot serialize into a single window task."
    ),
)
def ext_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return corpus.stratified_sample_topk(docs, "lang", "doc_id", k=20).select(
        "doc_id", "lang"
    )


@query(
    "ext_shard_pack",
    """
WITH t AS (SELECT doc_id,
                  CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n_toks
           FROM documents)
SELECT doc_id, n_toks,
       CAST(COALESCE(SUM(n_toks) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS cum_before,
       CAST(FLOOR(COALESCE(SUM(n_toks) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 1000.0)
            AS BIGINT) AS shard_id
FROM t
""",
    doc=(
        "token-budget shard packing: shard_id = floor(global exclusive "
        "prefix-sum of token counts / 1000).  Computed with the two-pass "
        "distributed scan (per-range-bucket partials -> broadcast offsets "
        "-> per-bucket windows), NOT a single-task global Window.orderBy — "
        "the oracle's one-task window is exactly what the operator avoids."
    ),
)
def ext_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " +")).cast("long").alias("n_toks")
    )
    packed = corpus.pack_shards(docs, "doc_id", "n_toks", budget=1000)
    return packed.select(
        "doc_id",
        "n_toks",
        F.col("cum_before").cast("long").alias("cum_before"),
        F.col("shard_id").cast("long").alias("shard_id"),
    )


@query(
    "ext_decontaminate",
    f"""
WITH g AS ({_SQL_WORD_GRAMS}),
bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 17 = 0),
cg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 17 <> 0),
hits AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
         FROM cg JOIN bg USING (gram) GROUP BY doc_id)
SELECT h.doc_id, CAST(len(g.grams) AS BIGINT) AS n_grams, h.n_contaminated
FROM hits h JOIN g ON h.doc_id = g.doc_id
""",
    doc=(
        "benchmark decontamination: per corpus doc, how many of its "
        "distinct word 3-grams occur in the benchmark set (docs with id % "
        "17 = 0 stand in for an eval suite).  Benchmark gram vocabulary is "
        "broadcast (eval sets are MBs vs a 100 TB corpus) so the corpus "
        "side is a map-side hash join; one shuffle total (the per-doc "
        "re-aggregation)."
    ),
)
def ext_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 17 == 0)
    corpus_docs = docs.where(F.col("doc_id") % 17 != 0)
    return corpus.decontaminate(corpus_docs, bench, "text", "doc_id", n=3)


@query(
    "ext_dedup_canonical",
    f"""
WITH RECURSIVE g AS ({_SQL_WORD_GRAMS}),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM g a JOIN g b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.grams, b.grams))
          / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5
),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
),
comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
labeled AS (
  SELECT d.doc_id, d.n_chars,
         COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(cluster_size AS BIGINT) AS cluster_size
FROM (SELECT doc_id, cluster_id,
             COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM labeled)
WHERE rn = 1
""",
    doc=(
        "END-TO-END dedup: LSH near-dup pairs -> connected components -> "
        "keep ONE doc per cluster (largest n_chars, ties -> smallest id) — "
        "the corpus a training run actually reads.  Cluster membership is "
        "a tiny broadcast against the corpus; the per-cluster pick windows "
        "over duplicate cliques, not the corpus."
    ),
)
def ext_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(
        docs, "text", "doc_id", threshold=0.5, num_perm=128, rows_per_band=4
    ).select("id_a", "id_b")
    cc_stats: dict = {}
    comp = dedup.connected_components(pairs, stats=cc_stats)
    kept = corpus.canonical_dedup(
        docs, comp, "doc_id", "n_chars",
        n_components=cc_stats.get("n_nodes"),
    )
    return kept.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )


@query(
    "ext_join_range_bucketed",
    """
WITH iv AS (SELECT event_type AS band, MIN(value) AS lo,
                   (MIN(value) + MAX(value)) / 2 AS hi
            FROM events GROUP BY event_type)
SELECT iv.band, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN iv ON e.value >= iv.lo AND e.value < iv.hi
GROUP BY iv.band
""",
    doc=(
        "range (interval) join as a bucketed EQUI join: left values map to "
        "floor(v/width) buckets, right intervals explode into covered "
        "buckets, join on bucket + exact residual — Catalyst plans a "
        "shuffled hash/sort-merge join parallel in #buckets instead of the "
        "BroadcastNestedLoopJoin a raw theta join gets.  The big*big range "
        "join path; interval bounds here are min/max arithmetic (no "
        "summation-order noise) so counts are oracle-exact."
    ),
)
def ext_join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    iv = events.groupBy(F.col("event_type").alias("band")).agg(
        F.min("value").alias("lo"),
        ((F.min("value") + F.max("value")) / 2).alias("hi"),
    )
    joined = corpus.bucketed_interval_join(events, "value", iv, "lo", "hi", 25.0)
    return joined.groupBy("band").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "ext_pii_redact",
    r"""
WITH t AS (SELECT doc_id,
                  CASE WHEN doc_id % 7 = 0
                       THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com now'
                       ELSE text END AS raw
           FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(raw,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
         AS n_emails,
       md5(regexp_replace(raw,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
            '<EMAIL>', 'g')) AS redacted_md5
FROM t
""",
    doc=(
        "PII redaction: count + mask email addresses (deterministically "
        "injected into 1/7 of docs so the regex has real hits).  Pure JVM "
        "regexp map stage — no shuffle; output compared by md5 of the "
        "redacted text (bit-identical on ASCII across engines)."
    ),
)
def ext_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    pat = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    docs = load_table(spark, sf_dir, "documents")
    raw = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com now"),
        ),
    ).otherwise(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(raw, F.lit(pat), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.md5(F.regexp_replace(raw, pat, "<EMAIL>").cast("binary")).alias(
            "redacted_md5"
        ),
    )


@query(
    "ext_text_normalize",
    """
SELECT doc_id,
       CAST(length(trim(regexp_replace(lower(text), ' +', ' ', 'g')))
            AS BIGINT) AS n_chars_norm,
       md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS norm_md5
FROM documents
""",
    doc=(
        "text normalization: lowercase, collapse whitespace runs, trim — "
        "the canonical form exact-dedup hashes.  Map-only JVM regexp; "
        "compared via md5 of the normalized text."
    ),
)
def ext_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), " +", " "))
    return docs.select(
        "doc_id",
        F.length(norm).cast("long").alias("n_chars_norm"),
        F.md5(norm.cast("binary")).alias("norm_md5"),
    )


@query(
    "ext_ngram_topk",
    """
WITH t AS (SELECT string_split_regex(text, ' +') AS toks FROM documents),
b AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS gram
      FROM t WHERE len(toks) >= 2)
SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt
FROM b GROUP BY gram
ORDER BY cnt DESC, gram
LIMIT 20
""",
    doc=(
        "corpus n-gram stats: top-20 word bigrams by occurrence count "
        "(ties broken by gram so the cut is deterministic).  explode -> "
        "two-phase hash agg (map-side combine) -> TakeOrderedAndProject "
        "(per-partition top-k merged on the driver, never a global sort)."
    ),
)
def ext_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # let-binding idiom (see dedup.word_shingles): bind tokens once per row;
    # empty result for <2-token docs, dropped by the explode
    grams = F.expr(
        "transform(array(split(text, ' +')), t -> "
        "CASE WHEN size(t) < 2 THEN slice(t, 1, 0) ELSE "
        "transform(sequence(1, size(t) - 1),"
        " i -> concat(t[i-1], ' ', t[i+0])) END)[0]"
    )
    return (
        docs.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "gram")
        .limit(20)
    )


@query(
    "ext_pipeline_corpus_build",
    """
WITH RECURSIVE base AS (
  SELECT doc_id, text, n_chars FROM documents
  WHERE doc_id % 17 <> 0
    AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000'
), w AS (
  SELECT doc_id, string_split_regex(text, ' +') AS toks FROM base
), q AS (
  SELECT doc_id FROM w
  WHERE 1.0 - len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) <= 0.6
), qdocs AS (
  SELECT b.doc_id, b.text, b.n_chars FROM base b JOIN q USING (doc_id)
), g AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) < 3 THEN toks
             ELSE list_transform(generate_series(1, len(toks) - 2),
                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END)
           AS grams
  FROM (SELECT doc_id, string_split_regex(text, ' +') AS toks FROM qdocs)
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM g a JOIN g b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.grams, b.grams))
          / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
), comp AS (
  SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
), labeled AS (
  SELECT d.doc_id, d.n_chars, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM qdocs d LEFT JOIN comp c ON d.doc_id = c.id
), kept AS (
  SELECT doc_id FROM (
    SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY cluster_id
                    ORDER BY n_chars DESC, doc_id) AS rn
    FROM labeled) WHERE rn = 1
), bgrams AS (
  SELECT DISTINCT unnest(grams) AS gram FROM (
    SELECT list_distinct(CASE WHEN len(toks) < 3 THEN toks
        ELSE list_transform(generate_series(1, len(toks) - 2),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END)
      AS grams
    FROM (SELECT string_split_regex(text, ' +') AS toks FROM documents
          WHERE doc_id % 17 = 0))
), contaminated AS (
  SELECT DISTINCT cg.doc_id
  FROM (SELECT k.doc_id, unnest(g.grams) AS gram
        FROM kept k JOIN g ON k.doc_id = g.doc_id) cg
  JOIN bgrams USING (gram)
), clean AS (
  SELECT doc_id FROM kept
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
), t AS (
  SELECT c.doc_id,
         CAST(len(string_split_regex(d.text, ' +')) AS BIGINT) AS n_toks
  FROM clean c JOIN documents d USING (doc_id)
), packed AS (
  SELECT doc_id, n_toks,
         CAST(FLOOR(COALESCE(SUM(n_toks) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              / 2000.0) AS BIGINT) AS shard_id
  FROM t
)
SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens
FROM packed GROUP BY shard_id
""",
    doc=(
        "FLAGSHIP end-to-end corpus build — the full chain between raw "
        "documents and training shards in ONE query: deterministic 50% "
        "hash sample -> repetition-quality filter (map-only) -> LSH "
        "near-dup pairs -> connected components -> keep-one-per-cluster "
        "canonical dedup -> benchmark decontamination (broadcast gram "
        "vocabulary) -> token-budget shard packing (two-pass distributed "
        "prefix sum) -> per-shard stats.  Every stage is the registry "
        "operator it names; the oracle composes their proven SQL twins.  "
        "Scale: the corpus shuffles for LSH banding, the CC rounds, and "
        "the final shard windows; sampling/quality/decontamination stay "
        "map-only; nothing is O(n^2) and nothing collects data rows."
    ),
)
def ext_pipeline_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 17 == 0)
    corp = docs.where(F.col("doc_id") % 17 != 0)
    sampled = corpus.hash_sample(corp, "doc_id", "8000")
    toks = F.split(F.col("text"), " +")
    # tracked persists: qdocs feeds three branches (LSH pairs, canonical
    # pick, decontamination) and kept feeds two — without them every
    # branch re-runs the scan + tokenize + quality filter (measured 21s ->
    # ~8s warm at sf0.1).  Released via operators.caching.release_caches().
    from arrow_ballista_spark.operators.caching import tracked_persist

    qdocs = tracked_persist(
        sampled.where(
            F.lit(1.0)
            - F.size(F.array_distinct(toks)) / F.size(toks).cast("double")
            <= 0.6
        )
    )
    pairs = dedup.minhash_dedup_pairs(
        qdocs, "text", "doc_id", threshold=0.5, num_perm=128, rows_per_band=4
    ).select("id_a", "id_b")
    cc_stats: dict = {}
    comp = dedup.connected_components(pairs, stats=cc_stats)
    kept = tracked_persist(
        corpus.canonical_dedup(
            qdocs, comp, "doc_id", "n_chars",
            n_components=cc_stats.get("n_nodes"),
        ).select(
            "doc_id", "text"
        )
    )
    dirty = corpus.decontaminate(kept, bench, "text", "doc_id", n=3).select(
        "doc_id"
    )
    clean = kept.join(dirty, "doc_id", "left_anti").select(
        "doc_id", F.size(F.split(F.col("text"), " +")).cast("long").alias("n_toks")
    )
    packed = corpus.pack_shards(clean, "doc_id", "n_toks", budget=2000)
    return packed.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
    ).select(F.col("shard_id").cast("long").alias("shard_id"), "n_docs", "total_tokens")


@query(
    "ext_profile_table",
    """
SELECT 'doc_id' AS col,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(doc_id) AS BIGINT) AS n_nonnull,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
       CAST(MIN(doc_id) AS DOUBLE) AS min_v,
       CAST(MAX(doc_id) AS DOUBLE) AS max_v
FROM documents
UNION ALL
SELECT 'n_chars',
       CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(n_chars) AS BIGINT),
       CAST(COUNT(DISTINCT n_chars) AS BIGINT),
       CAST(MIN(n_chars) AS DOUBLE),
       CAST(MAX(n_chars) AS DOUBLE)
FROM documents
""",
    doc=(
        "data profiling (per-column rows/non-null/distinct/min/max over "
        "numeric columns) — the pre-flight check a pipeline runs before "
        "ingesting a new corpus drop.  One pass per profiled column "
        "(Spark computes all aggregates of a column in a single two-phase "
        "agg; COUNT(DISTINCT) expands to one extra shuffle each)"
    ),
)
def ext_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    def prof(col: str) -> DataFrame:
        return docs.agg(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).cast("double").alias("min_v"),
            F.max(col).cast("double").alias("max_v"),
        )

    return prof("doc_id").unionByName(prof("n_chars"))


@query(
    "ext_corpus_report",
    """
WITH t AS (
  SELECT lang, source,
         CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n_toks,
         n_chars
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM t GROUP BY lang
""",
    doc=(
        "per-language corpus report (docs, distinct sources, token/char "
        "budgets) — the mix dashboard a training-data curation loop "
        "watches.  Single two-phase aggregation; token counting is a "
        "map-side column expression"
    ),
)
def ext_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            "source",
            F.size(F.split(F.col("text"), " +")).cast("long").alias("n_toks"),
            "n_chars",
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_toks").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "ext_sample_weighted",
    """
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
              AS BIGINT) + 1) / 16777216.0) / n_chars AS wkey
  FROM documents
)
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM keyed
QUALIFY row_number() OVER (ORDER BY wkey DESC, doc_id) <= 50
""",
    doc=(
        "deterministic WEIGHTED sample (Efraimidis-Spirakis A-Res): 50 "
        "docs drawn with probability proportional to n_chars via key = "
        "ln(u)/w with u derived from md5(id) — rand()-free, so retries "
        "and reruns agree and the draw is auditable.  Map-only key "
        "computation + a global top-k (TakeOrdered, no full sort); the "
        "same two-level salted window as ext_sample_stratified applies "
        "when k is huge"
    ),
)
def ext_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.expr(
            "cast(conv(substring(md5(cast(cast(doc_id AS string) AS binary)),"
            " 1, 6), 16, 10) AS bigint)"
        )
        + F.lit(1)
    ) / F.lit(16777216.0)
    keyed = docs.select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"),
        (F.log(u) / F.col("n_chars")).alias("wkey"),
    )
    return (
        keyed.orderBy(F.col("wkey").desc(), "doc_id")
        .limit(50)
        .select("doc_id", "lang", "n_chars")
    )


@query(
    "ext_quality_percentile_filter",
    """
WITH ranked AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
         percent_rank() OVER (PARTITION BY lang
                              ORDER BY n_chars, doc_id) AS pr
  FROM documents
)
SELECT doc_id, lang, n_chars,
       (floor(abs(pr) * 10000 + 0.5) / 10000e0
        * (CASE WHEN (pr) < 0 THEN -1 ELSE 1 END)) AS pctile
FROM ranked WHERE pr >= 0.75
""",
    doc=(
        "per-language percentile curation: keep each language's top "
        "quartile by length (quality cutoffs must be per-language — "
        "scripts and tokenization differ).  percent_rank windows per "
        "lang with a deterministic (value, id) order; one shuffle on "
        "lang, skew handled the same way as ext_sample_stratified when "
        "one language dominates"
    ),
)
def ext_quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    from arrow_ballista_spark.queries import cround

    return (
        docs.select(
            "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"),
            F.percent_rank().over(w).alias("pr"),
        )
        .where(F.col("pr") >= 0.75)
        .select(
            "doc_id", "lang", "n_chars", cround(F.col("pr"), 4).alias("pctile")
        )
    )
