"""Structured Streaming extension: every streaming pipeline must equal its
batch twin when run over all available input (availableNow + memory sink)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from arrow_ballista_spark.catalog import load_table
from arrow_ballista_spark.streaming import pipeline
from tests.conftest import SF_DIR


def _batch_events(spark):
    return load_table(spark, SF_DIR, "events")


def _cmp(stream_out, batch_df, keys):
    s = (
        stream_out.toPandas()
        .sort_values(keys)
        .reset_index(drop=True)
        .astype(str)
    )
    b = (
        batch_df.toPandas()
        .sort_values(keys)
        .reset_index(drop=True)
        .astype(str)
    )
    pd.testing.assert_frame_equal(s[sorted(s.columns)], b[sorted(b.columns)])


def test_tumbling_counts_matches_batch(spark):
    stream = pipeline.tumbling_counts(pipeline.events_stream(spark, SF_DIR))
    got = pipeline.run_available_now(stream, "complete")
    want = pipeline.tumbling_counts(_batch_events(spark))
    _cmp(got, want, ["win_start", "event_type"])


def test_sliding_avg_matches_batch(spark):
    stream = pipeline.sliding_avg(pipeline.events_stream(spark, SF_DIR))
    got = pipeline.run_available_now(stream, "complete")
    want = pipeline.sliding_avg(_batch_events(spark))
    _cmp(got, want, ["win_start"])


def test_session_counts_matches_batch(spark):
    stream = pipeline.session_counts(pipeline.events_stream(spark, SF_DIR))
    got = pipeline.run_available_now(stream, "complete")
    want = pipeline.session_counts(_batch_events(spark))
    _cmp(got, want, ["sess_start", "user_id"])


def test_stateful_user_counts_matches_batch(spark):
    stream = pipeline.stateful_user_counts(
        pipeline.events_stream(spark, SF_DIR)
    )
    raw = pipeline.run_available_now(stream, "update")
    # latest-per-key reduction (update-mode sink accumulates micro-batches)
    got = raw.groupBy("user_id").agg(
        F.max("total_events").alias("total_events")
    )
    want = (
        _batch_events(spark)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("total_events"))
    )
    _cmp(got, want, ["user_id"])


def test_stream_static_enrich_matches_batch(spark, tmp_path):
    """Stream-static broadcast join == the same join in batch."""
    from arrow_ballista_spark.catalog import load_table

    events = pipeline.events_stream(spark, SF_DIR)
    dim = (
        load_table(spark, SF_DIR, "events")
        .select("user_id").distinct()
        .withColumn("segment", F.pmod("user_id", F.lit(3)))
    )
    enriched = pipeline.stream_static_enrich(
        events.select("event_id", "user_id"), dim
    )
    got = pipeline.run_available_now(enriched, output_mode="append")
    batch = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "user_id").join(dim, "user_id")
    )
    assert sorted(
        (r.event_id, r.user_id, r.segment) for r in got.collect()
    ) == sorted(
        (r.event_id, r.user_id, r.segment) for r in batch.collect()
    )


def test_sink_parquet_exactly_once_on_rerun(spark, tmp_path):
    """File sink + checkpoint: re-running the same bounded job over
    unchanged input must not duplicate rows (the metadata log records the
    committed batches; availableNow finds nothing new)."""
    from arrow_ballista_spark.catalog import load_table

    out = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "sink_ckpt")
    n_src = load_table(spark, SF_DIR, "events").count()
    for _ in range(2):  # second run resumes from the checkpoint, no-op
        src = pipeline.events_stream(spark, SF_DIR)
        pipeline.sink_parquet(
            src.select("event_id", "user_id", "ts"), out, ckpt
        )
        assert spark.read.parquet(out).count() == n_src


def test_streams_accept_directory_layout(spark, tmp_path):
    """events_stream/documents_stream must read DIRECTORY-layout parquet
    (Spark-written part files) — the leaf-name glob filter only applies
    to the single-file driver layout."""
    from arrow_ballista_spark.catalog import load_table
    from arrow_ballista_spark.streaming import pipeline as streaming
    from tests.conftest import SF_DIR

    for table, mk in (
        ("events", streaming.events_stream),
        ("documents", streaming.documents_stream),
    ):
        src = load_table(spark, SF_DIR, table)
        d = str(tmp_path / table) + ".parquet"
        src.write.parquet(d)
        got = streaming.run_available_now(
            mk(spark, str(tmp_path)), "append"
        ).count()
        assert got == src.count(), (table, got)


def test_stream_sketch_state_is_bounded_and_exact_across_batches(
    spark, tmp_path
):
    """The streaming count-min sketch absorbs MULTIPLE micro-batches into
    <= depth*width state rows and ends equal to the batch sketch of the
    whole stream — the bounded-state property that makes it the streaming
    replacement for an ever-growing exact term-count state."""
    from pyspark.sql import functions as F

    from arrow_ballista_spark.operators import sketch as sk
    from arrow_ballista_spark.streaming import pipeline as st

    rows = [(i, f"w{i % 37} w{i % 11} shared") for i in range(300)]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "docs_stream")
    # 4 files -> 4 micro-batches with maxFilesPerTrigger=1
    batch.repartition(4).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    tok = stream.select(F.explode(F.expr("split(text, ' +')")).alias("w"))
    got = st.run_available_now(
        sk.count_min_build(tok, "w", width=64, depth=3), "complete"
    )
    want = sk.count_min_build(
        batch.select(F.explode(F.expr("split(text, ' +')")).alias("w")),
        "w", width=64, depth=3,
    )
    assert got.count() <= 64 * 3
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_stream_count_min_register_merge_equals_batch(spark, tmp_path):
    """The foreachBatch register-merge CMS (the throughput path behind
    ext_stream_sketch_counts) must be byte-identical to the batch
    count_min_build over the concatenated input, across MULTIPLE
    micro-batches — counts are exact sums, so per-batch distinct-term
    pre-aggregation may not change a single cell."""
    from pyspark.sql import functions as F

    from arrow_ballista_spark.operators import sketch as sk
    from arrow_ballista_spark.streaming import pipeline as st

    rows = [(i, f"w{i % 37} w{i % 11} shared") for i in range(300)]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "docs_stream_rm")
    batch.repartition(4).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    tok = stream.select(F.explode(F.expr("split(text, ' +')")).alias("w"))
    got = st.stream_count_min(tok, "w", width=64, depth=3)
    want = sk.count_min_build(
        batch.select(F.explode(F.expr("split(text, ' +')")).alias("w")),
        "w", width=64, depth=3,
    )
    assert got.count() <= 64 * 3
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_checksum_sink_matches_memory_sink_checksum(spark, tmp_path):
    """Measurement mode (SPARK_GRAFT_STREAM_CHECKSUM_SINK): the
    foreachBatch checksum sink must record the SAME final (count, xor
    hash) the memory-sink result reduces to — so a compute-only wall is
    measured over provably the same result — and the returned frame is
    empty with the original schema so entry post-processing stays
    valid."""
    import os

    from pyspark.sql import functions as F

    from arrow_ballista_spark.streaming import pipeline as st

    rows = [(i, f"u{i % 7}") for i in range(200)]
    batch = spark.createDataFrame(rows, "id long, user string")
    src = str(tmp_path / "cs_stream")
    batch.repartition(2).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def agg_stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .groupBy("user")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    mem = st.run_available_now(agg_stream(), "complete")
    want = mem.selectExpr(
        "count(1) AS n", "bit_xor(xxhash64(struct(*))) AS cs"
    ).collect()[0]

    # env var WITHOUT the in-process opt-in: warn + normal results (a
    # leaked export must not silently empty streaming results — ADVICE
    # r11)
    import warnings

    os.environ["SPARK_GRAFT_STREAM_CHECKSUM_SINK"] = "1"
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            guarded = st.run_available_now(agg_stream(), "complete")
        assert guarded.count() == 7
        assert any(
            "CHECKSUM_SINK" in str(w.message) for w in caught
        )

        st.CHECKSUM_SINK_RESULTS.clear()
        st.CHECKSUM_SINK_OPT_IN = True
        out = st.run_available_now(agg_stream(), "complete")
    finally:
        st.CHECKSUM_SINK_OPT_IN = False
        del os.environ["SPARK_GRAFT_STREAM_CHECKSUM_SINK"]
    assert out.count() == 0
    assert out.schema == mem.schema
    rec = st.CHECKSUM_SINK_RESULTS[-1]
    assert rec["mode"] == "complete" and len(rec["batches"]) >= 2
    final = rec["batches"][-1]  # complete mode: last batch = full result
    assert (final["n"], final["cs"]) == (want["n"], want["cs"])


def test_sink_parquet_recovers_from_midstream_failure(spark, tmp_path):
    """Failure-injection for the exactly-once parquet sink (VERDICT r5
    item 7): a micro-batch CRASHES mid-query (injected exception with
    maxFilesPerTrigger=1, so earlier batches have already committed and
    the failed batch may have half-written files), then the job restarts
    from the same checkpoint — the final dataset must equal the input
    exactly: no duplicated committed batch, no missing rows, no orphan
    files visible through the _spark_metadata log."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.functions import pandas_udf

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    for i in range(4):  # four single-file micro-batches
        ids = list(range(i * 100, (i + 1) * 100))
        pq.write_table(
            pa.table({"id": ids, "v": [x * 2 for x in ids]}),
            str(src_dir / f"f{i}.parquet"),
        )
    bomb = str(tmp_path / "bomb_armed")
    open(bomb, "w").write("1")

    @pandas_udf("long")
    def maybe_boom(v: pd.Series) -> pd.Series:
        # local[*]: workers share the test FS, so the flag file is the
        # cross-process kill switch
        if os.path.exists(bomb) and (v == 500).any():  # id 250 -> f2
            raise RuntimeError("injected mid-stream failure")
        return v

    def stream_df():
        return (
            spark.readStream.schema("id long, v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
            .select("id", maybe_boom(F.col("v")).alias("v"))
        )

    out = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "sink_ckpt")
    with pytest.raises(Exception, match="injected|Query .* terminated"):
        pipeline.sink_parquet(stream_df(), out, ckpt)
    try:  # some prefix of batches committed; never the bombed one fully
        interim = spark.read.parquet(out).count()
        assert interim < 400 and interim % 100 == 0
    except Exception:
        pass  # the bombed file came first: nothing committed yet — fine
    os.remove(bomb)  # "fix the transient fault" and restart
    pipeline.sink_parquet(stream_df(), out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 400  # no missing rows, no duplicates
    rows = {(r.id, r.v) for r in got.collect()}
    assert rows == {(x, 2 * x) for x in range(400)}
