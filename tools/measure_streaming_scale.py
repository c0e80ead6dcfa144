"""Scale measurement for the Structured-Streaming entries — r10: every
other operator family has 10x/100x ladder evidence; the streaming
queries' bounded-state claims were asserted from plan shape only.

Runs each ext_stream_* registry entry at sf0.1 -> 10x (-> 100x where
the fixture exists), with a session-wide StreamingQueryListener
capturing per-batch progress.  Reports, per (entry, scale):

- ``sec_compute``: wall for the availableNow run under the checksum
  foreachBatch sink (SPARK_GRAFT_STREAM_CHECKSUM_SINK) — the streaming
  computation alone, no driver materialization (VERDICT r10 item 6);
- ``sec_total``: the r10-comparable end-to-end wall (memory-sink
  collect + entry post-processing included);
- total input rows and the max batch throughput
  (processedRowsPerSecond) the micro-batches reached;
- **max state rows** across all stateful operators and batches — the
  bounded-state claim made measurable: watermarked aggregations and
  dedup state must grow with the KEY space (windows x users), not the
  row count, so the 10x fixture (10x rows, 10x users for the suffixed
  ids) bounds how state may grow while a row-proportional state would
  mark a leak.

Usage: python tools/measure_streaming_scale.py [entry ...]
Prints one JSON line per entry plus a final JSON array.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

QUERIES = sys.argv[1:] or [
    "ext_stream_tumbling_counts",
    "ext_stream_session_counts",
    "ext_stream_session_counts_closed",
    "ext_stream_stateful_user_counts",
    "ext_stream_dedup",
    "ext_stream_stream_join",
    "ext_stream_static_join",
    "ext_stream_sketch_counts",
    "ext_stream_dedup_vs_index",
]
FIXTURES = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("10x", "/tmp/scale10x"),
    ("100x", "/tmp/scale100x"),
]


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql.streaming import StreamingQueryListener

    from arrow_ballista_spark.catalog import _configure_reader
    from arrow_ballista_spark.operators.caching import release_caches
    from arrow_ballista_spark.queries import load_all

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("streaming-scale")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "90g")
        )
        .config("spark.sql.shuffle.partitions", str(cpus))
        .getOrCreate()
    )
    _configure_reader(spark)
    spark.sparkContext.setLogLevel("ERROR")

    progress_log: list[dict] = []

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            try:
                progress_log.append(json.loads(event.progress.json))
            except Exception:
                pass

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(Capture())
    reg = load_all()
    # in-process opt-in for the checksum sink: the env var alone no
    # longer flips it (a leaked export must not silently empty results
    # in a correctness round — ADVICE r11)
    from arrow_ballista_spark.streaming import pipeline as _pipeline

    _pipeline.CHECKSUM_SINK_OPT_IN = True
    # One discarded warmup run before any timed sample: the FIRST
    # applyInPandasWithState execution of the session pays python-worker
    # pool spin-up that the r11 table recorded inside sec_compute
    # (stateful_user_counts 91.8s compute vs 25.1s total — VERDICT r11
    # what's-wrong 4).  Warm at the smallest fixture so the column means
    # streaming compute, not worker cold-start.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for warm_name in (
            "ext_stream_stateful_user_counts",
            "ext_stream_session_counts",
        ):
            if warm_name in reg:
                try:
                    reg[warm_name].spark(spark, warm_dir).count()
                except Exception as e:  # noqa: BLE001 — warmup only
                    print(f"# warmup {warm_name}: {e}"[:200], flush=True)
        release_caches()
        time.sleep(2.0)
        progress_log.clear()
    rows = []
    for name in QUERIES:
        rec = {"query": name}
        for label, sf_dir in FIXTURES:
            if not os.path.isdir(sf_dir):
                continue
            release_caches()
            # the listener bus is async: progress events from the
            # PREVIOUS (label, entry)'s end-to-end run can land after
            # this clear and pollute the next compute run's rows_in /
            # state stats — drain the bus before clearing
            time.sleep(2.0)
            progress_log.clear()
            # compute-only wall FIRST: the checksum foreachBatch sink
            # reduces each batch executor-side, so this wall excludes
            # the memory-sink driver materialization that inflated the
            # r10 numbers (session-counts@100x collected 9.5M rows into
            # the sink inside the measured region — VERDICT r10 item 6).
            # State rows / batches / throughput come from THIS run; the
            # end-to-end wall (memory sink + post-processing included,
            # comparable to r10) rides along as sec_total.
            os.environ["SPARK_GRAFT_STREAM_CHECKSUM_SINK"] = "1"
            t0 = time.monotonic()
            try:
                reg[name].spark(spark, sf_dir).count()
            except Exception as e:
                rec[label] = {"status": f"FAIL: {type(e).__name__}"}
                print(f"# {name}@{label}: {e}"[:300], flush=True)
                continue
            finally:
                os.environ.pop("SPARK_GRAFT_STREAM_CHECKSUM_SINK", None)
            wall = time.monotonic() - t0
            # listener events arrive async; give the bus a beat, then
            # snapshot BEFORE the end-to-end run double-counts rows_in
            time.sleep(2.0)
            compute_progress = list(progress_log)
            release_caches()
            t1 = time.monotonic()
            try:
                df = reg[name].spark(spark, sf_dir)
                n_out = df.count()
                sec_total = round(time.monotonic() - t1, 2)
            except Exception as e:
                n_out, sec_total = None, None
                print(f"# {name}@{label} (total): {e}"[:300], flush=True)
            total_in = sum(
                p.get("numInputRows", 0) for p in compute_progress
            )
            max_rps = max(
                (
                    float(p.get("processedRowsPerSecond", 0) or 0)
                    for p in compute_progress
                ),
                default=0.0,
            )
            max_state = max(
                (
                    so.get("numRowsTotal", 0)
                    for p in compute_progress
                    for so in p.get("stateOperators", []) or []
                ),
                default=0,
            )
            n_batches = len(
                {
                    p.get("batchId")
                    for p in compute_progress
                    if "batchId" in p
                }
            )
            rec[label] = {
                "sec_compute": round(wall, 2),
                "sec_total": sec_total,
                "rows_out": n_out,
                "rows_in": total_in,
                "batches": n_batches,
                "max_rows_per_sec": round(max_rps, 1),
                "max_state_rows": max_state,
                "status": "ok",
            }
            print(f"{name}@{label}: {rec[label]}", flush=True)
        rows.append(rec)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
