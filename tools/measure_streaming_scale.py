"""Scale measurement for the Structured-Streaming entries — r10: every
other operator family has 10x/100x ladder evidence; the streaming
queries' bounded-state claims were asserted from plan shape only.

Runs each ext_stream_* registry entry at sf0.1 -> 10x (-> 100x where
the fixture exists), with a session-wide StreamingQueryListener
capturing per-batch progress.  Reports, per (entry, scale):

- wall seconds for the whole availableNow run (registry entry
  end-to-end, memory-sink collect included);
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
    rows = []
    for name in QUERIES:
        rec = {"query": name}
        for label, sf_dir in FIXTURES:
            if not os.path.isdir(sf_dir):
                continue
            release_caches()
            progress_log.clear()
            t0 = time.monotonic()
            try:
                df = reg[name].spark(spark, sf_dir)
                n_out = df.count()
            except Exception as e:
                rec[label] = {"status": f"FAIL: {type(e).__name__}"}
                print(f"# {name}@{label}: {e}"[:300], flush=True)
                continue
            wall = time.monotonic() - t0
            # listener events arrive async; give the bus a beat
            time.sleep(2.0)
            total_in = sum(p.get("numInputRows", 0) for p in progress_log)
            max_rps = max(
                (
                    float(p.get("processedRowsPerSecond", 0) or 0)
                    for p in progress_log
                ),
                default=0.0,
            )
            max_state = max(
                (
                    so.get("numRowsTotal", 0)
                    for p in progress_log
                    for so in p.get("stateOperators", []) or []
                ),
                default=0,
            )
            n_batches = len(
                {p.get("batchId") for p in progress_log if "batchId" in p}
            )
            rec[label] = {
                "sec": round(wall, 2),
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
