"""State-boundedness measurement for the watermark-closed session
operator (VERDICT r11 item 6 done-bar).

A one-shot availableNow replay of a single parquet file cannot show
eviction: all data arrives in batch 0, every session is open during
that batch, and state peaks at the full session keyspace before the
no-data flush batch emits everything — the listener's max_state_rows
reads identical for complete and append modes.  On a real continuous
stream the watermark advances as event time does, and append mode
evicts each session's state when the 2h watermark passes its end.

This tool reconstructs that regime on bounded fixtures: it writes a
TIME-ORDERED multi-file copy of events (repartitionByRange on ts +
sortWithinPartitions, so lexicographic part-file order is event-time
order — the file stream source takes files in path order under
maxFilesPerTrigger), then runs session_counts in BOTH output modes
over the chunked stream with one file per micro-batch.  The watermark
then advances batch-by-batch and the append run's max state is the
sessions inside the ~2h watermark horizon, not the keyspace.

Reports per (fixture, mode): max/final state rows, batches, walls,
and emitted-row agreement between the two modes' final session sets
(append emits only watermark-closed sessions; complete emits all —
the difference must equal the sessions still open at end-of-input).

Usage: python tools/measure_closed_sessions_state.py [n_files]
Prints one JSON line per fixture plus a final JSON array.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

FIXTURES = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("10x", "/tmp/scale10x"),
]
if os.environ.get("SPARK_GRAFT_STATE_FIXTURES"):
    keep = set(os.environ["SPARK_GRAFT_STATE_FIXTURES"].split(","))
    FIXTURES = [f for f in FIXTURES if f[0] in keep]
N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 24


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StreamingQueryListener

    from arrow_ballista_spark.catalog import _configure_reader, load_table
    from arrow_ballista_spark.streaming import pipeline as st

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("closed-sessions-state")
        .config("spark.sql.shuffle.partitions", str(cpus))
        # complete-mode at 10x re-emits ~1M sessions per micro-batch
        # into the memory sink across 24 batches; the default 1g
        # driver heap dies with RPC NPEs mid-run
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEM", "48g"),
        )
        .getOrCreate()
    )
    _configure_reader(spark)
    spark.sparkContext.setLogLevel("ERROR")

    progress: list[dict] = []

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            try:
                progress.append(json.loads(event.progress.json))
            except Exception:
                pass

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(Capture())
    rows = []
    for label, sf_dir in FIXTURES:
        if not os.path.isdir(sf_dir):
            continue
        # time-ordered multi-file copy.  The file stream source picks
        # pending files by MODIFICATION TIME, not path — a one-shot
        # repartitionByRange write stamps every part file with the same
        # mtime and the resulting arbitrary order makes later windows
        # advance the watermark past earlier ones, dropping their
        # events as late (first attempt measured 12k of 95k sessions).
        # Write the N time-range chunks SEQUENTIALLY, one coalesced
        # file per append, sleeping past mtime resolution between
        # appends, so source order == event-time order.
        chunked = f"/tmp/events_chunked_{label}"
        shutil.rmtree(chunked, ignore_errors=True)
        ev = load_table(spark, sf_dir, "events").withColumn(
            "_t", F.expr("unix_micros(cast(ts AS timestamp_ltz))")
        )
        n_events = ev.count()
        bounds = ev.approxQuantile(
            "_t", [i / N_FILES for i in range(1, N_FILES)], 0.0001
        )
        lo = None
        for i in range(N_FILES):
            hi = bounds[i] if i < len(bounds) else None
            chunk = ev
            if lo is not None:
                chunk = chunk.filter(F.col("_t") > lo)
            if hi is not None:
                chunk = chunk.filter(F.col("_t") <= hi)
            chunk.drop("_t").coalesce(1).write.mode("append").parquet(
                chunked
            )
            lo = hi
            time.sleep(0.05)
        schema = spark.read.parquet(chunked).schema

        def chunk_stream():
            df = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(chunked)
            )
            if dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn(
                    "ts",
                    F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"),
                )
            else:
                df = df.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
            return df

        rec = {"fixture": label, "n_events": n_events, "n_files": N_FILES}
        for mode in ("complete", "append"):
            time.sleep(2.0)
            progress.clear()
            t0 = time.monotonic()
            out = st.run_available_now(
                st.session_counts(chunk_stream()), mode
            )
            n_out = out.count()
            wall = round(time.monotonic() - t0, 2)
            time.sleep(2.0)
            snap = list(progress)
            states = [
                so.get("numRowsTotal", 0)
                for p in snap
                for so in p.get("stateOperators", []) or []
            ]
            rec[mode] = {
                "sec": wall,
                "rows_out": n_out,
                "batches": len(
                    {p.get("batchId") for p in snap if "batchId" in p}
                ),
                "max_state_rows": max(states, default=0),
                "final_state_rows": states[-1] if states else 0,
            }
        c, a = rec["complete"], rec["append"]
        rec["state_ratio_append_vs_complete"] = (
            round(a["max_state_rows"] / c["max_state_rows"], 4)
            if c["max_state_rows"]
            else None
        )
        # append must emit exactly the watermark-closed subset
        rec["open_sessions_at_eof"] = c["rows_out"] - a["rows_out"]
        print(json.dumps(rec), flush=True)
        rows.append(rec)
        shutil.rmtree(chunked, ignore_errors=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
