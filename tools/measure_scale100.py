"""100x-class scaling ladder for the five heaviest pipeline entries —
VERDICT r8 item 1: every prior ratio was measured at 10x; the 100 TB
claim for these entries extrapolated from plan shape.  This runs each
at sf0.1 -> 10x -> 100x with a checksum sink (no O(n) driver collect)
and records wall time, the 10x->100x ratio, and stage-aggregated
memory/disk spill from the UI REST API.

Build the fixtures first:
    python tools/make_scale_fixture.py 10  /root/testdata/sf0.1 /tmp/scale10x
    python tools/make_scale_fixture.py 100 /root/testdata/sf0.1 /tmp/scale100x

Interpretation bar: a 10x step costing ~<=10x wall is linear; the
tuning-guide partition discipline (reference tuning-guide.md:27-58)
is the comparison point.  Results land in SCALING.md.

Usage: python tools/measure_scale100.py [query ...]
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
    "ext_dedup_canonical_central",
    "ext_pipeline_corpus_build",
    "ext_dedup_semantic_whitened",
    # the adaptive-k scale path next to the k=8 oracle pin: the r9
    # sweep measured 22.1x vs 2.6x at the 100x step — keep both in
    # future ladders so the contrast stays visible
    "ext_dedup_semantic_whitened__scaledk",
    "ext_sim_topk_pq_trained",
    "ext_graph_pagerank",
]
FIXTURES = [
    ("sf0.1", "/root/testdata/sf0.1", 2),
    ("10x", "/tmp/scale10x", 2),
    ("100x", "/tmp/scale100x", 1),  # one timed run: minutes-scale
]


def _spill_bytes(spark) -> tuple[int, int]:
    """Stage-aggregated (memoryBytesSpilled, diskBytesSpilled) via the
    UI REST API ((0, 0) if the UI is off) — measure_memory_pressure.py's
    collector."""
    try:
        from urllib.request import urlopen

        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urlopen(
            f"{ui}/api/v1/applications/{app}/stages", timeout=10
        ) as r:
            stages = json.load(r)
        return (
            sum(s.get("memoryBytesSpilled", 0) for s in stages),
            sum(s.get("diskBytesSpilled", 0) for s in stages),
        )
    except Exception:
        return (0, 0)


def main():
    from pyspark.sql import SparkSession

    from arrow_ballista_spark.catalog import _configure_reader
    from arrow_ballista_spark.operators.caching import release_caches
    from arrow_ballista_spark.queries import load_all

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale100")
        # the engine session's heap (session.py:70) — the bare local
        # default of 1g killed the JVM mid-100x on the first attempt
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEM", "90g"),
        )
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    _configure_reader(spark)
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    rows = []
    for name in QUERIES:
        rec = {"query": name}
        for label, sf_dir, timed_runs in FIXTURES:
            samples = []
            spill = (0.0, 0.0)
            status = "ok"
            for k in range(timed_runs + (1 if label != "100x" else 0)):
                release_caches()
                m0, d0 = _spill_bytes(spark)
                t0 = time.monotonic()
                try:
                    if name in reg:
                        df = reg[name].spark(spark, sf_dir)
                    else:  # bench-only scale variants (__scaledk etc.)
                        from bench import EXTRA_VARIANTS

                        df = EXTRA_VARIANTS[name](spark, sf_dir)
                    df.selectExpr(
                        "count(*) AS n", "sum(hash(*)) AS cs"
                    ).collect()
                except Exception as e:  # record and move on
                    status = f"FAIL: {type(e).__name__}"
                    print(f"# {name}@{label}: {e}"[:300], flush=True)
                    break
                samples.append(time.monotonic() - t0)
                m1, d1 = _spill_bytes(spark)
                spill = (
                    round((m1 - m0) / 1e6, 1), round((d1 - d0) / 1e6, 1)
                )
            # min of the post-warm samples (100x runs once, unwarmed:
            # minutes-scale wall dwarfs codegen warmup)
            best = min(samples[1:] if len(samples) > 1 else samples,
                       default=None)
            rec[label] = {
                "sec": round(best, 2) if best is not None else None,
                "status": status,
                "spill_mem_mb": spill[0],
                "spill_disk_mb": spill[1],
            }
            print(f"{name}@{label}: {rec[label]}", flush=True)
        s01 = rec["sf0.1"]["sec"]
        s10 = rec["10x"]["sec"]
        s100 = rec["100x"]["sec"]
        rec["ratio_10x"] = round(s10 / s01, 2) if s01 and s10 else None
        rec["ratio_100x_over_10x"] = (
            round(s100 / s10, 2) if s10 and s100 else None
        )
        rows.append(rec)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
