"""Run the heavy 10x-scale entries under a CONSTRAINED heap and record
which spill vs which fail — VERDICT r6 item 6: every scale run so far
fit the 128 GiB sandbox, so the spill-safety claim was untested.

Launches a fresh session with ``spark.driver.memory=4g`` (local mode:
the driver heap IS the executor heap) and default spill settings, runs
each entry at the 10x fixture with a checksum sink, and reports wall
time, completion status, and the stage-aggregated memory/disk spill
bytes from the UI REST API.

Build /tmp/scale10x first (tools/make_scale_fixture.py 10
/root/testdata/sf0.1 /tmp/scale10x).  MUST run as a fresh process (the
heap size is fixed at JVM launch).

Usage: python tools/measure_memory_pressure.py [query ...]
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
    "tpch_q18",
    "tpch_q21",
    "ext_dedup_ppjoin",
    "ext_graph_triangles",
    "ext_dedup_canonical_central",
    "ext_pipeline_corpus_build",
    "ext_dedup_semantic_whitened",
    "ext_multimodal_png_stats",
    "ext_multimodal_jpeg_stats",
    "ext_sim_topk_pq_trained",
    "ext_graph_pagerank",
]
SF10 = "/tmp/scale10x"
HEAP = os.environ.get("PRESSURE_HEAP", "4g")


def _spill_bytes(spark) -> tuple[int, int]:
    """(memoryBytesSpilled, diskBytesSpilled) summed over all stages via
    the UI REST API; (0, 0) if the UI is unreachable."""
    try:
        from urllib.request import urlopen

        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urlopen(f"{ui}/api/v1/applications/{app}/stages", timeout=10) as r:
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
        .appName("mem-pressure")
        .config("spark.driver.memory", HEAP)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    _configure_reader(spark)
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    results = []
    for name in QUERIES:
        release_caches()
        m0, d0 = _spill_bytes(spark)
        t0 = time.monotonic()
        try:
            df = reg[name].spark(spark, SF10)
            df.selectExpr("count(*) AS n", "sum(hash(*)) AS cs").collect()
            status = "ok"
        except Exception as e:
            cause = next(
                (
                    ln.strip()[:160]
                    for ln in str(e).splitlines()
                    if any(
                        m in ln
                        for m in (
                            "OutOfMemory", "Caused by", "Total size",
                            "larger than", "Not enough memory",
                        )
                    )
                ),
                str(e).splitlines()[0][:160] if str(e) else "",
            )
            status = f"FAIL: {type(e).__name__}: {cause}"
        dt = round(time.monotonic() - t0, 1)
        m1, d1 = _spill_bytes(spark)
        results.append(
            {
                "query": name, "status": status, "sec": dt,
                "spill_mem_mb": round((m1 - m0) / 1e6, 1),
                "spill_disk_mb": round((d1 - d0) / 1e6, 1),
            }
        )
        print(results[-1], flush=True)

    print(f"\nheap={HEAP}  | query | status | sec | mem-spill MB |"
          " disk-spill MB |")
    print("| --- | --- | --- | --- | --- |")
    for r in results:
        print(
            f"| {r['query']} | {r['status']} | {r['sec']} |"
            f" {r['spill_mem_mb']} | {r['spill_disk_mb']} |"
        )
    print(json.dumps({"heap": HEAP, "rows": results}))


if __name__ == "__main__":
    main()
