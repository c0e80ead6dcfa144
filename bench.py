"""Benchmark harness — runs the headline TPC-H suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Mirrors the reference's bench protocol (benchmarks/src/bin/tpch.rs:285-452:
per-query wall-time, JSON summary)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from arrow_ballista_spark.queries import load_all  # noqa: E402
from arrow_ballista_spark.session import get_session  # noqa: E402

BENCH_QUERIES = [f"tpch_q{i}" for i in range(1, 23)] + [
    # headline extension operators (training-data pipeline)
    "ext_dedup_minhash_lsh",
    "ext_dedup_exact",
    "ext_sim_topk_bruteforce",
    "ext_text_quality_langid",
    "ext_asof_join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_session(app_name="arrow-ballista-spark-bench")
    reg = load_all()

    # Warm up the JVM + parquet footer caches outside the timed region.
    from arrow_ballista_spark.catalog import register_tables

    register_tables(spark, sf_dir)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in reg:
            continue
        # one untimed warmup iteration (whole-stage-codegen compilation of
        # large expression trees costs seconds on first execution and is
        # not steady-state throughput), then the timed run — mirroring the
        # reference harness's multi-iteration protocol
        # (benchmarks/src/bin/tpch.rs --iterations)
        reg[name].spark(spark, sf_dir).collect()
        t0 = time.monotonic()
        df = reg[name].spark(spark, sf_dir)
        n = len(df.collect())
        times[name] = round(time.monotonic() - t0, 3)
        print(f"# {name}: {times[name]:.3f}s rows={n}", file=sys.stderr)

    # headline value stays TPC-H-only (comparable across rounds/baseline);
    # extension timings ride along in the queries dict
    total = round(
        sum(v for k, v in times.items() if k.startswith("tpch_")), 3
    )
    print(
        json.dumps(
            {
                "metric": "tpch_suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
