"""Benchmark harness — runs the headline TPC-H suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Mirrors the reference's bench protocol (benchmarks/src/bin/tpch.rs:285-452:
per-query wall-time, JSON summary)."""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from arrow_ballista_spark.operators.caching import release_caches  # noqa: E402
from arrow_ballista_spark.queries import load_all  # noqa: E402
from arrow_ballista_spark.session import get_session  # noqa: E402

BENCH_QUERIES = [f"tpch_q{i}" for i in range(1, 23)] + [
    # headline extension operators (training-data pipeline)
    "ext_dedup_minhash_lsh",
    "ext_dedup_exact",
    "ext_dedup_clusters",
    "ext_sim_topk_bruteforce",
    "ext_text_quality_langid",
    "ext_asof_join",
    "ext_asof_join_bucketed",
    "ext_decontaminate",
    "ext_shard_pack",
    "ext_dedup_canonical",
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

    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in reg:
            continue
        # one untimed warmup iteration (whole-stage-codegen compilation of
        # large expression trees costs seconds on first execution and is
        # not steady-state throughput), then >=3 timed iterations with the
        # median reported — mirroring the reference harness's protocol
        # (benchmarks/src/bin/tpch.rs:285-452, --iterations 3)
        reg[name].spark(spark, sf_dir).collect()
        samples = []
        n = 0
        for _ in range(iters):
            t0 = time.monotonic()
            df = reg[name].spark(spark, sf_dir)
            n = len(df.collect())
            samples.append(time.monotonic() - t0)
        times[name] = round(statistics.median(samples), 3)
        release_caches()  # free operator-internal persist()s between queries
        print(
            f"# {name}: median={times[name]:.3f}s "
            f"min={min(samples):.3f}s max={max(samples):.3f}s rows={n}",
            file=sys.stderr,
        )

    # headline value stays TPC-H-only (comparable across rounds/baseline);
    # extension timings ride along in the queries dict
    total = round(
        sum(v for k, v in times.items() if k.startswith("tpch_")), 3
    )
    out = {
        "metric": "tpch_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "iterations": iters,
        "queries": times,
        "sf": sf,
    }
    prev = _load_prev_round(os.path.dirname(os.path.abspath(__file__)))
    if prev:
        prev_q = prev.get("queries", {})
        deltas = {
            k: round(v - prev_q[k], 3) for k, v in times.items()
            if k in prev_q
        }
        out["prev_round"] = prev["_round"]
        out["delta_vs_prev"] = deltas
        out["delta_total"] = round(
            total - sum(v for k, v in prev_q.items() if k.startswith("tpch_")),
            3,
        )
    print(json.dumps(out))


def _load_prev_round(repo_dir: str) -> dict | None:
    """Newest BENCH_r{N}.json's parsed payload (+ its round number), so each
    round's output carries per-query deltas vs the previous round — the
    regression signal the reference harness derives from --iterations runs."""
    best: tuple[int, dict] | None = None
    for path in glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                parsed = json.load(f).get("parsed")
        except (OSError, json.JSONDecodeError):
            continue
        if isinstance(parsed, dict) and (
            best is None or int(m.group(1)) > best[0]
        ):
            best = (int(m.group(1)), parsed)
    if best is None:
        return None
    best[1]["_round"] = best[0]
    return best[1]


if __name__ == "__main__":
    main()
