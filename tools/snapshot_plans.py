"""Snapshot formatted physical-plan SKELETONS of registry queries into
plans_snapshot/ — committed so later rounds can `git diff` a plan instead
of guessing whether a per-query wall-time delta is noise or a regression
(the q19/q2/q16 watch-item protocol, VERDICT r4 item 9 / r5 item 6).

Only the operator tree (node names + join types/build sides) is kept:
expression IDs and stats churn run-to-run and would make every diff
noisy.  Usage:

    python tools/snapshot_plans.py [query ...]   # default: all TPC-H
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

OUT_DIR = os.path.join(ROOT, "plans_snapshot")

#: The bench top-10 by per-entry min cost (BENCH_DETAIL_r10
#: queries_min, `__cs` checksum twins folded into their base entry —
#: the twin's plan is the base plan plus one final HashAggregate).
#: The drift protocol's byte-identical-plans leg must cover what the
#: bench actually spends its time on, not just TPC-H (VERDICT r10
#: item 2), so these are part of the DEFAULT snapshot set.
BENCH_TOP = [
    "ext_dedup_canonical_central",
    "ext_pipeline_corpus_build",
    "ext_dedup_semantic_whitened_adaptive",
    "ext_dedup_semantic_whitened",
    "ext_graph_pagerank",
    "ext_dedup_canonical",
    "h2o_groupby_manykey",
    "ext_sim_topk_pq_trained",
    "ext_graph_triangles",
    "ext_sim_topk_ivfpq",
    "ext_dedup_clusters",
    "ext_zorder_key",
]


def skeleton(plan: str) -> str:
    """Operator tree head with volatile tokens stripped."""
    head = plan.split("\n\n")[0]
    head = re.sub(r"#\d+L?", "", head)  # expression ids
    head = re.sub(r"\(\d+\)", "", head)  # node numbering
    return "\n".join(line.rstrip() for line in head.splitlines())


def main():
    from arrow_ballista_spark.queries import load_all
    from arrow_ballista_spark.session import get_session

    spark = get_session(app_name="plan-snapshot", shuffle_partitions=32)
    reg = load_all()
    names = sys.argv[1:] or (
        sorted(n for n in reg if re.fullmatch(r"tpch_q\d+", n)) + BENCH_TOP
    )
    os.makedirs(OUT_DIR, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for n in names:
        df = reg[n].spark(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join(OUT_DIR, f"{n}.txt"), "w") as f:
            f.write(skeleton(plan) + "\n")
        print("wrote", n)


if __name__ == "__main__":
    main()
