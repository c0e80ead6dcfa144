"""Dump .explain('formatted') for named entries to plans/r13/<name>_<tag>.txt.

Usage: python tools/dump_plans_r13.py before|after entry1 entry2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arrow_ballista_spark.operators.caching import release_caches  # noqa: E402
from arrow_ballista_spark.queries import load_all  # noqa: E402
from arrow_ballista_spark.session import get_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name="dump-plans-r13")
    reg = load_all()
    import bench as bench_mod

    for name in names:
        try:
            df = bench_mod._bench_frame(reg, name, spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR: {type(e).__name__}: {e}\n"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        release_caches()
        print(name, "done", flush=True)


if __name__ == "__main__":
    main()
