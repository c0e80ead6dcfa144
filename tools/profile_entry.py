"""Per-entry bench profiler — where does an entry's wall time go?

For each named registry entry (or bench ``__cs``/``__scaledk`` variant),
after one untimed warmup run, measures over N samples:

- ``build_s``   — Python time to construct the DataFrame (plan build:
  registry function body, including any driver-side planning actions it
  performs such as ``count()`` / literal generation);
- ``exec_s``    — time for the eager compute via the noop sink
  (``df.write.format('noop')`` — guide §1.4: computes every column of
  every row, no driver materialization);
- ``collect_s`` — time for ``len(df.collect())`` on a FRESH frame (the
  bench's timed action), so ``collect_s - exec_s`` ~ driver
  materialization cost;
- ``jobs``      — Spark jobs launched during the collect sample (a proxy
  for how many sequential actions/stages the entry schedules).

Usage: python tools/profile_entry.py entry1 entry2 ... [--samples N]
Writes one JSON line per entry to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arrow_ballista_spark.operators.caching import release_caches  # noqa: E402
from arrow_ballista_spark.queries import load_all  # noqa: E402
from arrow_ballista_spark.session import get_session  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    samples = 3
    for a in sys.argv[1:]:
        if a.startswith("--samples="):
            samples = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="profile-entry")
    reg = load_all()

    import bench as bench_mod

    from arrow_ballista_spark.catalog import register_tables

    register_tables(spark, sf_dir)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for name in args:
        frame = lambda: bench_mod._bench_frame(reg, name, spark, sf_dir)  # noqa: E731
        # warmup
        try:
            frame().collect()
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"entry": name, "error": str(e)[:200]}))
            continue
        release_caches()
        out = {"entry": name, "build_s": [], "exec_s": [], "collect_s": [],
               "jobs": []}
        for _ in range(samples):
            t0 = time.monotonic()
            df = frame()
            t1 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.monotonic()
            release_caches()
            jobs_before = len(tracker.getJobIdsForGroup(None) or [])
            t3 = time.monotonic()
            df2 = frame()
            n = len(df2.collect())
            t4 = time.monotonic()
            jobs_after = len(tracker.getJobIdsForGroup(None) or [])
            release_caches()
            out["build_s"].append(round(t1 - t0, 3))
            out["exec_s"].append(round(t2 - t1, 3))
            out["collect_s"].append(round(t4 - t3, 3))
            out["jobs"].append(jobs_after - jobs_before)
            out["rows"] = n
        for k in ("build_s", "exec_s", "collect_s"):
            out[k + "_min"] = min(out[k])
        print(json.dumps(out))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
