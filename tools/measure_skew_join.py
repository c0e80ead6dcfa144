"""Measure salted vs naive join on the Zipf skew fixture (VERDICT r5
item 8).  Build /tmp/skewzipf first with tools/make_skew_fixture.py.

Three plans over the same inner join events⋈users (users carries a 2 KB
pad and broadcast is disabled, so the join shuffles both sides):

- naive, AQE skew-split OFF — the straggler baseline: the hot key's
  whole reduce partition lands on one task;
- naive, AQE skew-split ON — the engine session default (first line of
  defense; splits oversized partitions at runtime);
- salted_join(16), AQE skew-split OFF — the static fallback for the
  case AQE can't fix.

Timing: min of warm interleaved samples (bench protocol — host has CPU
bursts); sink is a checksum aggregate so nothing materializes on the
driver.  Prints one JSON line for SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skewzipf"
SALT = int(sys.argv[2]) if len(sys.argv) > 2 else 16
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def main():
    from pyspark.sql import functions as F

    from arrow_ballista_spark.operators.skew import salted_join
    from arrow_ballista_spark.session import get_session

    spark = get_session(app_name="skew-measure", shuffle_partitions=32)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    events = spark.read.parquet(f"{SRC}/events.parquet")
    users = spark.read.parquet(f"{SRC}/users.parquet")

    def run(df):
        t0 = time.monotonic()
        cs = df.selectExpr(
            "sum(hash(user_id, value, segment)) AS cs",
            "count(*) AS n",
        ).collect()[0]
        return time.monotonic() - t0, (cs.cs, cs.n)

    def naive():
        return events.join(users, "user_id")

    def salted():
        return salted_join(events, users, "user_id", salt_buckets=SALT)

    plans = {
        "naive_aqe_skew_off": (naive, "false"),
        "naive_aqe_skew_on": (naive, "true"),
        f"salted_{SALT}_aqe_skew_off": (salted, "false"),
    }
    times: dict[str, list[float]] = {k: [] for k in plans}
    checks = {}
    for _ in range(ROUNDS + 1):  # first pass warms IO/codegen
        for name, (mk, skew_flag) in plans.items():
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled", skew_flag
            )
            dt, cs = run(mk())
            times[name].append(dt)
            checks[name] = cs
    assert len(set(checks.values())) == 1, f"result mismatch: {checks}"
    result = {
        "fixture": SRC,
        "salt_buckets": SALT,
        "stat": "min_of_warm_interleaved",
        "rows": checks[next(iter(checks))][1],
        "times": {k: round(min(v[1:]), 3) for k, v in times.items()},
        "all_samples": {k: [round(x, 3) for x in v] for k, v in times.items()},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
