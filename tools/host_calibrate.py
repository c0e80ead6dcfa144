"""Fixed pure-CPU calibration anchor for cross-round bench comparison —
VERDICT r9 item 1 follow-through.

The r9->r10 TPC-H drift investigation found a UNIFORM multiplicative
factor across every plan family (r10/r8 per-query ratio: 1.103 +/- 0.053
over the 22 TPC-H plans, 1.121 +/- 0.112 over 55 extension entries, with
byte-identical plan snapshots) — the signature of a host-level slowdown
(CPU steal / thermal / neighbor load), not a code regression.  No prior
round recorded an absolute CPU anchor, so the factor could only be
inferred from ratio uniformity.  This tool fixes that: it times two
plan-independent workloads whose cost is a physical constant of the
host —

- ``pyloop``: a single-threaded pure-Python arithmetic loop (sensitive
  to per-core clock + steal, the thing that scales every driver-side
  and interpreted cost), and
- ``blas32``: a fixed-size float64 matmul at the session's thread count
  (sensitive to aggregate throughput, the thing that scales executor
  CPU time).

Run it immediately before/after bench.py and record both numbers next
to the round's bench row in SCALING.md.  A future round's bench total
should be compared as ``total / (pyloop_now / pyloop_then)`` before
declaring a regression.

Usage: python tools/host_calibrate.py [reps]
Prints one JSON line {"pyloop_sec", "blas32_sec", "reps", ...}.
"""

from __future__ import annotations

import json
import sys
import time


def pyloop_once(n: int = 8_000_000) -> float:
    t0 = time.monotonic()
    acc = 0
    for i in range(n):
        # mask keeps acc a machine-word int — unbounded growth would
        # turn the loop into bignum arithmetic and blow up the timing
        acc = (acc + (i ^ (acc >> 3))) & 0xFFFFFFFFFFFF
    if acc == -1:  # keep the loop un-eliminable
        print(acc)
    return time.monotonic() - t0


def blas32_once(dim: int = 2048) -> float:
    import numpy as np

    a = np.ones((dim, dim)) * 0.5
    b = np.ones((dim, dim)) * 0.25
    t0 = time.monotonic()
    c = a @ b
    if float(c[0, 0]) < 0:
        print(c[0, 0])
    return time.monotonic() - t0


def spark_micro_once(spark, rows: int = 4_000_000) -> float:
    """Fixed aggregation over cached in-memory rows — the anchor in the
    SAME regime as the benched suite (multi-threaded JVM whole-stage
    codegen), which pyloop/blas32 are not: r11's pyloop swung 40% within
    one round while every real TPC-H wall moved <8% (VERDICT r11 item 1).
    The input is cached on first call (materialization excluded from the
    timing), so repeated calls time pure JVM aggregation throughput."""
    global _SPARK_MICRO_DF
    if _SPARK_MICRO_DF is None or _SPARK_MICRO_DF.sparkSession is not spark:
        df = spark.range(rows).selectExpr(
            "id % 9973 AS k", "CAST(id AS DOUBLE) * 1.0001 AS v"
        )
        df = df.cache()
        df.count()  # materialize outside the timed region
        _SPARK_MICRO_DF = df
    t0 = time.monotonic()
    r = (
        _SPARK_MICRO_DF.groupBy("k")
        .agg({"v": "sum"})
        .agg({"sum(v)": "sum"})
        .collect()
    )
    if float(r[0][0]) < 0:
        print(r)
    return time.monotonic() - t0


_SPARK_MICRO_DF = None


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    py = [pyloop_once() for _ in range(reps)]
    bl = [blas32_once() for _ in range(reps)]
    out = {
        "pyloop_sec": round(min(py), 4),
        "pyloop_spread": round(max(py) / min(py), 3),
        "blas32_sec": round(min(bl), 4),
        "blas32_spread": round(max(bl) / min(bl), 3),
        "reps": reps,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
