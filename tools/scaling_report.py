"""Scaling report: per-query ratios between two bench runs at different
scale factors.

Usage: python tools/scaling_report.py SMALL_DETAIL.json BIG_DETAIL.json [X]

SMALL/BIG are `BENCH_DETAIL_*.json` files produced by bench.py; X is the
data-size multiple between them (default 10).  Emits a markdown table of
per-query min times and the time ratio, flagging queries whose ratio
exceeds 1.5x the data multiple (superlinear — a scale smell) — the
"no query >15x at 10x data" gate from the round-4 plan.
"""
from __future__ import annotations

import json
import sys


def main() -> None:
    small_path, big_path = sys.argv[1], sys.argv[2]
    mult = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    small = json.load(open(small_path))
    big = json.load(open(big_path))
    s_q, b_q = small["queries_min"], big["queries_min"]
    common = [k for k in s_q if k in b_q]
    print(f"| query | {small['sf']}x min (s) | {big['sf']}x min (s) "
          "| ratio | verdict |")
    print("| --- | --- | --- | --- | --- |")
    flagged = []
    for k in common:
        s, b = s_q[k], b_q[k]
        # sub-100ms baselines are fixed-overhead dominated; ratios on
        # them measure Spark job latency, not scaling — compare against
        # a 100ms floor so a 0.05s -> 0.4s move doesn't read as "8x"
        ratio = b / max(s, 0.1)
        bad = ratio > 1.5 * mult
        if bad:
            flagged.append(k)
        verdict = "SUPERLINEAR" if bad else (
            "sublinear" if ratio < mult else "~linear"
        )
        print(f"| {k} | {s:.3f} | {b:.3f} | {ratio:.1f}x | {verdict} |")
    s_tot = sum(v for k, v in s_q.items() if k.startswith("tpch_"))
    b_tot = sum(v for k, v in b_q.items() if k.startswith("tpch_"))
    print(f"\nTPC-H suite: {s_tot:.2f}s -> {b_tot:.2f}s "
          f"({b_tot / max(s_tot, 1e-9):.1f}x at {mult:.0f}x data)")
    if flagged:
        print(f"\nFLAGGED superlinear (> {1.5 * mult:.0f}x): {flagged}")
        sys.exit(1)
    print(f"\nAll {len(common)} queries within {1.5 * mult:.0f}x at "
          f"{mult:.0f}x data.")


if __name__ == "__main__":
    main()
