"""bench.py protocol invariants that don't need a Spark session: the
stdout summary line must survive the driver's 2000-char tail capture at
any registry size, and the checksum-sink variants must wrap only the
intended O(n)-result queries."""

from __future__ import annotations

import json

import bench


def _render(n_queries: int) -> str:
    times = {f"ext_query_name_{i:03d}": 1.234 for i in range(n_queries)}
    times.update({f"tpch_q{i}": 0.321 for i in range(1, 23)})
    out = {
        "metric": "tpch_suite_wall_seconds",
        "value": 7.062,
        "unit": "sec",
        "stat": "min_of_warm_interleaved_samples",
        "queries": dict(times),
        "sf": 0.1,
        "delta_total": -1.234,
        "prev_round": 4,
        "detail_file": "BENCH_DETAIL_r5.json",
    }
    return bench.summary_line(out, times)


def test_summary_line_capped_at_full_registry():
    """The staged fallbacks must keep the final line under the driver's
    2000-char capture even with every registry entry benched (the r3
    `parsed: null` failure mode), and the line must stay valid JSON with
    the headline fields intact."""
    for n in (0, 10, 50, 168, 400):
        line = _render(n)
        assert len(line) < 2000, (n, len(line))
        parsed = json.loads(line)
        assert parsed["metric"] == "tpch_suite_wall_seconds"
        assert parsed["value"] == 7.062
        # TPC-H core always survives truncation
        assert "tpch_q1" in parsed["queries"]
    # small payloads keep full detail
    assert "ext_query_name_000" in json.loads(_render(10))["queries"]
    # huge payloads degrade to the TPC-H core, flagged
    big = json.loads(_render(400))
    assert big.get("queries_truncated_to_tpch") is True


def test_checksum_variants_subset_of_bench_queries():
    """Every checksum-sink variant must shadow a real bench query so the
    paired plain/__cs samples land in the same sweep."""
    for name in bench.CHECKSUM_VARIANTS:
        assert name in bench.BENCH_QUERIES, name


def test_host_ratio_median_clamp_and_disagree():
    """The cross-round normalization anchor (VERDICT r11 item 1):
    median of per-anchor ratios clamped to [0.8, 1.25]; >25% spread
    among the anchors pins the ratio to 1.0 and sets the disagree flag
    (flag, don't rescale)."""
    now = {"pyloop_sec": 1.0, "blas32_sec": 0.1, "spark_micro_sec": 0.35}

    # agreeing anchors: median of {1.0, 1.1, 1.0588...} is inside the
    # clamp band
    prev = {"pyloop_sec": 1.0, "blas32_sec": 0.0909, "spark_micro_sec": 0.33}
    ratios, ratio, disagree = bench._host_ratio(now, prev)
    assert set(ratios) == {"pyloop_sec", "blas32_sec", "spark_micro_sec"}
    assert not disagree
    assert abs(ratio - sorted(ratios.values())[1]) < 1e-9

    # uniform big slowdown clamps at 1.25 instead of over-correcting
    prev_fast = {k: v / 2 for k, v in now.items()}
    _, ratio, disagree = bench._host_ratio(now, prev_fast)
    assert not disagree and ratio == 1.25

    # disagreeing regimes (the r11 pathology): pinned to 1.0 + flagged
    prev_mixed = {"pyloop_sec": 0.7, "blas32_sec": 0.1, "spark_micro_sec": 0.35}
    _, ratio, disagree = bench._host_ratio(now, prev_mixed)
    assert disagree and ratio == 1.0

    # missing anchors on either side: only the intersection is used
    ratios, _, _ = bench._host_ratio(now, {"pyloop_sec": 1.0})
    assert set(ratios) == {"pyloop_sec"}
    assert bench._host_ratio(None, prev) == ({}, 1.0, False)
