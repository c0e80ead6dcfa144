"""Benchmark harness — runs the headline TPC-H suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Mirrors the reference's bench protocol (benchmarks/src/bin/tpch.rs:285-452:
per-query wall-time, JSON summary, --iterations N), with two local-mode
hardening changes measured in round 3:

- **Interleaved sweeps with paired (warm) samples.**  Timing the same
  query 3× in a row puts all of its samples inside the same ~2s window, so
  one transient host-noise burst (CPU steal on shared hosts, a neighboring
  JVM's GC) poisons every sample and the median records it as a fake
  regression — exactly what BENCH_r02 showed (q7/q16/q17/q21/q22 "2-6×
  slower" on byte-identical SQL; all recovered on re-run).  One full sweep
  of all queries takes ~1 min, so per-query samples land minutes apart and
  at most one of them sits inside any given burst; the reported MIN is
  then burst-free.  Within a sweep each query runs TWICE back-to-back and
  only the second execution is timed: after ~30 other queries the first
  execution re-warms the code/data caches, the second measures
  steady-state — otherwise sub-second queries carry a +0.1-0.2s
  cold-cache tax the old back-to-back protocol didn't.
- **Per-iteration times + session uptime in a side file.**  JVM/JIT warmup
  is measurable for the heavyweight iterative entries (ext_dedup_clusters:
  33s cold → 3.2s steady over 4 executions); emitting the raw samples and
  when they ran makes warmup/accumulation effects visible instead of
  laundered through a single median.  Round 3 lesson: the driver captures
  only the LAST 2000 chars of stdout, so the raw samples made the final
  JSON line unparseable (BENCH_r03 `parsed: null`).  The final stdout line
  is now a compact summary (mins + totals, hard-capped under the capture
  window); the per-iteration arrays, medians, and per-query deltas go to
  `BENCH_DETAIL_r{N}.json` in the repo, committed alongside.
"""

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
    "ext_dedup_substring",
    "ext_dedup_editdist",
    "ext_sample_dsir",
    "ext_quality_lm_perplexity",
    "ext_zorder_key",
    "ext_dedup_clusters",
    "ext_sim_topk_bruteforce",
    "ext_text_quality_langid",
    "ext_asof_join",
    "ext_asof_join_bucketed",
    "ext_decontaminate",
    "ext_shard_pack",
    "ext_dedup_canonical",
    "ext_embed_kmeans",
    "ext_sim_topk_ivf",
    "ext_text_bm25",
    "ext_quality_repetition",
    "ext_merge_upsert",
    "ext_snapshot_diff",
    "ext_dedup_semantic",
    "ext_dedup_bloom",
    "ext_sample_temperature",
    "ext_quality_ccnet_buckets",
    "ext_text_winnowing",
    "ext_dedup_winnowing",
    "ext_select_budget",
    "ext_sketch_count_min",
    "ext_sketch_hll_by_lang",
    "ext_pipeline_corpus_build",
    "ext_graph_pagerank",
    "ext_dedup_canonical_central",
    "ext_mix_rebalance",
    # round-6 additions
    "ext_dedup_ppjoin",
    "ext_graph_triangles",
    "ext_embed_pq",
    "ext_sim_topk_pq_adc",
    "ext_sim_topk_ivfpq",
    "ext_multimodal_png_stats",
    "ext_dedup_semantic_whitened",
    # round-7 additions
    "ext_sim_topk_pq_trained",
    "ext_multimodal_jpeg_stats",
    # round-10: the adaptive-k (k=None default) whitened SemDeDup — the
    # scale-safe configuration is now the TRACKED row; the fixed-k=8
    # sibling stays benched as the pinned-k witness
    "ext_dedup_semantic_whitened_adaptive",
    # h2o db-benchmark + nyctaxi shapes (the reference's other harnesses:
    # benchmarks/db-benchmark/join-datafusion.py, src/bin/nyctaxi.rs)
    "h2o_groupby_highcard",
    "h2o_groupby_manykey",
    "h2o_join_medium_inner",
    "h2o_join_big",
    "nyctaxi_fare_by_passenger",
]

#: Queries whose result is O(n) rows: their plain bench time is dominated
#: by driver-side materialization (Arrow transfer + len(collect())), not
#: by the distributed core.  Each gets an extra ``<name>__cs`` sample
#: that reduces the same plan to one (count, bit_xor(xxhash64)) row
#: before collect — the db-benchmark convention (the reference's
#: ``benchmarks/db-benchmark/groupby-datafusion.py`` reduces result
#: frames to checksums) — so scaling ratios separate "join core got
#: slower" from "result set got bigger".
CHECKSUM_VARIANTS = [
    "ext_merge_upsert",
    "h2o_groupby_manykey",
    "ext_zorder_key",
    "ext_dedup_bloom",
    "ext_quality_ccnet_buckets",
    "ext_text_winnowing",
    # round-6 O(n)-row results
    "ext_embed_pq",
    "ext_multimodal_png_stats",
    "ext_dedup_semantic_whitened",
    "ext_dedup_semantic_whitened_adaptive",
    # round-7 O(n)-row results
    "ext_multimodal_jpeg_stats",
]


def _semantic_scaledk(spark, sf_dir):
    """SemDeDup with the documented k ~ sqrt(n) policy + the vectorized
    scale kernels — the configuration a 100 TB run would use, vs the
    oracle entry's pinned k=8 (deterministic but quadratic-per-cluster
    as data grows: 10x data at fixed k is 100x pairs per cluster).
    Benched so SCALING.md's ratio reflects the policy, not the pin."""
    import math

    from pyspark.sql import functions as F

    from arrow_ballista_spark.catalog import load_table
    from arrow_ballista_spark.operators.kmeans import semantic_dedup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    k = max(8, int(math.sqrt(emb.count())))
    out = semantic_dedup_pairs(emb, k=k, iters=2, tau=0.35, vectorized=True)
    # checksum sink: the pair count shrinks as k grows (tighter clusters),
    # so reduce to one row and keep the timing about the compute
    return out.select(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("bit_xor(xxhash64(id_a, id_b))").alias("checksum"),
    )


def _whitened_scaledk(spark, sf_dir):
    """The whitened SemDeDup composition under the same k ~ sqrt(n)
    policy (+ vectorized kernels) as _semantic_scaledk — the oracle
    entry pins k=8 for value-exactness, which is quadratic-per-cluster
    as data grows; this is the configuration the 100x ladder grades."""
    import math

    from pyspark.sql import functions as F

    from arrow_ballista_spark.operators.kmeans import semantic_dedup_pairs
    from arrow_ballista_spark.queries.extensions import (
        _whitened_embeddings,
        _WHITEN_TAU,
    )

    white = _whitened_embeddings(spark, sf_dir)
    k = max(8, int(math.sqrt(white.count())))
    out = semantic_dedup_pairs(
        white, k=k, iters=2, tau=_WHITEN_TAU, vectorized=True
    )
    return out.select(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("bit_xor(xxhash64(id_a, id_b))").alias("checksum"),
    )


#: Bench-only variants that aren't registry entries (no oracle — they
#: re-run a registry operator under its documented scale configuration).
EXTRA_VARIANTS = {
    "ext_dedup_semantic__scaledk": _semantic_scaledk,
    "ext_dedup_semantic_whitened__scaledk": _whitened_scaledk,
}


def _bench_frame(reg, name, spark, sf_dir):
    """Build the DataFrame a bench sample times; ``__cs`` variants wrap
    the base query in the checksum sink."""
    if name in EXTRA_VARIANTS:
        return EXTRA_VARIANTS[name](spark, sf_dir)
    if name.endswith("__cs"):
        from pyspark.sql import functions as F

        base = reg[name[: -len("__cs")]].spark(spark, sf_dir)
        return base.select(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "bit_xor(xxhash64(struct(*)))"
            ).alias("checksum"),  # order-insensitive, no sum overflow
        )
    return reg[name].spark(spark, sf_dir)


def summary_line(out: dict, times: dict) -> str:
    """The ONE stdout JSON line, hard-capped under the driver's 2000-char
    tail capture with staged fallbacks (drop deltas, truncate the queries
    dict to the TPC-H core, compact the family roll-up, then shrink the
    ext_top dict — so the per-entry ext timings the r12 PERF was blind to
    survive every stage but the last)."""
    line = json.dumps(out)
    if len(line) > 1900:
        out.pop("delta_total", None)
        out.pop("prev_round", None)
        line = json.dumps(out)
    if len(line) > 1900:  # still over: keep the comparable TPC-H core
        out["queries"] = {
            k: v for k, v in times.items() if k.startswith("tpch_")
        }
        out["queries_truncated_to_tpch"] = True
        line = json.dumps(out)
    if len(line) > 1900 and "families" in out:  # compact the roll-up
        out["families"] = {
            k: v["min_total"] for k, v in out["families"].items()
        }
        line = json.dumps(out)
    while len(line) > 1900 and len(out.get("ext_top", ())) > 3:
        out["ext_top"] = dict(list(out["ext_top"].items())[:-1])
        line = json.dumps(out)
    if len(line) > 1900:
        out.pop("ext_top", None)
        line = json.dumps(out)
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_session(app_name="arrow-ballista-spark-bench")
    reg = load_all()
    t_session = time.monotonic()

    # Warm up the JVM + parquet footer caches outside the timed region.
    from arrow_ballista_spark.catalog import register_tables

    register_tables(spark, sf_dir)
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()

    names = [n for n in BENCH_QUERIES if n in reg]
    for cs in CHECKSUM_VARIANTS:
        if cs in reg:
            names.insert(names.index(cs) + 1 if cs in names else len(names),
                         cs + "__cs")
    for extra in EXTRA_VARIANTS:
        base = extra.split("__")[0]
        names.insert(
            names.index(base) + 1 if base in names else len(names), extra
        )
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if only:  # comma-separated subset, e.g. the 100x headline runs
        keep = {s.strip() for s in only.split(",")}
        names = [n for n in names if n in keep or n.split("__")[0] in keep]
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
    warmups = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUPS", "1"))

    # Untimed warmup sweep(s): whole-stage-codegen compilation + JIT of the
    # generated code costs seconds on the first executions of each plan
    # shape and is not steady-state throughput.  (The pairing below
    # re-warms per sweep, so one initial sweep suffices.)
    for w in range(warmups):
        for name in names:
            try:
                _bench_frame(reg, name, spark, sf_dir).collect()
            except Exception:  # the timed loop records the failure
                pass
            release_caches()

    samples: dict[str, list[float]] = {n: [] for n in names}
    at: dict[str, list[float]] = {n: [] for n in names}
    failed: dict[str, str] = {}
    for _ in range(iters):
        for name in names:
            if name in failed:
                continue
            # pair: first execution re-warms caches after the ~30 other
            # queries of this sweep; the second is the timed sample.
            # A single failing query (e.g. an O(n)-result collect
            # busting spark.driver.maxResultSize at a big SF) must not
            # abort the whole run — record it and keep sweeping.
            try:
                _bench_frame(reg, name, spark, sf_dir).collect()
                release_caches()
                t0 = time.monotonic()
                df = _bench_frame(reg, name, spark, sf_dir)
                n_rows = len(df.collect())
                del n_rows
            except Exception as e:  # noqa: BLE001 — record + continue
                failed[name] = f"{type(e).__name__}: {e}"[:300]
                release_caches()
                print(f"# FAILED {name}: {failed[name]}", file=sys.stderr)
                continue
            samples[name].append(time.monotonic() - t0)
            at[name].append(round(time.monotonic() - t_session, 1))
            release_caches()  # free operator-internal persist()s
    names = [n for n in names if samples[n]]

    # Headline per-query stat: MIN of the warm samples.  This host shows
    # random ~40s contention bursts (CPU steal visible in /proc/stat) that
    # inflate whichever samples they land on by 2-5x; with samples spread
    # across sweeps minutes apart, the min estimates uncontended
    # steady-state — the engine's number, not the neighbor's — while a
    # median flips round-to-round with burst luck (the BENCH_r01->r02
    # "regression" on byte-identical SQL).  Medians + raw samples ride
    # along for the full picture.
    times = {n: round(min(s), 3) for n, s in samples.items() if s}
    medians = {
        n: round(statistics.median(s), 3) for n, s in samples.items() if s
    }
    for name in names:
        s = samples[name]
        print(
            f"# {name}: min={times[name]:.3f}s "
            f"median={medians[name]:.3f}s max={max(s):.3f}s",
            file=sys.stderr,
        )

    # headline value stays TPC-H-only (comparable across rounds/baseline);
    # extension timings ride along in the queries dict
    total = round(
        sum(v for k, v in times.items() if k.startswith("tpch_")), 3
    )
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    # Compact summary on stdout (the driver's tail capture keeps only the
    # last ~2000 chars — BENCH_r03 learned this the hard way); full
    # per-iteration detail + deltas to BENCH_DETAIL_r{N}.json.
    # Per-family roll-up so extension drift is machine-comparable from
    # the parsed stdout block alone (VERDICT r8 item 7) — the fallback
    # below truncates the queries dict to TPC-H, which used to leave
    # extension totals visible only by diffing BENCH_DETAIL files.
    def _family(n: str) -> str:
        base = n.split("__")[0]
        parts = base.split("_")
        return "_".join(parts[:2]) if parts[0] == "ext" else parts[0]

    families: dict[str, dict] = {}
    for n in names:
        f = families.setdefault(
            _family(n), {"n": 0, "min_total": 0.0, "median_total": 0.0}
        )
        f["n"] += 1
        f["min_total"] = round(f["min_total"] + times[n], 3)
        f["median_total"] = round(f["median_total"] + medians[n], 3)
    ext_total = round(
        sum(v for k, v in times.items() if not k.startswith("tpch_")), 3
    )
    # The 10 slowest non-TPC-H entries, 1 decimal (VERDICT r12 item 2:
    # the stdout fallback truncates `queries` to the TPC-H core, which
    # left the driver's PERF structurally blind to the ext entries the
    # optimization rounds actually touch; this compact dict survives the
    # truncation stages so PERF gets per-entry ext ground truth).
    ext_top = {
        k: round(v, 1)
        for k, v in sorted(
            ((k, v) for k, v in times.items() if not k.startswith("tpch_")),
            key=lambda kv: -kv[1],
        )[:10]
    }
    out = {
        "metric": "tpch_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "stat": "min_of_warm_interleaved_samples",
        "queries": times,
        "ext_total_min": ext_total,
        "ext_top": ext_top,
        "families": families,
        "sf": sf,
    }
    # Plan-independent CPU anchors (SCALING.md r10: the +5.9% r9 "drift"
    # was a uniform host factor).  r11 lesson: ONE anchor is too noisy
    # to bear the normalization — the pyloop swung 40% within a round
    # (0.96 -> 1.35s) while every real TPC-H wall moved <8%, turning a
    # -3.9% raw delta into a fictitious "-30% normalized improvement"
    # (VERDICT r11 item 1).  A single-threaded Python loop sits in a
    # different contention regime than a 32-thread JVM workload, so we
    # now record THREE anchors spanning regimes — pyloop (per-core
    # clock/steal), blas32 (aggregate FP throughput), spark_micro (a
    # fixed aggregation over cached in-memory rows: the JVM regime the
    # suite actually runs in) — and normalize by the MEDIAN of the
    # per-anchor ratios, clamped, flagging instead of rescaling when
    # the anchors disagree.
    try:
        from tools.host_calibrate import (
            blas32_once,
            pyloop_once,
            spark_micro_once,
        )

        calibration = {
            "pyloop_sec": round(min(pyloop_once() for _ in range(3)), 4),
            "blas32_sec": round(min(blas32_once() for _ in range(3)), 4),
            "spark_micro_sec": round(
                min(spark_micro_once(spark) for _ in range(3)), 4
            ),
        }
    except Exception:  # never let the anchor break the bench contract
        calibration = None
    if calibration:
        # raw anchor values in the one-line JSON (VERDICT r12 item 9) so
        # PERF can host-annotate without digging into the detail file:
        # [pyloop, blas32, spark_micro] seconds
        out["anchors"] = [
            calibration["pyloop_sec"],
            calibration["blas32_sec"],
            calibration["spark_micro_sec"],
        ]

    detail = {
        "iterations": iters,
        "warmup_sweeps": warmups,
        "failed": failed,
        "host_calibration": calibration,
        "protocol": "interleaved_sweeps_paired_warm",
        "queries_min": times,
        "queries_median": medians,
        "queries_iters": {
            n: [round(x, 3) for x in s] for n, s in samples.items()
        },
        "session_uptime_at_sample": at,
        "sf": sf,
        "tpch_total_min": total,
    }
    prev = _load_prev_round(repo_dir)
    if prev:
        # compare LIKE stats: a prior round that predates the min-stat
        # protocol published medians in `queries` — diffing our min
        # against its median would systematically report fake speedups
        # (min <= median structurally) and mask small real regressions
        prev_is_min = prev.get("stat") == "min_of_warm_interleaved_samples"
        prev_q = prev.get("queries", {})
        ours = times if prev_is_min else medians
        deltas = {
            k: round(v - prev_q[k], 3) for k, v in ours.items()
            if k in prev_q
        }
        detail["prev_round"] = prev["_round"]
        detail["delta_vs_prev"] = deltas
        detail["delta_stat"] = (
            "min_vs_min" if prev_is_min else "median_vs_median"
        )
        delta_total = round(
            sum(v for k, v in ours.items() if k.startswith("tpch_"))
            - sum(v for k, v in prev_q.items() if k.startswith("tpch_")),
            3,
        )
        detail["delta_total"] = delta_total
        out["delta_total"] = delta_total
        out["prev_round"] = prev["_round"]
        # Anchor-normalized comparison (VERDICT r10 item 1, hardened per
        # r11 item 1): host_ratio is the MEDIAN of the per-anchor ratios
        # across every anchor both rounds recorded, clamped to
        # [0.8, 1.25].  When the anchors themselves disagree by >25%
        # (max/min ratio), the host moved non-uniformly across regimes
        # and no single scalar corrects a JVM workload — we FLAG instead
        # of rescaling (ratio pinned to 1.0, anchors_disagree=true) so a
        # noisy anchor can never again manufacture a ±30% phantom swing.
        prev_cal = _load_prev_calibration(repo_dir, prev["_round"])
        anchor_ratios, ratio, disagree = _host_ratio(calibration, prev_cal)
        if anchor_ratios:
            prev_total = round(
                sum(
                    v for k, v in prev_q.items() if k.startswith("tpch_")
                ),
                3,
            )
            norm_total = round(total / ratio, 3)
            norm = {
                "anchors_prev": {
                    k: prev_cal.get(k)
                    for k in ("pyloop_sec", "blas32_sec", "spark_micro_sec")
                },
                "anchors_now": calibration,
                "anchor_ratios": anchor_ratios,
                "anchors_disagree": disagree,
                "host_ratio": round(ratio, 4),
                "tpch_total_raw": total,
                "tpch_total_normalized": norm_total,
                "prev_tpch_total": prev_total,
                "normalized_delta_total": round(norm_total - prev_total, 3),
                "normalized_delta_pct": round(
                    100.0 * (norm_total - prev_total) / prev_total, 2
                ) if prev_total else None,
                "regression_flag": bool(
                    prev_total and norm_total > 1.05 * prev_total
                ),
            }
            detail["normalized_vs_prev"] = norm
            out["tpch_total_normalized"] = norm_total
            out["host_ratio"] = norm["host_ratio"]
            if disagree:
                out["anchors_disagree"] = True

    detail_path = os.path.join(
        repo_dir, f"BENCH_DETAIL_r{_next_round(repo_dir)}.json"
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
        out["detail_file"] = os.path.basename(detail_path)
    except OSError:
        pass  # read-only checkout: the stdout summary still stands alone

    print(summary_line(out, times))


def _host_ratio(
    calibration: dict | None, prev_cal: dict | None
) -> tuple[dict, float, bool]:
    """(per-anchor ratios, clamped-median host ratio, disagree flag).

    Ratio = median of now/prev over every anchor both rounds recorded,
    clamped to [0.8, 1.25].  When the anchors spread >25% among
    themselves the host moved non-uniformly across regimes and no
    scalar corrects a JVM workload — ratio pins to 1.0 and the flag is
    set so the caller FLAGS instead of rescaling (VERDICT r11 item 1:
    a single pyloop anchor swinging 40% within a round manufactured a
    phantom -30% normalized delta)."""
    anchor_ratios = {
        k: round(calibration[k] / prev_cal[k], 4)
        for k in ("pyloop_sec", "blas32_sec", "spark_micro_sec")
        if calibration and prev_cal
        and calibration.get(k) and prev_cal.get(k)
    }
    if not anchor_ratios:
        return {}, 1.0, False
    rvals = sorted(anchor_ratios.values())
    disagree = bool(rvals[-1] / rvals[0] > 1.25)
    ratio = (
        1.0
        if disagree
        else min(max(statistics.median(rvals), 0.8), 1.25)
    )
    return anchor_ratios, ratio, disagree


def _next_round(repo_dir: str) -> int:
    """1 + the highest BENCH_r{N}.json the driver has recorded — names the
    detail file for the round currently being benched."""
    rounds = [
        int(m.group(1))
        for path in glob.glob(os.path.join(repo_dir, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", path))
    ]
    return max(rounds, default=0) + 1


def _load_prev_calibration(repo_dir: str, prev_round: int) -> dict | None:
    """host_calibration block from the previous round's committed
    BENCH_DETAIL file (the anchor to normalize against).  Returns None
    when that round predates the anchor (r9 and earlier)."""
    path = os.path.join(repo_dir, f"BENCH_DETAIL_r{prev_round}.json")
    try:
        with open(path) as f:
            cal = json.load(f).get("host_calibration")
        return cal if isinstance(cal, dict) else None
    except (OSError, json.JSONDecodeError):
        return None


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
