"""Hash-compare Spark vs the DuckDB oracle for the HEAVY ladder entries
at a scale fixture (default: a 10x replication of the driver's sf0.01
comparison fixture) — VERDICT r10 item 3.

Why: every one of the 206 registry oracle checks runs at sf0.01, so a
*scale-dependent* wrong answer — adaptive k changing with n, an AQE plan
switch flipping a tie-broken row, accumulator overflow — would pass every
round and never be witnessed.  The reference verifies golden answers at
SF1, its bench scale (``benchmarks/src/bin/tpch.rs:1544-1566``); this
tool is the analogous bar for the entries whose plans actually change
shape with data size.

The literal-embedding oracles (whitening matrix, trained PQ codebooks,
adaptive k) regenerate for the fixture via SPARK_GRAFT_ORACLE_SF_DIR —
set here BEFORE the registry import, exactly how tests regenerate them
per SF (tests/test_extensions.py) — so the comparison is the driver's
own pinned-literal protocol, just at 10x the rows.

Comparison protocol: identical to the driver emulation (sorted-column
names, row counts, order-insensitive value hash, floats rounded to 2dp)
on a VANILLA SparkSession (no engine confs — the engine must configure
itself at runtime, as under the real driver).

Usage:
    python tools/make_scale_fixture.py 10 /root/testdata/sf0.01 /tmp/scale10x_sf001
    python tools/oracle_at_scale.py [FIXTURE_DIR] [entry ...]

Writes CORRECTNESS_SCALE10X.json at the repo root (fixture metadata +
per-entry row counts, hashes, and walls).
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import re
import sys
import time

if (
    len(sys.argv) > 1
    and os.sep in sys.argv[1]
    and not os.path.isdir(sys.argv[1])
):
    # a mistyped fixture path used to silently fall through to the
    # entry-name-filter branch, producing an empty "0/0 hash-matched"
    # artifact that reads as a completed sweep (ADVICE r11)
    sys.exit(f"fixture dir does not exist: {sys.argv[1]}")
FIXTURE = (
    sys.argv[1]
    if len(sys.argv) > 1 and os.path.isdir(sys.argv[1])
    else "/tmp/scale10x_sf001"
)
# must precede the registry import: the whitened / PQ-trained oracles
# embed THIS dir's literals at module-import time
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = FIXTURE

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

#: The heavy tier: the ladder entries whose physical plans / parameters
#: are data-size-dependent (iterative convergence, adaptive k, LSH band
#: fan-out, AQE-sized exchanges) — the ones a fixed-SF oracle can't
#: clear of scale-dependent wrong answers.
#: ordered CHEAP-FIRST by measured sf0.01 DuckDB oracle cost (the
#: all-pairs document oracles scale ~quadratically with docs: 50.7s at
#: sf0.01 for canonical_central -> an hour-plus at 10x docs), so an
#: interrupted run still leaves most of the tier witnessed — results
#: are flushed to the artifact after EVERY entry.
HEAVY_ENTRIES = [
    "ext_dedup_editdist",
    "ext_sim_topk_pq_trained",
    "ext_dedup_semantic_whitened_adaptive",
    "ext_pipeline_corpus_build",
    "ext_dedup_ppjoin",
    "ext_dedup_minhash_lsh",
    "ext_graph_triangles",
    "ext_dedup_clusters",
    "ext_graph_pagerank",
    "ext_dedup_canonical_central",
]


#: Float rounding mode for the hash.  Default (None) is the driver's
#: absolute-2dp recipe.  SPARK_GRAFT_HASH_SIGDIGITS=N switches floats
#: whose magnitude exceeds 10^(N-2) to N SIGNIFICANT digits and keeps
#: absolute 2dp below it — i.e. each value is rounded at WHICHEVER
#: quantum is coarser.  Why both: at SF>=1 magnitudes
#: (11-significant-digit double sums) absolute 2dp is finer than float64
#: summation-order determinism — tpch_q1's sum_charge differs by one ulp
#: between 16- and 32-partition plans and flips the .005 boundary
#: (VERDICT r11 item 3) — while for SMALL magnitudes pure significant-
#: digit rounding is finer than the driver protocol and trips on the
#: pre-rounding half-up boundaries the queries themselves apply
#: (h2o_groupby_highcard crounds avg(value) to 4dp; a one-ulp avg
#: difference flips the 4th decimal, a 1e-5 relative divergence that
#: 2dp absorbs by construction).  Coarser-of-the-two is strict on every
#: digit float64 determinism actually guarantees at either magnitude,
#: with no side-channel rel-match field.
_SIG_DIGITS = (
    int(os.environ["SPARK_GRAFT_HASH_SIGDIGITS"])
    if os.environ.get("SPARK_GRAFT_HASH_SIGDIGITS")
    else None
)


def _fmt_float(v: float) -> str:
    if _SIG_DIGITS is None or abs(v) < 10 ** (_SIG_DIGITS - 2):
        return f"{round(v, 2):.2f}"
    return f"{v:.{_SIG_DIGITS - 1}e}"


def value_hash(df) -> str:
    """Order-insensitive row hash — the driver emulation recipe
    (.claude/skills/verify/SKILL.md): floats at absolute 2dp by default,
    or N significant digits under SPARK_GRAFT_HASH_SIGDIGITS (SF>=1)."""
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False):
        cells = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                cells.append("NULL")
            elif isinstance(v, float):
                cells.append(_fmt_float(v))
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                cells.append(
                    "["
                    + ",".join(
                        f"{round(float(x), 2):.2f}"
                        if isinstance(x, float)
                        else str(x)
                        for x in v
                    )
                    + "]"
                )
            elif isinstance(v, bytes):
                cells.append(v.hex())
            elif hasattr(v, "isoformat"):
                iso = v.isoformat()
                cells.append(iso[:10] if iso.endswith("T00:00:00") else iso)
            else:
                cells.append(str(v))
        rows.append("|".join(cells))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    only = [a for a in sys.argv[1:] if not os.path.isdir(a)] or None
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("oracle-at-scale")
        # infrastructure sizing, not an engine conf: the default 1g
        # driver heap OOMs on SF1-size collect results; the engine's
        # required runtime confs still come from _configure_reader
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        )
        # O(n)-row entries (h2o manykey at 100x: ~10M result rows) bust
        # the 1g default before the driver heap does
        .config("spark.driver.maxResultSize", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from arrow_ballista_spark.queries import load_all
    from arrow_ballista_spark.operators.caching import release_caches

    reg = load_all()
    con = duckdb.connect()
    con.execute(f"SET threads TO {int(cpus)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{FIXTURE}/{t}.parquet')"
        )
    n_docs = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    n_emb = con.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]

    # seed from an existing artifact for the SAME fixture so a partial
    # re-run (one fixed entry) accumulates instead of clobbering the
    # sweep's evidence; re-run entries overwrite their own row
    results: dict[str, dict] = {}
    try:
        with open(_artifact_path()) as f:
            prior = json.load(f)
        if prior.get("fixture") == FIXTURE:
            results = {
                k: v
                for k, v in prior.get("results", {}).items()
                if isinstance(v, dict)
            }
    except (OSError, json.JSONDecodeError):
        pass
    names = [n for n in (only or HEAVY_ENTRIES) if n in reg]
    for i, name in enumerate(names):
        qd = reg[name]
        row: dict = {"err": None}
        release_caches()
        t0 = time.time()
        try:
            sdf = qd.spark(spark, FIXTURE).toPandas()
            row["spark_sec"] = round(time.time() - t0, 1)
            row["spark_rows"] = len(sdf)
        except Exception as e:  # noqa: BLE001 — record + continue
            row["err"] = f"spark: {type(e).__name__}: {e}"[:300]
            results[name] = row
            _flush(results, n_docs, n_emb)
            print(f"[{i+1}/{len(names)}] {name}: SPARK FAIL", flush=True)
            continue
        if qd.oracle is None:
            row["rows_only"] = True
            results[name] = row
            _flush(results, n_docs, n_emb)
            print(
                f"[{i+1}/{len(names)}] {name}: rows-only "
                f"({len(sdf)} rows, {row['spark_sec']}s)",
                flush=True,
            )
            continue
        t0 = time.time()
        try:
            odf = con.execute(qd.oracle).df()
            row["oracle_sec"] = round(time.time() - t0, 1)
            row["oracle_rows"] = len(odf)
        except Exception as e:  # noqa: BLE001
            row["err"] = f"oracle: {type(e).__name__}: {e}"[:300]
            results[name] = row
            _flush(results, n_docs, n_emb)
            print(f"[{i+1}/{len(names)}] {name}: ORACLE FAIL", flush=True)
            continue
        sdf.columns = [c.lower() for c in sdf.columns]
        odf.columns = [c.lower() for c in odf.columns]
        row["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
        row["rows_match"] = len(sdf) == len(odf)
        row["hash_match"] = (
            row["schema_match"]
            and row["rows_match"]
            and value_hash(sdf) == value_hash(odf)
        )
        if (
            not row["hash_match"]
            and row["schema_match"]
            and row["rows_match"]
        ):
            # The driver hash rounds floats at 2 ABSOLUTE decimals — at
            # SF1 magnitudes (11-significant-digit double sums) that is
            # finer than float64 order-of-summation determinism: q1's
            # sum_charge differs by one ulp between 16- and 32-partition
            # plans and flips the .005 boundary.  Record whether the
            # mismatch is ulp noise (rel 1e-9) or a real wrong answer.
            row["float_rel_match"] = _rel_match(sdf, odf)
        results[name] = row
        _flush(results, n_docs, n_emb)
        verdict = (
            "ok"
            if row["hash_match"]
            else (
                "ulp-noise (rel match)"
                if row.get("float_rel_match")
                else "MISMATCH"
            )
        )
        print(
            f"[{i+1}/{len(names)}] {name}: {verdict} "
            f"({row['spark_rows']} vs {row['oracle_rows']} rows, "
            f"spark {row['spark_sec']}s / oracle {row['oracle_sec']}s)",
            flush=True,
        )

    n_ok = sum(1 for r in results.values() if r.get("hash_match"))
    print(
        f"{n_ok}/{len(results)} hash-matched -> " + _artifact_path(),
        flush=True,
    )


def _rel_match(sdf, odf, rtol: float = 1e-9) -> bool:
    """True when the only divergence is float noise: non-float columns
    byte-equal, float columns equal within relative 1e-9 (vs the hash's
    absolute-2dp rounding, which a single ulp can flip at SF1 sums)."""
    import numpy as np

    cols = sorted(sdf.columns)
    try:
        s = sdf[cols].sort_values(cols).reset_index(drop=True)
        o = odf[cols].sort_values(cols).reset_index(drop=True)
        for c in cols:
            if s[c].dtype.kind == "f":
                if not np.allclose(
                    s[c].to_numpy(),
                    o[c].to_numpy(),
                    rtol=rtol,
                    atol=1e-12,
                    equal_nan=True,
                ):
                    return False
            elif not (s[c].astype(str) == o[c].astype(str)).all():
                return False
        return True
    except Exception:
        return False


def _artifact_path() -> str:
    """Fixture-keyed artifact name (scale10x -> CORRECTNESS_SCALE10X.json,
    scale5x -> CORRECTNESS_SCALE5X.json, ...) so runs against different
    fixtures don't clobber each other.  SPARK_GRAFT_SCALE_LABEL overrides
    the derived label (e.g. SF1 for the TPC-H run against the 10x-of-
    sf0.1 fixture, whose basename would collide with the 10x-of-sf0.01
    heavy-tier artifact)."""
    label = os.environ.get("SPARK_GRAFT_SCALE_LABEL")
    if not label:
        base = os.path.basename(FIXTURE.rstrip("/"))
        m = re.search(r"scale(\d+x)", base)
        label = (m.group(1) if m else base).upper()
    return os.path.join(ROOT, f"CORRECTNESS_SCALE{label.upper()}.json")


def _flush(results: dict, n_docs: int, n_emb: int) -> None:
    """Write the artifact after every entry — the all-pairs oracles run
    for tens of minutes each at 10x, and a partial artifact is evidence
    where a crashed run would leave none."""
    out = {
        "fixture": FIXTURE,
        "fixture_rows": {"documents": n_docs, "embeddings": n_emb},
        "protocol": "driver-emulation hash compare at 10x the oracle SF",
        "hash_mode": (
            "abs2dp"
            if _SIG_DIGITS is None
            else f"sig{_SIG_DIGITS}_above_1e{_SIG_DIGITS - 2}_else_abs2dp"
        ),
        "results": results,
    }
    with open(_artifact_path(), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
