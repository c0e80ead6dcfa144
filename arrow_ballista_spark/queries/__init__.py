"""Query registry — the engine's declared capability surface.

Every operator family from SURVEY.md §2 gets at least one named query here,
implemented twice:

 - ``spark``: a callable ``(SparkSession, sf_dir) -> DataFrame`` built with
   the idiomatic PySpark DataFrame/SQL API (Catalyst plans the physical
   strategy);
 - ``oracle``: an equivalent ANSI-SQL string DuckDB can run over the same
   parquet tables (the driver's correctness gate).  ``None`` marks a
   genuinely non-SQL-expressible op (weaker rows-only check).

Column names are aliased identically on both sides; float aggregates are
rounded identically on both sides so order-of-summation noise cannot flip
the driver's value hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB-compatible ANSI SQL, or None (rows-only check)
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def R(expr: str, digits: int) -> str:
    """Portable round-half-away-from-zero on the BINARY double value.

    Spark's ROUND is HALF_UP on the shortest decimal representation while
    DuckDB's is C round() on the binary value — they disagree whenever the
    true value sits a hair below a .5 boundary (e.g. avg() = 73.91375
    stored as 73.9137499…).  This floor-based macro evaluates identically
    in both engines, so rounded aggregates hash-match.
    """
    s = 10 ** digits
    return (
        f"(floor(abs({expr}) * {s} + 0.5) / {s}e0"
        f" * (CASE WHEN ({expr}) < 0 THEN -1 ELSE 1 END))"
    )


def cround(col, digits: int):
    """Column-API twin of :func:`R` for DataFrame-side queries."""
    from pyspark.sql import functions as F

    if isinstance(col, str):
        col = F.col(col)
    s = float(10 ** digits)
    sign = F.when(col < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return F.floor(F.abs(col) * s + F.lit(0.5)) / F.lit(s) * sign


def query(name: str, oracle: str | None, doc: str = ""):
    """Register a query implementation + its DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryDef(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# Registry order is LOAD-BEARING: the driver's correctness harness checks
# the first ~50 entries, in dict order.  From round 6 the head is DERIVED,
# not hand-curated: tools/update_rotation.py scans the committed
# CORRECTNESS_r*.json files into queries/rotation_state.py (last driver-
# green round per entry), and the window head is oldest-evidence-first —
# entries never externally witnessed (new work, or `no_oracle` rows)
# automatically occupy the front, so nothing can go unwitnessed for
# multiple rounds (the r5 failure mode: 6 late entries missed the
# sample).  A fixed canary block keeps core-regression visibility
# (TPC-H, streaming, the heavy compositions) inside every window.
_WINDOW = 50
_CANARIES = [
    "tpch_q1", "tpch_q8", "tpch_q18", "tpch_q21", "tpch_q19",
    "ext_stream_session_counts", "ext_pipeline_corpus_build",
    "ext_dedup_canonical_central", "ext_graph_pagerank",
    # ivf (not lsh) as the similarity canary: same family, and the
    # 32-table lsh oracle costs ~45s per driver comparison
    "ext_dedup_semantic", "ext_merge_upsert", "ext_sim_topk_ivf",
]

# Entries whose ORACLE or fixture semantics changed: the old evidence
# witnessed different code, so they rank as never-witnessed until a
# driver round AT OR AFTER the stamped round shows them green again
# (self-healing — no manual removal step; add a row with the round the
# change lands in whenever a round modifies an existing entry).
_EVIDENCE_RESET = {
    # r12: tercile cutoffs moved from interpolated quantiles to exact
    # order statistics after the 50k-doc sweep caught Spark and DuckDB
    # interpolating to opposite sides of a grid value (new oracle text
    # AND slightly different bucket boundaries)
    "ext_quality_ccnet_buckets": 12,
    # r8: real numpy logistic model replaced the length stub (new oracle)
    "ext_model_score": 8,
    # r9: every codec oracle was byte-pinned (regexp_replace non-ASCII
    # sanitizer inside rpad; _ascii_bytes on the Spark half) — values
    # unchanged on ASCII fixtures but the compared SQL is new text
    "ext_multimodal_image_stats": 9,
    "ext_multimodal_png_stats": 9,
    "ext_multimodal_jpeg_stats": 9,
    "ext_multimodal_audio_stats": 9,
    "ext_multimodal_mulaw_stats": 9,
    "ext_multimodal_gif_stats": 9,
    "ext_multimodal_adpcm_stats": 9,
    # r9: + new decode lanes (tiled/predictor-2/Deflate TIFF;
    # disposal-3 GIF animation on doc_id%3==1)
    "ext_multimodal_tiff_stats": 9,
    "ext_multimodal_gif_frames": 9,
    # r9: head_hex went octet-level; frame_md5 redefined as md5 over
    # the frame's lowercase hex (new values)
    "ext_multimodal_features": 9,
    "ext_multimodal_frames": 9,
}


def _effective_age(name: str, last_green: dict) -> int:
    """Evidence age for rotation: 0 (never-witnessed) when the entry's
    semantics changed after its newest driver-green round."""
    age = last_green.get(name, 0)
    if age < _EVIDENCE_RESET.get(name, 0):
        return 0
    return age


def _derive_head_rotation(names: list[str]) -> list[str]:
    """Oldest-external-evidence-first window head (ties: registry order).

    Positions 0..fill hold the argmin of last-driver-green-round over the
    whole registry (never-witnessed entries — and entries whose oracle or
    fixture changed since their evidence, ``_EVIDENCE_RESET`` — rank as
    round 0); the canary block fills the window tail.  Asserted by
    tests/test_registry.py.
    """
    from arrow_ballista_spark.queries.rotation_state import LAST_GREEN

    by_age = sorted(
        (n for n in names if n not in _CANARIES),
        key=lambda n: _effective_age(n, LAST_GREEN),
    )  # sort is stable -> registry order breaks round ties
    fill = max(0, _WINDOW - len(_CANARIES))
    return [*by_age[:fill], *[c for c in _CANARIES if c in names]]


def load_all() -> dict[str, QueryDef]:
    """Import every query module so REGISTRY is fully populated.

    Import order populates the registry; the final dict order is the
    round's evidence-rotation policy (``_HEAD_ROTATION`` first, then every
    remaining query in module order).  The flagship suites — TPC-H (the
    reference's own correctness gate, ``benchmarks/src/bin/tpch.rs:
    1294-1400``), windows, per-operator families — all carry the identical
    DuckDB-oracle check in the local pytest suite (tests/test_*)
    regardless of driver-window position.
    """
    from arrow_ballista_spark.queries import (  # noqa: F401
        tpch,
        windows,
        operators,
        functions_suite,
        extensions,
        corpus_pipeline,
        events_analytics,
        advanced,
    )

    head = _derive_head_rotation(list(REGISTRY))
    rest = [n for n in REGISTRY if n not in set(head)]
    ordered = {n: REGISTRY[n] for n in [*head, *rest]}
    REGISTRY.clear()
    REGISTRY.update(ordered)
    return REGISTRY
