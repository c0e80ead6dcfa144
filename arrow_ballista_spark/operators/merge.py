"""Snapshot maintenance operators: keyed upsert (MERGE / SCD-type-1) and
snapshot diff (change-data-capture between two dataset versions).

A training-data pipeline re-crawls and re-scores documents continuously;
the corpus table is maintained by merging each new batch into the previous
snapshot, and downstream incremental jobs consume the diff instead of the
full corpus.  The reference engine has neither (its writes are
whole-dataset, ``ballista/client/src/context.rs:497-528``) — this is the
lakehouse-shaped extension of SURVEY.md §2.B.1 sinks.

Scale notes:

- :func:`merge_upsert` is ONE anti join + a union — both sides shuffle on
  the key once (or the updates side broadcasts when batch-sized, which
  AQE decides at runtime; no forced hint, mirroring the canonical-dedup
  size-guard lesson).  No window, no full-table rewrite of unchanged
  partitions at the operator level (pair with partitioned writers for
  partition-pruned rewrites).
- :func:`snapshot_diff` is ONE full-outer join on the key; change
  detection compares a single hash column computed map-side from the
  value columns, so wide rows don't multiply join width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE semantics, SCD type 1: rows from ``updates`` win on key
    collision; unmatched base rows survive; unmatched update rows insert.
    Both inputs must share a schema."""
    kept = base.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff ``old → new``: returns ``(key, change)`` with
    ``change ∈ {'I','U','D'}`` (insert / update / delete); unchanged rows
    are omitted.  ``compare_cols`` defaults to all non-key columns."""
    cols = compare_cols or [c for c in new.columns if c != key]
    # map-side value fingerprint; null-safe via the to-string of a struct
    fp = F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in cols])))
    o = old.select(F.col(key), fp.alias("_fp_old"))
    n = new.select(F.col(key), fp.alias("_fp_new"))
    joined = o.join(n, key, "full_outer").where(
        F.col("_fp_old").isNull()
        | F.col("_fp_new").isNull()
        | (F.col("_fp_old") != F.col("_fp_new"))
    )
    return joined.select(
        key,
        F.when(F.col("_fp_old").isNull(), F.lit("I"))
        .when(F.col("_fp_new").isNull(), F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("change"),
    )
