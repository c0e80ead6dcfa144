"""Skew-mitigation join: explicit key salting.

AQE's skew-join splitting (on in the session defaults) handles most skew
at runtime; explicit salting is the static fallback for the pathological
case AQE can't fix — a single join key so hot that one reduce partition
exceeds executor memory.  Semantics are identical to the plain join:

- left rows get a deterministic pseudo-random salt in [0, s);
- the (small or skew-free) right side is replicated s ways;
- the join key becomes (key, salt), spreading the hot key over s reduce
  partitions.

Cost model: right side shuffles s× its size — use only when the hot-key
partition is the binding constraint (s=8-32 at 100 TB typical).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, salt_buckets: int) -> Column:
    """DETERMINISTIC content-derived salt in [0, salt_buckets): xxhash64
    over every column of the row.  A position-derived salt
    (monotonically_increasing_id / rand) is a nondeterministic shuffle
    key — the SPARK-23207 class: a stage retry can recompute different
    salts than the partially-fetched shuffle output, duplicating or
    dropping rows.  The trade-off: rows identical in EVERY column share a
    salt and don't spread — that narrow case is an upstream exact-dedup
    problem, not a join-skew one (hot keys differ in non-key columns)."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)
    ).cast("int")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the hot-key shuffle spread over
    ``salt_buckets`` partitions.  Result equals ``left.join(right, on,
    how)`` row-for-row (salt columns are internal).

    Only left-preserving join types are valid: the right side is
    replicated ``salt_buckets`` ways, so right/full outer would emit one
    row per unmatched *replica* instead of per unmatched row."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left-preserving joins, not {how!r}"
            " (the replicated right side breaks right/full outer semantics)"
        )
    l_salted = left.withColumn("_salt", _salt_col(left, salt_buckets))
    r_salted = right.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return l_salted.join(r_salted, [on, "_salt"], how).drop("_salt")
