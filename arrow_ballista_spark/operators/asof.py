"""As-of (point-in-time) join — a custom operator Spark lacks natively.

The reference has no as-of join either (SURVEY.md §2.B.3: absent from the
proto surface); this is a north-star extension implemented as a
composition of existing DataFrame ops — the union + keyed-window
``last(ignorenulls)`` formulation:

1. tag left rows 1, right rows 0, union by common schema;
2. one shuffle: partition by the equality key, order by (ts, tag) —
   right-before-left at equal timestamps gives inclusive ``l.ts >= r.ts``;
3. ``last(right_value, ignorenulls=True)`` over the preceding frame
   carries the most recent right row forward;
4. keep the left rows.

Scale: exactly one shuffle of |L|+|R| rows keyed by the join key — the
same cost as a regular sort-merge join, with no range-explosion.  Skewed
keys fall to AQE skew handling.  This beats the naive
``l JOIN r ON key AND r.ts <= l.ts`` + greatest-ts filter, which explodes
to |matches| rows before filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.on <= left.on`` and equal ``by`` key (left-outer semantics:
    unmatched left rows keep NULLs)."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, by)
    ]
    lcols = left.columns
    tagged_l = left.withColumn("_tag", F.lit(1))
    for c in [on] + right_cols:
        tagged_l = tagged_l.withColumn(
            f"_r_{c}", F.lit(None).cast(dict(right.dtypes)[c])
        )
    tagged_r = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_tag"),
        F.col(on).alias(f"_r_{on}"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    for c in lcols:
        if c not in tagged_r.columns:
            tagged_r = tagged_r.withColumn(
                c, F.lit(None).cast(dict(tagged_l.dtypes)[c])
            )
    unioned = tagged_l.select(
        *lcols, "_tag", *[f"_r_{c}" for c in [on] + right_cols]
    ).unionByName(
        tagged_r.select(
            *lcols, "_tag", *[f"_r_{c}" for c in [on] + right_cols]
        )
    )
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "_tag",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True)
            .over(w)
            .alias(f"{c}{suffix}")
            for c in [on] + right_cols
        ],
    )
    return carried.filter(F.col("_tag") == 1).drop("_tag")
