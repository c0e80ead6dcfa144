"""As-of (point-in-time) join — a custom operator Spark lacks natively.

The reference has no as-of join either (SURVEY.md §2.B.3: absent from the
proto surface); this is a north-star extension implemented as a
composition of existing DataFrame ops — the union + keyed-window
``last(ignorenulls)`` formulation:

1. tag left rows 1, right rows 0, union by common schema;
2. one shuffle: partition by the equality key, order by (ts, tag) —
   right-before-left at equal timestamps gives inclusive ``l.ts >= r.ts``;
3. ``last(struct(right_row), ignorenulls=True)`` over the preceding frame
   carries the most recent right row forward — the whole row as ONE struct,
   so a legitimately-NULL right value column travels with its own row
   instead of falling back to an older row's value (torn-row hazard of the
   per-column formulation);
4. keep the left rows.

Scale: exactly one shuffle of |L|+|R| rows keyed by the join key — the
same cost as a regular sort-merge join, with no range-explosion.  For
hot keys (one ``by`` value dominating the input) the plain keyed window
puts the whole key in one task; :func:`asof_join_bucketed` splits it by
time-range buckets with a carry-in fix-up pass, bounding any task at
~|key|/n_buckets rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _right_struct(on: str, right_cols: list[str]) -> Column:
    """The carried payload: the right row's (ts, value...) as one struct so
    it is carried atomically by ``last(ignorenulls)``."""
    return F.struct(F.col(on).alias(on), *[F.col(c).alias(c) for c in right_cols])


def _unpack(carried: Column, on: str, right_cols: list[str], suffix: str):
    return [
        carried.getField(c).alias(f"{c}{suffix}") for c in [on] + right_cols
    ]


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
    tagged_r = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_tag"),
        _right_struct(on, right_cols).alias("_r"),
    )
    rtype = tagged_r.schema["_r"].dataType
    tagged_l = left.withColumn("_tag", F.lit(1)).withColumn(
        "_r", F.lit(None).cast(rtype)
    )
    for c in lcols:
        if c not in tagged_r.columns:
            tagged_r = tagged_r.withColumn(
                c, F.lit(None).cast(dict(tagged_l.dtypes)[c])
            )
    unioned = tagged_l.select(*lcols, "_tag", "_r").unionByName(
        tagged_r.select(*lcols, "_tag", "_r")
    )
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "_tag",
        F.last(F.col("_r"), ignorenulls=True).over(w).alias("_c"),
    )
    return (
        carried.filter(F.col("_tag") == 1)
        .select(*lcols, *_unpack(F.col("_c"), on, right_cols, suffix))
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    n_buckets: int = 32,
    bucket_micros: int | None = None,
) -> DataFrame:
    """Skew-safe as-of join: identical semantics to :func:`asof_join`, but
    the window partitions on ``(by, time_bucket)`` so a hot key (one symbol
    = 30% of all rows) is split over ``n_buckets`` tasks instead of one
    straggler AQE cannot touch.

    Two-pass range-bucket scheme:

    1. bucket every row by ``floor(epoch_us(on) / width)``;
    2. per (key, bucket), reduce the right rows to the latest right struct
       (``max_by`` — a tiny summary table of ≤ keys×buckets rows);
    3. window over the *summary* table carries each bucket's latest right
       struct forward as the next buckets' carry-in — the only cross-bucket
       pass, over summaries rather than raw rows;
    4. inject the carry-in as one synthetic right row per (key, bucket)
       (its original timestamp < every in-bucket timestamp, so it sorts
       first) and run the original window partitioned by (key, bucket).

    ``bucket_micros`` sets the bucket width explicitly; by default the
    width is derived from the left side's min/max timestamp (one scalar
    aggregate — a planning-time action, same class as AQE statistics).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, by)
    ]
    lcols = left.columns
    if bucket_micros is None:
        lo, hi = left.select(
            F.unix_micros(F.col(on).cast("timestamp_ltz")).alias("us")
        ).agg(F.min("us"), F.max("us")).first()
        span = max(int(hi) - int(lo), 1) if lo is not None else 1
        bucket_micros = max(span // n_buckets, 1)
    bkt = lambda c: (  # noqa: E731
        F.unix_micros(F.col(c).cast("timestamp_ltz")) / F.lit(bucket_micros)
    ).cast("bigint")

    tagged_r = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_tag"),
        _right_struct(on, right_cols).alias("_r"),
    ).withColumn("_bkt", bkt(on))
    rtype = tagged_r.schema["_r"].dataType
    tagged_l = (
        left.withColumn("_tag", F.lit(1))
        .withColumn("_r", F.lit(None).cast(rtype))
        .withColumn("_bkt", bkt(on))
    )
    for c in lcols:
        if c not in tagged_r.columns:
            tagged_r = tagged_r.withColumn(
                c, F.lit(None).cast(dict(tagged_l.dtypes)[c])
            )
    tagged_r = tagged_r.select(*lcols, "_tag", "_r", "_bkt")
    tagged_l = tagged_l.select(*lcols, "_tag", "_r", "_bkt")

    # (2) latest right struct per (key, bucket) — max_by on the bucket's
    # timestamp; ties between identical timestamps match the base window's
    # arbitrary-among-equals choice.
    summ = tagged_r.groupBy(by, "_bkt").agg(
        F.max_by(F.col("_r"), F.col(on)).alias("_rb")
    )
    # bucket spine = every (key, bucket) that has LEFT rows (only those
    # need a carry-in), unioned with right-summary buckets so the carry
    # chain is unbroken across right-only buckets.
    spine = (
        tagged_l.select(by, "_bkt")
        .distinct()
        .unionByName(summ.select(by, "_bkt"))
        .distinct()
        .join(summ, [by, "_bkt"], "left")
    )
    # (3) carry-in for bucket b = latest right struct from any bucket < b.
    w_carry = (
        Window.partitionBy(by)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        spine.withColumn(
            "_cin", F.last(F.col("_rb"), ignorenulls=True).over(w_carry)
        )
        .filter(F.col("_cin").isNotNull())
        .select(
            by,
            "_bkt",
            F.col("_cin").getField(on).alias(on),
            F.lit(0).alias("_tag"),
            F.col("_cin").alias("_r"),
        )
    )
    for c in lcols:
        if c not in carry.columns:
            carry = carry.withColumn(c, F.lit(None).cast(dict(tagged_l.dtypes)[c]))
    carry = carry.select(*lcols, "_tag", "_r", "_bkt")

    # (4) in-bucket window: each task holds one (key, bucket) slice.
    unioned = tagged_l.unionByName(tagged_r).unionByName(carry)
    w = (
        Window.partitionBy(by, "_bkt")
        .orderBy(F.col(on).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "_tag",
        F.last(F.col("_r"), ignorenulls=True).over(w).alias("_c"),
    )
    return (
        carried.filter(F.col("_tag") == 1)
        .select(*lcols, *_unpack(F.col("_c"), on, right_cols, suffix))
    )
