"""Event-analytics queries: sessionization, funnel, retention cohorts.

Beyond-reference extensions (SURVEY.md §2.D): the standard product-
analytics shapes over the ``events`` table, all pure JVM window/aggregate
plans with value-exact DuckDB oracles.

Scale notes: each query shuffles on ``user_id`` exactly once (the window
partition / groupBy key); per-user partitions are bounded by per-user
event counts, and a pathological power user is an AQE skew-split case,
not a plan change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arrow_ballista_spark.catalog import load_table
from arrow_ballista_spark.queries import query

_GAP_MIN = 30


@query(
    "ext_sessionize",
    f"""
WITH o AS (
  SELECT event_id, user_id, ts,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL {_GAP_MIN} MINUTE
                   OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
       CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS session_seq
FROM o
""",
    doc=(
        "sessionization: assign each event its per-user session index "
        "(a new session starts after a 30-minute inactivity gap) — the "
        "lag-then-running-sum formulation, one shuffle on user_id, both "
        "windows share the same partitioning so Catalyst plans a single "
        "exchange"
    ),
)
def ext_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond epoch (unix_micros via LTZ; session is UTC) — a
    # whole-second cast would floor sub-second gaps and disagree with the
    # oracle's full-precision `ts - LAG(ts) > INTERVAL` for 1800.xs gaps
    micros = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    gap = micros - F.lag(micros).over(w)
    is_new = F.when(
        gap.isNull() | (gap > _GAP_MIN * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(is_new).over(wrun).alias("session_seq"),
    )


@query(
    "ext_funnel",
    """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT 'signup' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
UNION ALL
SELECT 'click_after_signup', CAST(COUNT(*) AS BIGINT) FROM s2
UNION ALL
SELECT 'purchase_after_click', CAST(COUNT(*) AS BIGINT) FROM s3
""",
    doc=(
        "ordered funnel (signup -> later click -> later purchase): each "
        "stage is a groupBy(user) min-timestamp joined forward, so the "
        "whole funnel is 3 aggregations + 2 user-keyed joins — no "
        "per-user UDF, no sequence explosion; stage tables shrink "
        "monotonically so later joins broadcast under AQE"
    ),
)
def ext_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def stage_min(df: DataFrame, etype: str, alias: str) -> DataFrame:
        return (
            df.where(F.col("event_type") == etype)
            .groupBy("user_id")
            .agg(F.min("ts").alias(alias))
        )

    s1 = stage_min(ev, "signup", "t1")
    s2 = (
        ev.join(s1, "user_id")
        .where((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.join(s2, "user_id")
        .where(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def cnt(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"), F.count(F.lit(1)).alias("n_users")
        )

    return (
        cnt(s1, "signup")
        .unionByName(cnt(s2, "click_after_signup"))
        .unionByName(cnt(s3, "purchase_after_click"))
    )


@query(
    "ext_retention_cohorts",
    """
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort_day
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id,
         CAST(date_trunc('day', e.ts) AS DATE) AS active_day
  FROM events e
)
SELECT f.cohort_day,
       CAST(datediff('day', f.cohort_day, a.active_day) AS BIGINT)
         AS day_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM activity a JOIN firsts f ON a.user_id = f.user_id
GROUP BY f.cohort_day, datediff('day', f.cohort_day, a.active_day)
""",
    doc=(
        "retention cohorts: users bucketed by first-seen day, counted per "
        "(cohort, day-offset) — first-seen is one user-keyed aggregation, "
        "activity a distinct projection, and the cohort join re-uses the "
        "user_id partitioning; output is cohort-days x offsets, tiny at "
        "any corpus scale"
    ),
)
def ext_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("cohort_day")
    )
    activity = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("active_day")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("active_day"), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
