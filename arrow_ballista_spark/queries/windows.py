"""Window functions + batch time-window queries over the events table.

The reference serializes the full window surface (BuiltInWindowFunction,
WindowExprNode, frames — datafusion.proto:569-680) but its distributed
planner *rejects* window plans (planner.rs:151-156); Spark executes them
distributed for free (SURVEY 2.B.5).  The events table exercises batch
tumbling/sliding/session time windows (SURVEY 2.B.10: reference has no
streaming surface, so time windows run in batch mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arrow_ballista_spark.catalog import load_table
from arrow_ballista_spark.queries import cround, query


@query(
    "window_ranking",
    """
SELECT o_orderkey,
       o_orderstatus,
       row_number()   OVER w AS rn,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       ntile(4)       OVER w AS quartile,
       (floor(abs(percent_rank() OVER w) * 1000000 + 0.5) / 1000000e0 * (CASE WHEN (percent_rank() OVER w) < 0 THEN -1 ELSE 1 END)) AS pct_rank,
       (floor(abs(cume_dist()    OVER w) * 1000000 + 0.5) / 1000000e0 * (CASE WHEN (cume_dist()    OVER w) < 0 THEN -1 ELSE 1 END)) AS cdist
FROM orders
WHERE o_orderkey <= 2000
WINDOW w AS (PARTITION BY o_orderstatus
             ORDER BY o_totalprice DESC, o_orderkey)
""",
    doc="ranking window functions (ref BuiltInWindowFunction "
        "datafusion.proto:569-575)",
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        cround(F.percent_rank().over(w), 6).alias("pct_rank"),
        cround(F.cume_dist().over(w), 6).alias("cdist"),
    )


@query(
    "window_offset",
    """
SELECT o_orderkey,
       o_custkey,
       (floor(abs(COALESCE(lag(o_totalprice)  OVER w, -1)) * 100 + 0.5) / 100e0 * (CASE WHEN (COALESCE(lag(o_totalprice)  OVER w, -1)) < 0 THEN -1 ELSE 1 END)) AS prev_price,
       (floor(abs(COALESCE(lead(o_totalprice) OVER w, -1)) * 100 + 0.5) / 100e0 * (CASE WHEN (COALESCE(lead(o_totalprice) OVER w, -1)) < 0 THEN -1 ELSE 1 END)) AS next_price,
       (floor(abs(first_value(o_totalprice) OVER w2) * 100 + 0.5) / 100e0 * (CASE WHEN (first_value(o_totalprice) OVER w2) < 0 THEN -1 ELSE 1 END)) AS first_price,
       (floor(abs(last_value(o_totalprice)  OVER w2) * 100 + 0.5) / 100e0 * (CASE WHEN (last_value(o_totalprice)  OVER w2) < 0 THEN -1 ELSE 1 END)) AS last_price,
       (floor(abs(COALESCE(nth_value(o_totalprice, 2) OVER w2, -1)) * 100 + 0.5) / 100e0 * (CASE WHEN (COALESCE(nth_value(o_totalprice, 2) OVER w2, -1)) < 0 THEN -1 ELSE 1 END))
           AS second_price
FROM orders
WHERE o_custkey <= 100
WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    doc="LAG/LEAD/FIRST/LAST/NTH_VALUE (ref datafusion.proto:576-581)",
)
def window_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        cround(F.coalesce(F.lag("o_totalprice").over(w), F.lit(-1)), 2).alias(
            "prev_price"
        ),
        cround(F.coalesce(F.lead("o_totalprice").over(w), F.lit(-1)), 2).alias(
            "next_price"
        ),
        cround(F.first("o_totalprice").over(w2), 2).alias("first_price"),
        cround(F.last("o_totalprice").over(w2), 2).alias("last_price"),
        cround(
            F.coalesce(F.nth_value("o_totalprice", 2).over(w2), F.lit(-1)), 2
        ).alias("second_price"),
    )


@query(
    "window_agg_frames",
    """
SELECT l_orderkey,
       l_linenumber,
       (floor(abs(SUM(l_extendedprice) OVER
             (PARTITION BY l_orderkey ORDER BY l_linenumber
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100e0 * (CASE WHEN (SUM(l_extendedprice) OVER
             (PARTITION BY l_orderkey ORDER BY l_linenumber
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) < 0 THEN -1 ELSE 1 END)) AS rolling_sum,
       (floor(abs(AVG(l_quantity) OVER
             (PARTITION BY l_orderkey ORDER BY l_quantity
              RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)) * 10000 + 0.5) / 10000e0 * (CASE WHEN (AVG(l_quantity) OVER
             (PARTITION BY l_orderkey ORDER BY l_quantity
              RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)) < 0 THEN -1 ELSE 1 END)) AS range_avg,
       CAST(COUNT(*) OVER (PARTITION BY l_orderkey) AS BIGINT) AS lines
FROM lineitem
WHERE l_orderkey <= 1000
""",
    doc="aggregates over ROWS and numeric RANGE frames (ref WindowFrameUnits "
        "datafusion.proto:651-656; GROUPS frames unsupported per SURVEY §7)",
)
def window_agg_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    w_rows = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(-2, Window.currentRow)
    )
    w_range = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_quantity")
        .rangeBetween(-10, Window.currentRow)
    )
    w_part = Window.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        cround(F.sum("l_extendedprice").over(w_rows), 2).alias("rolling_sum"),
        cround(F.avg("l_quantity").over(w_range), 4).alias("range_avg"),
        F.count(F.lit(1)).over(w_part).alias("lines"),
    )


@query(
    "window_running_total",
    """
SELECT event_id,
       user_id,
       (floor(abs(SUM(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id)) * 100 + 0.5) / 100e0 * (CASE WHEN (SUM(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id)) < 0 THEN -1 ELSE 1 END)) AS running_value,
       CAST(COUNT(*) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS BIGINT) AS event_seq
FROM events
WHERE user_id <= 20
""",
    doc="running totals (aggregate-as-window, ref WindowExprNode "
        "aggr_function arm, datafusion.proto:583-595)",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        cround(F.sum("value").over(w), 2).alias("running_value"),
        F.count(F.lit(1)).over(w).alias("event_seq"),
    )


# --------------------------------------------------------------------------
# Batch time windows over events (SURVEY 2.B.10)
# --------------------------------------------------------------------------

@query(
    "events_tumbling_window",
    """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       (floor(abs(SUM(value)) * 100 + 0.5) / 100e0 * (CASE WHEN (SUM(value)) < 0 THEN -1 ELSE 1 END)) AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
    doc="tumbling 1h window via date_trunc (ref DateTrunc/DateBin scalar, "
        "datafusion.proto date/time fns; batch mode per SURVEY 2.B.10)",
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        cround(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "events_sliding_window",
    """
SELECT ws AS window_start, COUNT(*) AS n_events, (floor(abs(AVG(value)) * 10000 + 0.5) / 10000e0 * (CASE WHEN (AVG(value)) < 0 THEN -1 ELSE 1 END))
       AS avg_value
FROM (
    SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                   time_bucket(INTERVAL '30 minutes', ts)
                     - INTERVAL '30 minutes']) AS ws,
           value
    FROM events
)
GROUP BY ws
""",
    doc="sliding window (1h length, 30m slide) — Spark window(); oracle "
        "enumerates the 2 windows each event belongs to",
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            cround(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_events", "avg_value"
        )
    )


@query(
    "events_session_window",
    """
WITH gaps AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     > INTERVAL '30 minutes'
                THEN 1 ELSE 0 END AS brk
    FROM events WHERE user_id <= 20
), islands AS (
    SELECT user_id, ts, value,
           SUM(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
    FROM gaps
)
SELECT user_id,
       MIN(ts) AS session_start,
       COUNT(*) AS n_events,
       (floor(abs(SUM(value)) * 100 + 0.5) / 100e0 * (CASE WHEN (SUM(value)) < 0 THEN -1 ELSE 1 END)) AS session_value
FROM islands
GROUP BY user_id, sid
""",
    doc="session window (30m gap) — Spark session_window(); oracle via "
        "gaps-and-islands (Spark-only streaming-capable operator, "
        "SURVEY 2.B.10 extension)",
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            cround(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@query(
    "events_json_extract",
    """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
           AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)
           AS max_k
FROM events
GROUP BY event_type
""",
    doc="semi-structured JSON payload extraction (extension; Spark "
        "get_json_object vs DuckDB json_extract_string)",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.max(k).cast("int").alias("max_k")
    )


@query(
    "window_groups_frame_rewrite",
    """
WITH r AS (SELECT event_id, event_type, user_id,
                 dense_rank() OVER (PARTITION BY event_type ORDER BY ts) AS dr
          FROM events WHERE event_id < 500)
SELECT event_id,
       CAST(SUM(user_id) OVER (
           PARTITION BY event_type ORDER BY dr
           RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS grp_sum
FROM r
""",
    doc=(
        "GROUPS window frame (ref WindowFrameUnits GROUPS, datafusion."
        "proto:654) — Spark has no GROUPS frames (SURVEY §7 risk 4); "
        "rewritten as RANGE over dense_rank (peer groups share a rank, so "
        "RANGE n PRECEDING on the rank == GROUPS n PRECEDING).  The "
        "oracle evaluates the same definition independently in DuckDB "
        "(which also lacks native GROUPS as of 1.0)"
    ),
)
def window_groups_frame_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    peers = Window.partitionBy("event_type").orderBy("ts")
    ranked = ev.withColumn("dr", F.dense_rank().over(peers))
    w = (
        Window.partitionBy("event_type")
        .orderBy("dr")
        .rangeBetween(-1, 0)
    )
    return ranked.select(
        "event_id", F.sum("user_id").over(w).alias("grp_sum")
    )


@query(
    "ext_udf_window",
    """
SELECT o_orderkey, o_custkey,
       CAST(SUM(o_orderkey % 97) OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS win_sum
FROM orders
WHERE o_custkey < 300
""",
    doc=(
        "pandas UDF applied OVER a bounded window frame — the reference "
        "registers window UDFs on every executor "
        "(ballista/executor/src/executor.rs:67-73; WindowExprNode fun_def, "
        "datafusion.proto:576-581).  Arrow-batched GROUPED_AGG UDF per "
        "frame; integer sum keeps values bit-exact vs the SQL-window "
        "oracle"
    ),
)
def ext_udf_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_ballista_spark.functions.pyudfs import window_mod_sum_udf

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    mod_sum = window_mod_sum_udf()
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        mod_sum((F.col("o_orderkey") % 97).cast("bigint")).over(w)
        .alias("win_sum"),
    )


@query(
    "events_rollup_multires",
    """
SELECT CASE WHEN GROUPING(h) = 0 THEN 'hour' ELSE 'day' END AS grain,
       CAST(COALESCE(h, d) AS TIMESTAMP) AS bucket_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       (floor(abs(SUM(value)) * 100 + 0.5) / 100e0
        * (CASE WHEN (SUM(value)) < 0 THEN -1 ELSE 1 END)) AS total_value
FROM (SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
             event_type, value FROM events)
GROUP BY GROUPING SETS ((h, d, event_type), (d, event_type))
""",
    doc=(
        "multi-resolution time rollup (the hypertable continuous-aggregate "
        "shape): hourly AND daily per-type aggregates in ONE pass via "
        "GROUPING SETS over date_trunc buckets — one shuffle computes all "
        "granularities with map-side partials, instead of one scan+shuffle "
        "per grain.  At 100 TB the coarse grains are nearly free riders on "
        "the finest grain's aggregation"
    ),
)
def events_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_ballista_spark.catalog import register_tables

    register_tables(spark, sf_dir, ("events",))
    return spark.sql(
        """
        SELECT CASE WHEN grouping(h) = 0 THEN 'hour' ELSE 'day' END AS grain,
               COALESCE(h, d) AS bucket_start,
               event_type,
               COUNT(*) AS n_events,
               (floor(abs(SUM(value)) * 100 + 0.5) / 100e0
                * (CASE WHEN (SUM(value)) < 0 THEN -1 ELSE 1 END))
                 AS total_value
        FROM (SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
                     event_type, value FROM events)
        GROUP BY GROUPING SETS ((h, d, event_type), (d, event_type))
        """
    )
