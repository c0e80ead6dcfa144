"""TPC-H q1-q22, adapted to the driver's synthetic star schema.

The reference's flagship correctness suite is TPC-H q1-q22 verified against
golden answers (``/root/reference/benchmarks/src/bin/tpch.rs:1294-1400``,
queries ``benchmarks/queries/q*.sql``).  The driver's tables (TESTDATA.md)
carry a *subset* of TPC-H columns (no partsupp table, no
commit/receipt-dates, no phone/address/comment columns), so each query
keeps its reference's operator shape — the joins, subquery forms,
aggregates, and ordering that make it interesting — re-targeted at the
columns that exist:

 - q2/q11/q16/q20 (partsupp-based) are re-expressed through
   lineitem↔supplier/part;
 - q4/q12/q21 (commit/receipt-date) use shipdate-vs-orderdate lag;
 - q22 (phone prefix) uses a nationkey-derived country code.

Both the Spark side and the DuckDB oracle run the *same* ANSI SQL — TPC-H is
a SQL suite in the reference too, and `spark.sql` is exactly the Catalyst
entry point.  Dialect-shared SQL keeps semantics provably identical.
All money aggregates are rounded to 2dp on both sides so float
summation-order noise cannot flip the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from arrow_ballista_spark.catalog import register_tables
from arrow_ballista_spark.queries import query

REV = "l_extendedprice * (1 - l_discount)"


def _shared_sql(name: str, sql: str, doc: str = ""):
    """Register a query whose Spark impl and DuckDB oracle share one SQL text."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_tables(spark, sf_dir)
        return spark.sql(sql)

    run.__name__ = f"tpch_{name}"
    run.__doc__ = doc
    query(name, oracle=sql, doc=doc)(run)
    return run


# --- q1: pricing summary report (scan + filter + group-agg, ref q1.sql) ----
_shared_sql(
    "tpch_q1",
    f"""
SELECT
    l_returnflag,
    l_linestatus,
    (floor(abs(SUM(l_quantity)) * 100 + 0.5) / 100e0 * (CASE WHEN (SUM(l_quantity)) < 0 THEN -1 ELSE 1 END))                          AS sum_qty,
    (floor(abs(SUM(l_extendedprice)) * 100 + 0.5) / 100e0 * (CASE WHEN (SUM(l_extendedprice)) < 0 THEN -1 ELSE 1 END))                     AS sum_base_price,
    (floor(abs(SUM({REV})) * 100 + 0.5) / 100e0 * (CASE WHEN (SUM({REV})) < 0 THEN -1 ELSE 1 END))                               AS sum_disc_price,
    (floor(abs(SUM({REV} * (1 + l_tax))) * 100 + 0.5) / 100e0 * (CASE WHEN (SUM({REV} * (1 + l_tax))) < 0 THEN -1 ELSE 1 END))                 AS sum_charge,
    (floor(abs(AVG(l_quantity)) * 100 + 0.5) / 100e0 * (CASE WHEN (AVG(l_quantity)) < 0 THEN -1 ELSE 1 END))                          AS avg_qty,
    (floor(abs(AVG(l_extendedprice)) * 100 + 0.5) / 100e0 * (CASE WHEN (AVG(l_extendedprice)) < 0 THEN -1 ELSE 1 END))                     AS avg_price,
    (floor(abs(AVG(l_discount)) * 10000 + 0.5) / 10000e0 * (CASE WHEN (AVG(l_discount)) < 0 THEN -1 ELSE 1 END))                          AS avg_disc,
    COUNT(*)                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    doc="ref benchmarks/queries/q1.sql; two-phase hash agg (SURVEY 2.B.4)",
)

# --- q2: min-acctbal supplier per part (correlated scalar subquery) --------
_shared_sql(
    "tpch_q2",
    """
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM part, supplier, lineitem, nation, region
WHERE p_partkey = l_partkey
  AND s_suppkey = l_suppkey
  AND p_size = 15
  AND p_type = 'LARGE'
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND s_acctbal = (
      SELECT MIN(s_acctbal)
      FROM supplier s2, lineitem l2, nation n2, region r2
      WHERE l2.l_partkey = p_partkey
        AND s2.s_suppkey = l2.l_suppkey
        AND s2.s_nationkey = n2.n_nationkey
        AND n2.n_regionkey = r2.r_regionkey
        AND r2.r_name = 'EUROPE')
GROUP BY s_acctbal, s_name, n_name, p_partkey, p_name
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    doc="ref q2.sql shape (correlated scalar subquery) without partsupp",
)

# --- q3: shipping-priority (3-way join + top-k) ----------------------------
_shared_sql(
    "tpch_q3",
    f"""
SELECT
    l_orderkey,
    (floor(abs(SUM({REV})) * 100 + 0.5) / 100e0 * (CASE WHEN (SUM({REV})) < 0 THEN -1 ELSE 1 END)) AS revenue,
    o_orderdate
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    doc="ref q3.sql; join + agg + TakeOrderedAndProject (SURVEY 2.B.6)",
)

# --- q4: order-priority checking (EXISTS correlated) ------------------------
_shared_sql(
    "tpch_q4",
    """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (
      SELECT * FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="ref q4.sql; EXISTS -> left-semi join (SURVEY 2.B.3 subqueries)",
)

# --- q5: local-supplier volume (6-way join) ---------------------------------
_shared_sql(
    "tpch_q5",
    f"""
SELECT n_name, (floor(abs(SUM({REV})) * 100 + 0.5) / 100e0 * (CASE WHEN (SUM({REV})) < 0 THEN -1 ELSE 1 END)) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    doc="ref q5.sql; multi-join with broadcastable dims",
)

# --- q6: forecast revenue change (scan+filter+agg, no join) -----------------
_shared_sql(
    "tpch_q6",
    """
SELECT (floor(abs(SUM(l_extendedprice * l_discount)) * 100 + 0.5) / 100e0 * (CASE WHEN (SUM(l_extendedprice * l_discount)) < 0 THEN -1 ELSE 1 END)) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="ref q6.sql; pushed-down range predicates (SURVEY 2.B.1)",
)

# --- q7: volume shipping between two nations --------------------------------
_shared_sql(
    "tpch_q7",
    f"""
SELECT supp_nation, cust_nation, l_year, (floor(abs(SUM(volume)) * 100 + 0.5) / 100e0 * (CASE WHEN (SUM(volume)) < 0 THEN -1 ELSE 1 END)) AS revenue
FROM (
    SELECT
        n1.n_name AS supp_nation,
        n2.n_name AS cust_nation,
        CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
        {REV} AS volume
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey
      AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) AS shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    doc="ref q7.sql; self-join on nation + disjunctive join filter",
)

# --- q8: national market share ----------------------------------------------
_shared_sql(
    "tpch_q8",
    f"""
SELECT
    o_year,
    (floor(abs(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
          / SUM(volume)) * 10000 + 0.5) / 10000e0 * (CASE WHEN (SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
          / SUM(volume)) < 0 THEN -1 ELSE 1 END)) AS mkt_share
FROM (
    SELECT
        CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
        {REV} AS volume,
        n2.n_name AS nation
    FROM part, supplier, lineitem, orders, customer, nation n1, nation n2,
         region
    WHERE p_partkey = l_partkey
      AND s_suppkey = l_suppkey
      AND l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND c_nationkey = n1.n_nationkey
      AND n1.n_regionkey = r_regionkey
      AND r_name = 'AMERICA'
      AND s_nationkey = n2.n_nationkey
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      AND p_type = 'ECONOMY'
) AS all_nations
GROUP BY o_year
ORDER BY o_year
""",
    doc="ref q8.sql; 8-way join + conditional agg ratio",
)

# --- q9: product-type profit (no ps_supplycost -> discounted revenue) -------
_shared_sql(
    "tpch_q9",
    f"""
SELECT nation, o_year, (floor(abs(SUM(amount)) * 100 + 0.5) / 100e0 * (CASE WHEN (SUM(amount)) < 0 THEN -1 ELSE 1 END)) AS sum_profit
FROM (
    SELECT
        n_name AS nation,
        CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
        {REV} AS amount
    FROM part, supplier, lineitem, orders, nation
    WHERE s_suppkey = l_suppkey
      AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey
      AND s_nationkey = n_nationkey
      AND p_name LIKE '%red%'
) AS profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
    doc="ref q9.sql shape; LIKE filter on part name + multi-join agg",
)

# --- q10: returned-item reporting -------------------------------------------
_shared_sql(
    "tpch_q10",
    f"""
SELECT
    c_custkey, c_name,
    (floor(abs(SUM({REV})) * 100 + 0.5) / 100e0 * (CASE WHEN (SUM({REV})) < 0 THEN -1 ELSE 1 END)) AS revenue,
    c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-10-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    doc="ref q10.sql; join + agg + top-k",
)

# --- q11: important stock (HAVING vs uncorrelated scalar subquery) ----------
_shared_sql(
    "tpch_q11",
    """
SELECT l_partkey, (floor(abs(SUM(l_extendedprice * l_quantity)) * 100 + 0.5) / 100e0 * (CASE WHEN (SUM(l_extendedprice * l_quantity)) < 0 THEN -1 ELSE 1 END)) AS value
FROM lineitem, supplier, nation
WHERE l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_7'
GROUP BY l_partkey
HAVING SUM(l_extendedprice * l_quantity) > (
    SELECT SUM(l_extendedprice * l_quantity) * 0.001
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_7')
ORDER BY value DESC, l_partkey
""",
    doc="ref q11.sql shape (partsupp->lineitem); HAVING + scalar subquery",
)

# --- q12: shipping-mode priority (CASE conditional agg) ----------------------
_shared_sql(
    "tpch_q12",
    """
SELECT
    l_linestatus,
    CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
    CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
              AND o_orderpriority <> '2-HIGH'
             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
    doc="ref q12.sql shape (no l_shipmode); CASE WHEN aggregation",
)

# --- q13: customer order-count distribution (left outer + double agg) -------
_shared_sql(
    "tpch_q13",
    """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer
    LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
    GROUP BY c_custkey
) AS c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    doc="ref q13.sql; LEFT OUTER JOIN with join-time filter + re-agg",
)

# --- q14: promotion effect ----------------------------------------------------
_shared_sql(
    "tpch_q14",
    f"""
SELECT (floor(abs(100.00 * SUM(CASE WHEN p_type = 'PROMO' THEN {REV} ELSE 0 END)
    / SUM({REV})) * 10000 + 0.5) / 10000e0 * (CASE WHEN (100.00 * SUM(CASE WHEN p_type = 'PROMO' THEN {REV} ELSE 0 END)
    / SUM({REV})) < 0 THEN -1 ELSE 1 END)) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate < TIMESTAMP '1997-10-01'
""",
    doc="ref q14.sql; conditional-agg ratio over join",
)

# --- q15: top supplier (view/CTE + scalar-subquery max) ----------------------
_shared_sql(
    "tpch_q15",
    f"""
WITH revenue0 AS (
    SELECT l_suppkey AS supplier_no, (floor(abs(SUM({REV})) * 100 + 0.5) / 100e0 * (CASE WHEN (SUM({REV})) < 0 THEN -1 ELSE 1 END)) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue0
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
ORDER BY s_suppkey
""",
    doc="ref q15.sql (CREATE VIEW -> CTE, session-scoped per SURVEY §5)",
)

# --- q16: supplier-part relationship count (count distinct + NOT IN) ---------
_shared_sql(
    "tpch_q16",
    """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 4, 7, 10, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    doc="ref q16.sql shape; COUNT(DISTINCT) + NOT IN anti-join",
)

# --- q17: small-quantity-order revenue (correlated scalar AVG) ---------------
_shared_sql(
    "tpch_q17",
    """
SELECT (floor(abs(SUM(l_extendedprice) / 7e0) * 100 + 0.5) / 100e0 * (CASE WHEN (SUM(l_extendedprice) / 7e0) < 0 THEN -1 ELSE 1 END)) AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#3'
  AND l_quantity < (
      SELECT 0.5 * AVG(l2.l_quantity)
      FROM lineitem l2
      WHERE l2.l_partkey = p_partkey)
""",
    doc="ref q17.sql; correlated scalar subquery -> Catalyst decorrelation",
)

# --- q18: large-volume customers (IN subquery w/ HAVING) ---------------------
_shared_sql(
    "tpch_q18",
    """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       (floor(abs(SUM(l_quantity)) * 100 + 0.5) / 100e0 * (CASE WHEN (SUM(l_quantity)) < 0 THEN -1 ELSE 1 END)) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
""",
    doc="ref q18.sql; IN + HAVING semi-join then re-agg",
)

# --- q19: discounted revenue (disjunctive multi-range predicates) ------------
_shared_sql(
    "tpch_q19",
    f"""
SELECT (floor(abs(SUM({REV})) * 100 + 0.5) / 100e0 * (CASE WHEN (SUM({REV})) < 0 THEN -1 ELSE 1 END)) AS revenue
FROM lineitem, part
WHERE (p_partkey = l_partkey AND p_brand = 'Brand#12'
       AND l_quantity >= 1 AND l_quantity <= 11
       AND p_size BETWEEN 1 AND 5)
   OR (p_partkey = l_partkey AND p_brand = 'Brand#23'
       AND l_quantity >= 10 AND l_quantity <= 20
       AND p_size BETWEEN 1 AND 10)
   OR (p_partkey = l_partkey AND p_brand = 'Brand#34'
       AND l_quantity >= 20 AND l_quantity <= 30
       AND p_size BETWEEN 1 AND 15)
""",
    doc="ref q19.sql; OR-of-conjunctions join predicate",
)

# --- q20: potential part promotion (nested IN + HAVING) ----------------------
_shared_sql(
    "tpch_q20",
    """
SELECT s_name, s_acctbal
FROM supplier, nation
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey
    HAVING SUM(l_quantity) > 50)
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_4'
ORDER BY s_name
""",
    doc="ref q20.sql shape; nested IN subquery with HAVING",
)

# --- q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS) -------------
_shared_sql(
    "tpch_q21",
    """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND EXISTS (
      SELECT * FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT * FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > l1.l_shipdate)
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_9'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
    doc="ref q21.sql shape; EXISTS + NOT EXISTS correlated anti-join",
)

# --- q22: global sales opportunity (NOT EXISTS + scalar subquery) -------------
_shared_sql(
    "tpch_q22",
    """
SELECT cntrycode, COUNT(*) AS numcust, (floor(abs(SUM(c_acctbal)) * 100 + 0.5) / 100e0 * (CASE WHEN (SUM(c_acctbal)) < 0 THEN -1 ELSE 1 END)) AS totacctbal
FROM (
    SELECT c_nationkey % 5 AS cntrycode, c_acctbal
    FROM customer
    WHERE c_nationkey % 5 IN (0, 1, 2)
      AND c_acctbal > (
          SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.00)
      AND NOT EXISTS (
          SELECT * FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
) AS custsale
GROUP BY cntrycode
ORDER BY cntrycode
""",
    doc="ref q22.sql shape (nationkey-derived country code, no c_phone)",
)

# --- decimal parity family ---------------------------------------------------
# The reference's TPC-H schemas are DECIMAL(15,2)-native
# (benchmarks/src/bin/tpch.rs:861-960) while the driver's parquet is
# double-typed, so the suite above never exercises Spark's decimal
# precision-promotion rules (SURVEY.md §7 risk 1).  These queries cast the
# money columns to DECIMAL(15,2) and run the arithmetic in decimal —
# additions stay scale 2, products widen to scale 4/6, sums widen precision
# — all EXACT in both engines, so the shared SQL hash-matches bit-for-bit.
# Final outputs cast decimal -> double (correctly-rounded nearest in both
# engines: same exact decimal in, same double out).  Division promotion is
# engine-divergent (Spark yields DECIMAL(38,s), DuckDB DOUBLE), so division
# semantics are pinned by tests/test_decimal.py instead of a value oracle.

_shared_sql(
    "tpch_q1_decimal",
    """
WITH d AS (SELECT l_returnflag, l_linestatus,
                  CAST(l_quantity      AS DECIMAL(15,2)) AS qty,
                  CAST(l_extendedprice AS DECIMAL(15,2)) AS price,
                  CAST(l_discount      AS DECIMAL(15,2)) AS disc,
                  CAST(l_tax           AS DECIMAL(15,2)) AS tax
           FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02')
SELECT l_returnflag, l_linestatus,
       CAST(SUM(qty)   AS DOUBLE)                            AS sum_qty,
       CAST(SUM(price) AS DOUBLE)                            AS sum_base_price,
       CAST(SUM(price * (1 - disc)) AS DOUBLE)               AS sum_disc_price,
       CAST(SUM(price * (1 - disc) * (1 + tax)) AS DOUBLE)   AS sum_charge,
       CAST(COUNT(*) AS BIGINT)                              AS count_order
FROM d
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    doc="ref q1.sql with the reference's DECIMAL(15,2) money types "
        "(tpch.rs:861-960): decimal sum/product promotion, exact values",
)

_shared_sql(
    "decimal_promotion",
    """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(15,2))
            * CAST(l_quantity AS DECIMAL(15,2)) AS DOUBLE)      AS mul_scale4,
       CAST(CAST(l_extendedprice AS DECIMAL(15,2))
            + CAST(l_tax AS DECIMAL(15,2)) AS DOUBLE)           AS add_scale2,
       CAST(CAST(l_extendedprice AS DECIMAL(15,2))
            - CAST(l_discount AS DECIMAL(15,2)) AS DOUBLE)      AS sub_scale2,
       CAST(CAST(CAST(l_extendedprice AS DECIMAL(15,2))
                 AS DECIMAL(38,6)) AS DOUBLE)                   AS widen_cast
FROM lineitem
WHERE l_orderkey < 400
""",
    doc="per-row decimal mul/add/sub promotion + lossless widening cast "
        "(exact scale-2/4 arithmetic, hash-compared bit-for-bit)",
)

_shared_sql(
    "decimal_agg",
    """
SELECT o_orderstatus,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_total,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS min_total,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS max_total,
       CAST(COUNT(*) AS BIGINT)                                 AS n_orders
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="decimal aggregate family: SUM widens precision (never overflows "
        "silently), MIN/MAX keep scale — exact in both engines",
)
