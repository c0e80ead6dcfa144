"""Decimal semantics pinning (SURVEY §7 risk 1).

The cross-engine value checks live in the decimal_* / tpch_q1_decimal
oracled queries (exact scale-2/4/6 arithmetic).  Division promotion is
engine-divergent — Spark yields DECIMAL, DuckDB DOUBLE — so Spark's
documented promotion rules are pinned HERE instead:
result precision/scale for +, *, / per
https://spark.apache.org/docs/latest/sql-ref-ansi-compliance.html and
the reference's decimal-native TPC-H schemas (tpch.rs:861-960).
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType


def _dec(spark, s: str, typ: str = "decimal(15,2)"):
    return F.lit(s).cast(typ)


def test_decimal_promotion_dtypes(spark):
    df = spark.range(1).select(
        (_dec(spark, "1.10") + _dec(spark, "2.20")).alias("add"),
        (_dec(spark, "1.10") * _dec(spark, "2.20")).alias("mul"),
        (_dec(spark, "1.10") / _dec(spark, "2.20")).alias("div"),
    )
    t = {f.name: f.dataType for f in df.schema.fields}
    # add: max(s1,s2) scale, +1 integer digit -> DECIMAL(16,2)
    assert t["add"] == DecimalType(16, 2)
    # mul: p1+p2+1, s1+s2 -> DECIMAL(31,4)
    assert t["mul"] == DecimalType(31, 4)
    # div: precision/scale from Spark's division rule (scale >= 6 here)
    assert isinstance(t["div"], DecimalType) and t["div"].scale >= 6


def test_decimal_div_value_half_up(spark):
    row = (
        spark.range(1)
        .select(
            (_dec(spark, "1.00") / _dec(spark, "3.00")).alias("third"),
            (_dec(spark, "7.00") / _dec(spark, "2.00")).alias("exact"),
        )
        .first()
    )
    # (15,2)/(15,2) -> DECIMAL(33,18): rounded HALF_UP at scale 18
    assert row["third"] == Decimal("0.333333333333333333")
    assert row["exact"] == Decimal("3.5")


def test_decimal_sum_widens_precision(spark):
    df = spark.range(1).select(_dec(spark, "99.99").alias("d")).groupBy().agg(
        F.sum("d").alias("s")
    )
    t = df.schema["s"].dataType
    # SUM(DECIMAL(p,s)) -> DECIMAL(p+10, s): headroom for 10^10 rows
    assert t == DecimalType(25, 2)
