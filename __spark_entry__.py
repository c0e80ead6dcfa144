"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full registry from
``arrow_ballista_spark.queries`` (one entry per SURVEY.md §2 operator,
each with a DuckDB oracle where SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from arrow_ballista_spark.queries import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H q1 shape) on /root/testdata/sf0.001."""
    reg = load_all()
    return reg["tpch_q1"].spark(spark, "/root/testdata/sf0.001")


def _released(fn: Callable[[SparkSession, str], DataFrame]):
    """Free the previous query's operator-internal persist()s before
    building the next plan, so caches don't accumulate over a 100+-query
    harness run in one session (the handles are lazy — the operator itself
    can never unpersist; see operators/caching.py)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from arrow_ballista_spark.operators.caching import release_caches

        release_caches()
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _released(qd.spark) for name, qd in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: qd.oracle for name, qd in load_all().items() if qd.oracle is not None
    }
