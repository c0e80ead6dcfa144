"""TPC-H suite vs DuckDB oracle (mirrors the driver's t2 gate)."""

from __future__ import annotations

import pytest

from arrow_ballista_spark.queries import load_all
from tests.conftest import SF_DIR, assert_same_results

REG = load_all()
TPCH = sorted(
    n for n in REG if n.startswith("tpch_") or n.startswith("decimal_")
)


@pytest.mark.parametrize("name", TPCH)
def test_tpch_vs_duckdb(spark, oracle, name):
    qd = REG[name]
    df = qd.spark(spark, SF_DIR)
    assert qd.oracle is not None
    assert_same_results(df, oracle, qd.oracle)
