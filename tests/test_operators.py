"""Operator + window coverage queries vs DuckDB oracle."""

from __future__ import annotations

import pytest

from arrow_ballista_spark.queries import load_all
from tests.conftest import SF_DIR, assert_same_results

REG = load_all()
NAMES = sorted(
    n
    for n in REG
    if not n.startswith(("tpch_", "fn_", "ext_"))
)


@pytest.mark.parametrize("name", NAMES)
def test_operator_vs_duckdb(spark, oracle, name):
    qd = REG[name]
    df = qd.spark(spark, SF_DIR)
    if qd.oracle is None:
        assert len(df.collect()) >= 0  # rows-only (approx/sketch ops)
    else:
        assert_same_results(df, oracle, qd.oracle)
