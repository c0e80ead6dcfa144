"""Function-family queries vs DuckDB + compat-mapping unit checks."""

from __future__ import annotations

import pytest

from arrow_ballista_spark.functions.compat import (
    AGGREGATE_FUNCTIONS,
    SCALAR_FUNCTIONS,
    WINDOW_FUNCTIONS,
    register_compat_functions,
)
from arrow_ballista_spark.queries import load_all
from tests.conftest import SF_DIR, assert_same_results

REG = load_all()
FN = sorted(n for n in REG if n.startswith("fn_"))


@pytest.mark.parametrize("name", FN)
def test_function_family_vs_duckdb(spark, oracle, name):
    qd = REG[name]
    df = qd.spark(spark, SF_DIR)
    if qd.oracle is None:
        assert len(df.collect()) >= 0
    else:
        assert_same_results(df, oracle, qd.oracle)


def test_scalar_contract_covers_datafusion_enum():
    """Every scalar name of the vendored enum (datafusion.proto:448-521)
    has a mapping."""
    enum_names = {
        # math
        "abs", "acos", "asin", "atan", "atan2", "ceil", "cos", "exp",
        "floor", "ln", "log", "log10", "log2", "power", "round", "signum",
        "sin", "sqrt", "tan", "trunc", "random",
        # string
        "ascii", "bit_length", "btrim", "character_length", "chr", "concat",
        "concat_with_separator", "initcap", "left", "lower", "lpad", "ltrim",
        "octet_length", "repeat", "replace", "reverse", "right", "rpad",
        "rtrim", "split_part", "starts_with", "strpos", "substr", "to_hex",
        "translate", "trim", "upper",
        # regex
        "regexp_match", "regexp_replace",
        # crypto/misc
        "digest", "md5", "sha224", "sha256", "sha384", "sha512", "uuid",
        # datetime
        "date_part", "date_trunc", "date_bin", "to_timestamp",
        "to_timestamp_millis", "to_timestamp_micros", "to_timestamp_seconds",
        "from_unixtime", "now", "current_date", "current_time",
        # other
        "nullif", "coalesce", "array", "struct", "arrow_typeof",
    }
    missing = enum_names - set(SCALAR_FUNCTIONS) - {"struct"}
    # struct maps via F.struct under key "struct"
    assert "struct" in SCALAR_FUNCTIONS
    assert not missing, f"unmapped scalar functions: {sorted(missing)}"
    assert len(enum_names) >= 73 - 4  # enum has a few aliases


def test_compat_functions_evaluate(spark):
    """Spot-check semantics of the tricky mappings on literal rows."""
    from pyspark.sql import functions as F

    from arrow_ballista_spark.functions.compat import (
        date_bin,
        digest,
        strpos,
        trunc_numeric,
    )

    df = spark.createDataFrame(
        [(-2.7, 2.7, "hello world", "2024-01-01 00:47:13")],
        "neg double, pos double, s string, tstr string",
    ).withColumn("ts", F.col("tstr").cast("timestamp_ntz"))
    row = df.select(
        trunc_numeric("neg").alias("tn"),
        trunc_numeric("pos").alias("tp"),
        strpos(F.col("s"), F.lit("world")).alias("sp"),
        digest("s", "sha256").alias("dg"),
        date_bin(1800, "ts", "2024-01-01").alias("db"),
        SCALAR_FUNCTIONS["arrow_typeof"]("s").alias("ty"),
        SCALAR_FUNCTIONS["to_hex"](F.lit(255)).alias("hx"),
    ).collect()[0]
    assert row.tn == -2.0 and row.tp == 2.0
    assert row.sp == 7
    assert bytes(row.dg).startswith(bytes.fromhex("b94d27b9"))  # sha256("hello world"), BINARY like DataFusion
    assert str(row.db) == "2024-01-01 00:30:00"
    assert row.ty == "string"
    assert row.hx == "FF"


def test_sql_shims_register_and_run(spark):
    register_compat_functions(spark)
    r = spark.sql(
        "SELECT strpos('hello', 'll') AS a, to_hex(255) AS b, "
        "trunc_num(-2.7) AS c"
    ).collect()[0]
    assert r.a == 3 and r.b == "ff" and r.c == -2.0


def test_agg_window_maps_are_spark_native(spark):
    from pyspark.sql import functions as F

    for spark_name in set(AGGREGATE_FUNCTIONS.values()) | set(
        WINDOW_FUNCTIONS.values()
    ):
        assert hasattr(F, spark_name), spark_name


def test_regexp_match_capture_groups(spark):
    """DataFusion/Postgres regexp_match returns the capture-group texts
    of the FIRST match when the pattern has groups, [whole match] when it
    has none, and NULL when unmatched — the grouped case regressed to
    [group 0] in the first shim."""
    from pyspark.sql import functions as F

    from arrow_ballista_spark.functions.compat import regexp_match

    df = spark.createDataFrame(
        [("foobarbequebaz apple12",)], "s string"
    )
    row = df.select(
        regexp_match("s", r"(bar)(beque)").alias("grouped"),
        regexp_match("s", r"bar").alias("plain"),
        regexp_match("s", r"([a-z]+)(\d+)").alias("worded"),
        regexp_match("s", r"(?:foo)(bar)").alias("noncapture"),
        regexp_match("s", r"nomatch").alias("miss"),
    ).collect()[0]
    assert row.grouped == ["bar", "beque"]
    assert row.plain == ["bar"]
    assert row.worded == ["apple", "12"]
    assert row.noncapture == ["bar"]  # (?:...) is not a capture group
    assert row.miss is None


def test_regexp_match_nonparticipating_and_named_groups(spark):
    """DataFusion/Postgres yield NULL for a capture group that did not
    participate in the match — '(a)|(b)' on 'a' is ['a', NULL], not
    ['a', ''] — and '(?<name>...)' named groups capture like numbered
    ones.  An empty-but-participating group stays '' (not NULL)."""
    from arrow_ballista_spark.functions.compat import regexp_match

    df = spark.createDataFrame([("a", "xy")], "s string, t string")
    row = df.select(
        regexp_match("s", r"(a)|(b)").alias("alt"),
        regexp_match("s", r"(a)(b?)").alias("empty_part"),
        regexp_match("t", r"(?<first>x)(?<second>y)").alias("named"),
        regexp_match("s", r"(q)|(a)").alias("alt2"),
        regexp_match("s", r"(b)?(a)").alias("opt"),
    ).collect()[0]
    assert row.alt == ["a", None]
    assert row.empty_part == ["a", ""]  # participated, matched empty
    assert row.named == ["x", "y"]
    assert row.alt2 == [None, "a"]
    assert row.opt == [None, "a"]
