"""DataFusion-compatible scalar function surface.

The reference's SQL dialect exposes the 73 built-in scalar functions of the
vendored enum (``/root/reference/ballista/core/proto/datafusion.proto:448-521``)
plus the aggregate (``:529-557``) and window (``:569-581``) function sets.
This module maps every one of them onto the idiomatic Spark equivalent:

- :data:`SCALAR_FUNCTIONS` — name → Column-builder (DataFrame API surface);
- :data:`SQL_SHIMS` — ``CREATE TEMPORARY FUNCTION`` statements (Spark ≥4.0
  SQL UDFs, pure SQL bodies so they stay inside whole-stage codegen — no
  Python round-trips) for names Spark SQL lacks;
- :data:`AGGREGATE_FUNCTIONS` / :data:`WINDOW_FUNCTIONS` — name maps for the
  agg/window sets (all native in Spark).

Semantics notes (SURVEY.md §2.B.9):
- ``from_unixtime`` here follows DataFusion (seconds → timestamp), *not*
  Spark's string-returning builtin;
- ``trunc`` is numeric truncation toward zero (Spark's ``trunc`` is a date
  function);
- ``date_bin(stride, ts, origin)`` is implemented as epoch-micros floor
  arithmetic, identical to DataFusion's definition.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def _col(c):
    return F.col(c) if isinstance(c, str) else c


# --- custom builders where Spark's name/semantics differ -------------------

def _lit(v) -> Column:
    """Wrap a Python value as a literal Column (pass Columns through)."""
    return v if isinstance(v, Column) else F.lit(v)


def strpos(s, sub) -> Column:
    """1-based position of substring, 0 if absent (DF Strpos).

    Built with the Column API (not SQL-fragment splicing): rendering a
    Column via the private ``_jc.toString()`` breaks under Spark Connect,
    and quoting literals via ``repr`` produces invalid SQL for strings
    containing quotes."""
    return F.instr(_col(s), sub)


def trunc_numeric(c) -> Column:
    """Truncate toward zero (DF Trunc; Spark's trunc is date-only)."""
    c = _col(c)
    return F.when(c < 0, F.ceil(c)).otherwise(F.floor(c)).cast("double")


def date_bin(stride_seconds: int, ts, origin: str = "1970-01-01") -> Column:
    """DataFusion date_bin: floor(ts - origin, stride) + origin.

    Casts through TIMESTAMP_LTZ because ``unix_micros`` rejects NTZ inputs;
    the engine session runs in UTC so the conversion is value-preserving.
    """
    ts = _col(ts)
    us = F.unix_micros(ts.cast("timestamp_ltz"))
    o = F.unix_micros(F.lit(origin).cast("timestamp_ltz"))
    stride_us = int(stride_seconds) * 1_000_000
    return F.timestamp_micros(
        o + F.floor((us - o) / stride_us).cast("bigint") * stride_us
    )


def _py_pattern(p: str) -> str:
    """Translate Java/Rust named groups ``(?<name>`` to Python's
    ``(?P<name>`` (leaving lookbehinds ``(?<=`` / ``(?<!`` intact) so the
    driver-side compile sees the same group structure the engines do."""
    import re as _re

    return _re.sub(r"\(\?<(?![=!])", "(?P<", p)


def _groups_always_participate(p: str) -> bool:
    """True when every capture group provably participates in any match:
    no alternation and no ``)`` followed by a zero-allowing quantifier
    (``?``, ``*``, ``{0``).  Conservative — a false negative only routes
    to the exact (slower) path, never to a wrong answer."""
    import re as _re

    return not _re.search(r"(?<!\\)\||(?<!\\)\)[?*]|(?<!\\)\)\{0", p)


def regexp_match(s, p: str) -> Column:
    """DataFusion/Postgres ``regexp_match``: for the FIRST match, the
    array of capture-group texts when the pattern has groups, else
    ``[whole match]``; NULL when unmatched; NULL per ELEMENT for a
    non-participating group (e.g. ``(a)|(b)`` on ``'a'`` →
    ``['a', NULL]``, DataFusion ``regexpmatch.rs``).

    Three paths, chosen driver-side from the literal pattern:
    1. every group always participates → JVM ``regexp_extract`` per
       group (codegen fast path; '' and NULL can't diverge here);
    2. participation is ambiguous (alternation / optional groups) but
       Python can compile the pattern → Arrow-batched ``pandas_udf``
       with exact ``Matcher.group(i) is None`` semantics;
    3. Java-only constructs Python can't compile (possessive
       quantifiers etc.) → JVM path with the group count read from the
       raw pattern, counting ``(?<name>`` as capturing; documented ''
       vs NULL divergence for non-participating groups only."""
    import re as _re

    pp = _py_pattern(p)
    try:
        compiled = _re.compile(pp)
        n_groups: int | None = compiled.groups
    except _re.error:
        compiled, n_groups = None, None

    if compiled is not None and not _groups_always_participate(p):
        # Exact path: per-element NULLs for skipped groups.
        from pyspark.sql.functions import pandas_udf

        def _match(col):  # pd.Series -> pd.Series (hints omitted: the
            # module-wide `from __future__ import annotations` turns them
            # into strings pandas_udf's hint inference can't resolve)
            rx = _re.compile(pp)

            def one(v):
                if v is None:
                    return None
                m = rx.search(v)
                if m is None:
                    return None
                return list(m.groups()) if rx.groups else [m.group(0)]

            return col.map(one)

        return pandas_udf(_match, "array<string>")(_col(s))

    if n_groups is None:
        n_groups = len(_re.findall(r"(?<!\\)\((?!\?)", p)) + len(
            _re.findall(r"\(\?<(?![=!])", p)
        )
    parts = (
        [F.regexp_extract(_col(s), p, i) for i in range(1, n_groups + 1)]
        if n_groups
        else [F.regexp_extract(_col(s), p, 0)]
    )
    return F.when(_col(s).rlike(p), F.array(*parts))


def digest(c, algorithm) -> Column:
    """DF digest(expr, algo) — md5/sha224/sha256/sha384/sha512.

    Returns BINARY like DataFusion (Spark's md5/sha2 emit hex STRINGS —
    unhex restores the reference type so octet_length and binary
    comparisons match)."""
    algo = algorithm.lower() if isinstance(algorithm, str) else algorithm
    c = _col(c)
    if algo == "md5":
        return F.unhex(F.md5(c.cast("binary")))
    if algo in ("sha224", "sha256", "sha384", "sha512"):
        return F.unhex(F.sha2(c.cast("binary"), int(algo[3:])))
    raise ValueError(f"unsupported digest algorithm: {algorithm}")


# --- the 73-function contract (datafusion.proto:448-521) --------------------

SCALAR_FUNCTIONS: dict[str, object] = {
    # math (proto 449-468, 493, 513-514)
    "abs": F.abs,
    "acos": F.acos,
    "asin": F.asin,
    "atan": F.atan,
    "atan2": F.atan2,
    "ceil": F.ceil,
    "cos": F.cos,
    "exp": F.exp,
    "floor": F.floor,
    "ln": lambda c: F.log(_col(c)),
    "log": lambda b, c=None: F.log(b, _col(c)) if c is not None else F.log10(_col(b)),
    "log10": F.log10,
    "log2": F.log2,
    "power": F.pow,
    "round": F.round,
    "signum": F.signum,
    "sin": F.sin,
    "sqrt": F.sqrt,
    "tan": F.tan,
    "trunc": trunc_numeric,
    "random": F.rand,
    # string (proto 469-512)
    "ascii": F.ascii,
    "bit_length": F.bit_length,
    "btrim": lambda s, t=" ": F.btrim(_col(s), _lit(t)),
    "character_length": F.char_length,
    "char_length": F.char_length,
    "chr": lambda c: F.chr(_col(c)),
    "concat": F.concat,
    "concat_with_separator": F.concat_ws,
    "concat_ws": F.concat_ws,
    "initcap": F.initcap,
    "left": lambda s, n: F.left(_col(s), _lit(n)),
    "lower": F.lower,
    "lpad": F.lpad,
    "ltrim": F.ltrim,
    "octet_length": F.octet_length,
    "repeat": lambda s, n: F.repeat(_col(s), n),
    "replace": lambda s, a, b: F.replace(_col(s), F.lit(a), F.lit(b)),
    "reverse": F.reverse,
    "right": lambda s, n: F.right(_col(s), _lit(n)),
    "rpad": F.rpad,
    "rtrim": F.rtrim,
    "split_part": lambda s, d, n: F.split_part(_col(s), F.lit(d), F.lit(n)),
    "starts_with": lambda s, p: F.startswith(_col(s), F.lit(p)),
    "strpos": strpos,
    "substr": lambda s, pos, ln=None: (
        F.substring(_col(s), pos, ln)
        if ln is not None
        else F.substr(_col(s), _lit(pos))
    ),
    "to_hex": lambda c: F.hex(_col(c)),
    "translate": lambda s, frm, to: F.translate(_col(s), frm, to),
    "trim": F.trim,
    "upper": F.upper,
    # regex (proto 477, 510)
    "regexp_match": regexp_match,
    "regexp_replace": lambda s, p, r: F.regexp_replace(_col(s), p, r),
    # crypto / misc (proto 495, 515-520, 504)
    "digest": digest,
    "md5": lambda c: F.md5(_col(c).cast("binary")),
    "sha224": lambda c: F.sha2(_col(c).cast("binary"), 224),
    "sha256": lambda c: F.sha2(_col(c).cast("binary"), 256),
    "sha384": lambda c: F.sha2(_col(c).cast("binary"), 384),
    "sha512": lambda c: F.sha2(_col(c).cast("binary"), 512),
    "uuid": lambda: F.expr("uuid()"),
    # date/time (proto 478-480, 496-503, 521)
    "date_part": lambda part, c: F.date_part(F.lit(part), _col(c)),
    "date_trunc": lambda unit, c: F.date_trunc(unit, _col(c)),
    "date_bin": date_bin,
    "to_timestamp": lambda c: F.to_timestamp(_col(c)),
    "to_timestamp_millis": lambda c: F.timestamp_millis(_col(c).cast("bigint")),
    "to_timestamp_micros": lambda c: F.timestamp_micros(_col(c).cast("bigint")),
    "to_timestamp_seconds": lambda c: F.timestamp_seconds(_col(c).cast("bigint")),
    "from_unixtime": lambda c: F.timestamp_seconds(_col(c).cast("bigint")),
    "now": F.now,
    "current_date": F.current_date,
    "current_time": lambda: F.date_format(F.now(), "HH:mm:ss"),
    # conditional / construction (proto 481-492, 505-506, 494)
    "nullif": lambda a, b: F.nullif(_col(a), _col(b)),
    "coalesce": F.coalesce,
    "array": F.array,
    "make_array": F.array,
    "struct": F.struct,
    "arrow_typeof": lambda c: F.typeof(_col(c)),
}

# Aggregate contract (datafusion.proto:529-557) — all Spark-native.
AGGREGATE_FUNCTIONS: dict[str, str] = {
    "min": "min",
    "max": "max",
    "sum": "sum",
    "avg": "avg",
    "count": "count",
    "approx_distinct": "approx_count_distinct",
    "array_agg": "collect_list",
    "variance": "var_samp",
    "variance_pop": "var_pop",
    "covariance": "covar_samp",
    "covariance_pop": "covar_pop",
    "stddev": "stddev_samp",
    "stddev_pop": "stddev_pop",
    "correlation": "corr",
    "approx_percentile_cont": "percentile_approx",
    "approx_percentile_cont_with_weight": "percentile_approx",
    "approx_median": "percentile_approx",
    "median": "median",
    "grouping": "grouping",
    "first_value": "first",
    "last_value": "last",
    "bit_and": "bit_and",
    "bit_or": "bit_or",
    "bit_xor": "bit_xor",
    "bool_and": "bool_and",
    "bool_or": "bool_or",
}

# Window contract (datafusion.proto:569-581) — all Spark-native.
WINDOW_FUNCTIONS: dict[str, str] = {
    "row_number": "row_number",
    "rank": "rank",
    "dense_rank": "dense_rank",
    "percent_rank": "percent_rank",
    "cume_dist": "cume_dist",
    "ntile": "ntile",
    "lag": "lag",
    "lead": "lead",
    "first_value": "first_value",
    "last_value": "last_value",
    "nth_value": "nth_value",
}

# SQL-level shims: pure-SQL temporary functions (Spark >=4.0 SQL UDFs run
# JVM-side inside codegen — the UDF slow path is avoided entirely).
SQL_SHIMS: dict[str, str] = {
    "strpos": (
        "CREATE OR REPLACE TEMPORARY FUNCTION strpos(s STRING, sub STRING) "
        "RETURNS INT RETURN instr(s, sub)"
    ),
    "to_hex": (
        "CREATE OR REPLACE TEMPORARY FUNCTION to_hex(x BIGINT) "
        "RETURNS STRING RETURN lower(hex(x))"
    ),
    # NOTE: no arrow_typeof SQL shim — SQL UDF parameters are statically
    # typed, so a STRING-parameter shim would coerce every argument and
    # always report "string" (unlike DataFusion's generic arrow_typeof).
    # The DataFrame-API mapping above (F.typeof) is the real equivalent.
    "trunc_num": (
        "CREATE OR REPLACE TEMPORARY FUNCTION trunc_num(x DOUBLE) "
        "RETURNS DOUBLE RETURN CAST(CAST(x AS BIGINT) AS DOUBLE)"
    ),
    "date_bin_seconds": (
        "CREATE OR REPLACE TEMPORARY FUNCTION date_bin_seconds("
        "stride_sec BIGINT, ts TIMESTAMP_NTZ, origin TIMESTAMP_NTZ) "
        "RETURNS TIMESTAMP_NTZ RETURN CAST(timestamp_micros("
        "unix_micros(CAST(origin AS TIMESTAMP_LTZ)) + "
        "CAST(floor((unix_micros(CAST(ts AS TIMESTAMP_LTZ)) - "
        "unix_micros(CAST(origin AS TIMESTAMP_LTZ))) / (stride_sec * 1000000)) "
        "AS BIGINT) * stride_sec * 1000000) AS TIMESTAMP_NTZ)"
    ),
}


def register_compat_functions(spark: SparkSession) -> None:
    """Install the SQL-level shims into the session (reference analogue:
    executor-side UDF registries, ``ballista/executor/src/executor.rs:67-73``)."""
    for stmt in SQL_SHIMS.values():
        spark.sql(stmt)
