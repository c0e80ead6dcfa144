"""Multi-dimensional data layout: Z-order (Morton) clustering for scans.

A single-column sort gives parquet min/max file pruning on ONE predicate
column; every other column's range per file stays full-width, so a filter
on it touches every file.  Interleaving the bits of several columns into
one Morton key and range-partition-sorting by it bounds EVERY indexed
column's range per file (files become hyper-rectangular tiles), which is
what makes `WHERE x BETWEEN .. AND y BETWEEN ..` scans skip most of a
100 TB table no matter which of the indexed dimensions the filter hits.
Same idea as Delta/Iceberg ``OPTIMIZE ZORDER BY``; the reference leaves
file layout entirely to the user (its listing tables map one file to one
partition, ``docs/source/user-guide/tuning-guide.md:27-35``).

Scale shape: the key is a pure JVM expression (one global min/max agg —
a 1-row broadcast — then bit arithmetic, whole-stage codegen'd); the
rewrite is ONE range-partitioned shuffle + in-partition sort, the same
cost envelope as any global sort.  Nothing collects to the driver.

The bit interleave is generated as a static expression from the same
Python helper for both engines (Spark ``shiftleft/shiftright`` names,
DuckDB ``<<``/``>>`` operators), so the key is value-exact and the
registry entry (`ext_zorder_key`) hash-matches the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _morton_expr(scaled: list[str], bits: int, spark_side: bool) -> str:
    """Bit-interleave expression over pre-scaled ``[0, 2**bits)`` ints.

    Bit ``i`` of scaled column ``j`` lands at position ``i*k + (k-1-j)``
    (first column owns the most significant bit of each group), the
    standard Morton layout.  Emitted with engine-local operators from ONE
    generator so Spark and DuckDB compute identical keys.
    """
    k = len(scaled)
    terms = []
    for i in range(bits):
        for j, c in enumerate(scaled):
            pos = i * k + (k - 1 - j)
            if spark_side:
                bit = f"(shiftright({c}, {i}) & 1)"
                terms.append(f"shiftleft({bit}, {pos})" if pos else bit)
            else:
                bit = f"(({c} >> {i}) & 1)"
                terms.append(f"({bit} << {pos})" if pos else bit)
    return " | ".join(terms)


def _scale_expr(col: str, mn: str, mx: str, bits: int, spark_side: bool) -> str:
    """Min-max scale an integer column to ``[0, 2**bits)`` with pure
    int64 arithmetic (no float division — bit-identical across engines).
    Safe to ~2**47 key range at bits=16 before the multiply could
    overflow int64."""
    top = (1 << bits) - 1
    div = "DIV" if spark_side else "//"
    return (
        f"CASE WHEN {mx} = {mn} THEN 0 "
        f"ELSE (({col} - {mn}) * {top}) {div} ({mx} - {mn}) END"
    )


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16, key_col: str = "zkey"
) -> DataFrame:
    """Append the Morton interleave of ``cols`` (integer columns) as
    ``key_col``.  One global min/max aggregation (k*2 scalars, broadcast
    as a 1-row literal join) then map-only bit arithmetic."""
    stats = df.agg(
        *[F.min(c).alias(f"__mn_{c}") for c in cols],
        *[F.max(c).alias(f"__mx_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    scaled = [
        _scale_expr(c, f"__mn_{c}", f"__mx_{c}", bits, spark_side=True)
        for c in cols
    ]
    sc_names = [f"__s{j}" for j in range(len(cols))]
    for n, e in zip(sc_names, scaled):
        out = out.withColumn(n, F.expr(e))
    out = out.withColumn(
        key_col,
        F.expr(_morton_expr(sc_names, bits, spark_side=True)).cast("long"),
    )
    drop = sc_names + [f"__mn_{c}" for c in cols] + [f"__mx_{c}" for c in cols]
    return out.drop(*drop)


def zorder_oracle_sql(
    table: str, cols: list[str], bits: int = 16, key_col: str = "zkey"
) -> str:
    """DuckDB oracle for :func:`zorder_key` over ``table`` — generated
    from the same scale/interleave helpers, so value-exact."""
    mns = [f"MIN({c}) AS mn_{c}" for c in cols]
    mxs = [f"MAX({c}) AS mx_{c}" for c in cols]
    scaled = [
        f"{_scale_expr(c, f'mn_{c}', f'mx_{c}', bits, spark_side=False)} AS s{j}"
        for j, c in enumerate(cols)
    ]
    sc_names = [f"s{j}" for j in range(len(cols))]
    cols_sql = ", ".join(cols)
    return f"""
WITH stats AS (SELECT {", ".join(mns + mxs)} FROM {table}),
scaled AS (SELECT {cols_sql}, {", ".join(scaled)} FROM {table}, stats)
SELECT {cols_sql},
       CAST({_morton_expr(sc_names, bits, spark_side=False)} AS BIGINT)
         AS {key_col}
FROM scaled
"""


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered by the
    Z-order of ``cols``: range-partition on the Morton key (contiguous
    key ranges -> spatially tight tiles), sort within each partition so
    parquet row-group stats are tight too, drop the key, write.  One
    shuffle, one sort — the standard global-sort cost envelope."""
    keyed = zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
