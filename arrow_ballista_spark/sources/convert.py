"""Dataset format conversion — parity with the reference's
``tpch convert`` mode (``benchmarks/src/bin/tpch.rs:731-800``): read
delimited text (TPC-H ``.tbl`` = pipe-delimited, trailing delimiter),
optionally repartition, write csv/parquet with a chosen compression.

Spark-first: the conversion is a plain read → (repartition) → write plan,
so it distributes and scales like any other query; the reference's
``--partitions N`` round-robin repartition maps to ``df.repartition(n)``
and its writer compression table maps to the writer ``compression``
option (snappy/gzip/zstd/lz4/none — Spark names).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = ("parquet", "csv", "orc", "json")


def read_tbl(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    delimiter: str = "|",
    header: bool = False,
) -> DataFrame:
    """Read a delimited text table (TPC-H ``.tbl`` dialect by default).

    ``.tbl`` lines end with a trailing delimiter, which a CSV reader
    parses as one extra all-null column — it is dropped when ``columns``
    is given (the reference reads with an explicit schema for the same
    reason) or when the last column is entirely absent from the header.
    """
    df = (
        spark.read.option("delimiter", delimiter)
        .option("header", str(header).lower())
        .csv(path)
    )
    if columns is not None:
        # exactly len(columns) parsed cols, or +1 for the .tbl
        # trailing-delimiter artifact — anything else means the wrong
        # delimiter/columns and must fail loudly, not silently truncate
        if len(df.columns) not in (len(columns), len(columns) + 1):
            raise ValueError(
                f"parsed {len(df.columns)} columns but {len(columns)} "
                f"names given (+1 trailing-delimiter artifact allowed) — "
                f"wrong delimiter?"
            )
        old = df.columns[: len(columns)]
        df = df.select(*[df[o].alias(n) for o, n in zip(old, columns)])
    return df


def convert_dataset(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    file_format: str = "parquet",
    partitions: int = 1,
    compression: str | None = "snappy",
    delimiter: str = "|",
    header: bool = False,
    columns: list[str] | None = None,
) -> int:
    """Convert a delimited-text dataset to ``file_format``; returns the
    row count written (one extra action on the written output — cheap
    relative to the conversion, and it doubles as a verification read)."""
    if file_format not in _FORMATS:
        raise ValueError(
            f"unsupported output format {file_format!r}; one of {_FORMATS}"
        )
    df = read_tbl(spark, input_path, columns, delimiter, header)
    if partitions > 1:
        df = df.repartition(partitions)
    writer = df.write.mode("overwrite")
    if compression and compression != "none":
        writer = writer.option("compression", compression)
    getattr(writer, file_format)(output_path)
    return spark.read.format(file_format).load(output_path).count()
