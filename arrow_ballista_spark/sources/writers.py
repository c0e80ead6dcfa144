"""Sinks: parquet / CSV / JSON writers, with hive-style partitioning.

Reference parity (SURVEY.md §2.B.1 sinks): ``df.write_parquet`` /
``df.write_csv`` (``ballista/client/src/context.rs:497-528``) plus the
partitioned-external-table layout (``table_partition_cols``,
``context.rs:400-415``) that :func:`write_partitioned` produces and
Spark's partition discovery reads back.

Scale notes: writers repartition to bound output file counts —
uncontrolled small files are the classic 100 TB failure mode.  Sorting
within partitions (``sortWithinPartitions``) maximizes parquet
min/max-pruning effectiveness on the sort keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_files: int | None = None,
    sort_by: list[str] | None = None,
) -> None:
    if target_files:
        df = df.repartition(target_files)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    sep: str = ",",
    target_files: int | None = None,
) -> None:
    if target_files:
        df = df.repartition(target_files)
    df.write.mode(mode).option("header", header).option("sep", sep).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_files: int | None = None,
) -> None:
    """ORC sink (beyond-reference; see readers.read_orc)."""
    if target_files:
        df = df.repartition(target_files)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned dataset (reference table_partition_cols);
    readable back with partition discovery + partition pruning."""
    write_parquet(df, path, mode=mode, partition_by=partition_cols)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffled storage layout so joins and
    aggregations on the bucket keys run with ZERO exchange.

    This is the 100 TB co-location strategy: pay the shuffle ONCE at write
    time, then every join between tables bucketed the same way (same keys,
    same bucket count) is map-side — Catalyst proves the partitioning
    requirement is already satisfied and plans no Exchange.  The reference
    keeps shuffle files around between stages for the same reason
    (``ShuffleWriterExec`` partition files); bucketing is the durable,
    cross-query version of that idea.

    ``sort_cols`` additionally sorts within each bucket (sort-merge join
    without the sort step).  Bucketed tables are saved through the session
    catalog (``saveAsTable``) — bucket metadata lives in the catalog, not
    the parquet footers.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)
