"""Custom table provider via the PySpark DataSource API.

Reference parity: ``CustomTableScanNode`` (``datafusion.proto:126-133``) —
Ballista lets a client plug an arbitrary table provider into the catalog.
Spark's native equivalent is DataSource V2; PySpark 4 exposes it in pure
Python (``pyspark.sql.datasource``), so a provider is a class, not a JVM
jar.

The provider here generates a deterministic synthetic range table with a
configurable row count and partition count — partitioned at the source
(each partition generates its slice independently), exactly how a real
external system (REST shards, kafka partitions, custom file format) plugs
into Spark's scan parallelism at 100 TB.
"""

from __future__ import annotations

from weakref import WeakSet

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticRangeReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self):
        step = max(1, self.n_rows // self.n_parts)
        bounds = list(range(0, self.n_rows, step)) + [self.n_rows]
        return [
            RangePartition(bounds[i], bounds[i + 1])
            for i in range(len(bounds) - 1)
        ]

    def read(self, partition: RangePartition):
        for i in range(partition.start, partition.end):
            # deterministic derived columns: value ramp + mod bucket
            yield (i, float(i) * 0.5, i % 7)


class SyntheticRangeDataSource(DataSource):
    """``spark.read.format("synthetic_range").option("rows", N)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_range"

    def schema(self) -> str:
        return "id bigint, val double, bucket int"

    def reader(self, schema) -> DataSourceReader:
        return SyntheticRangeReader(self.options)


# Weak refs: an id()-keyed set can false-hit when a collected session's
# address is recycled, silently skipping registration for the new session.
_REGISTERED_SESSIONS: WeakSet = WeakSet()


def register(spark: SparkSession) -> None:
    if spark in _REGISTERED_SESSIONS:
        return
    spark.dataSource.register(SyntheticRangeDataSource)
    _REGISTERED_SESSIONS.add(spark)
