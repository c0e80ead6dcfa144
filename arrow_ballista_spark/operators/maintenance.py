"""Dataset maintenance: small-file statistics and compaction.

A 100 TB pipeline continuously appends output from thousands of tasks;
uncontrolled small files degrade every later scan (one task + one open per
file, parquet footer overhead, NameNode/object-store listing pressure).
The reference leaves layout to the user (each file of a listing table is
one partition, ``docs/source/user-guide/tuning-guide.md:27-35``) — this
module adds the housekeeping a lakehouse table format would provide.

Scale notes: :func:`dataset_stats` is a driver-side metadata listing (file
count + bytes, no data read).  :func:`compact_dataset` rewrites with
``repartition(ceil(bytes / target))`` — one full shuffle of the dataset,
the unavoidable cost of re-binpacking; run it on cold partitions, not the
live ingest head.  The rewrite goes to a temp dir then swaps, so a crashed
compaction never corrupts the source.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class DatasetStats:
    n_files: int
    total_bytes: int

    @property
    def avg_file_bytes(self) -> float:
        return self.total_bytes / self.n_files if self.n_files else 0.0


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(hconf), jpath, jvm


def dataset_stats(spark: SparkSession, path: str, suffix: str = "") -> DatasetStats:
    """File count + byte size of a dataset directory (recursive, metadata
    only — no data scan).  ``suffix`` filters (e.g. ``".parquet"``)."""
    fs, jpath, _ = _fs_and_path(spark, path)
    it = fs.listFiles(jpath, True)
    n = 0
    total = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # commit markers / metadata logs / CRCs
        if suffix and not name.endswith(suffix):
            continue
        n += 1
        total += st.getLen()
    return DatasetStats(n_files=n, total_bytes=total)


def compact_dataset(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 512 * 1024 * 1024,
    fmt: str = "parquet",
) -> DatasetStats:
    """Rewrite ``path`` so files average ~``target_file_bytes``.

    Reads the dataset, repartitions to ``ceil(total_bytes / target)``
    partitions, writes to ``<path>.__compact_tmp``, then swaps in the
    crash-safe order: old → ``.__compact_old``, tmp → path, delete old.
    A crash between steps leaves the data recoverable under one of the
    two side paths, never deleted-with-tmp-orphaned.  Returns the
    post-compaction stats.  Sizing uses the CURRENT on-disk bytes —
    compression ratio is already baked into them, so the estimate is
    close for a same-format rewrite.
    """
    before = dataset_stats(spark, path)
    n_parts = max(1, math.ceil(before.total_bytes / target_file_bytes))
    df = getattr(spark.read, fmt)(path)
    tmp = path.rstrip("/") + ".__compact_tmp"
    old = path.rstrip("/") + ".__compact_old"
    getattr(df.repartition(n_parts).write.mode("overwrite"), fmt)(tmp)
    fs, jpath, jvm = _fs_and_path(spark, path)
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    jold = jvm.org.apache.hadoop.fs.Path(old)
    fs.delete(jold, True)  # clear any leftover from a prior crash
    if not fs.rename(jpath, jold):
        raise RuntimeError(f"compaction swap failed: rename {path} -> {old}")
    if not fs.rename(jtmp, jpath):
        # roll back so readers of `path` still see the original data
        fs.rename(jold, jpath)
        raise RuntimeError(f"compaction swap failed: rename {tmp} -> {path}")
    fs.delete(jold, True)
    return dataset_stats(spark, path)
