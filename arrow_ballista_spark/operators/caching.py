"""Tracked persist: release-able operator-internal caches.

Several operators persist() an intermediate that both sides of a
self-join consume (LSH band tables, simhash chunks, IVF cell index).
The returned DataFrame is lazy, so the operator itself can never
unpersist — the consuming action hasn't run yet.  Left alone, those
cached blocks accumulate across repeated invocations (a bench loop runs
every query twice per session) and leak executor storage memory in
long-lived sessions.

:func:`tracked_persist` registers every such handle STRONGLY and
:func:`release_caches` frees them all — call it after the consuming
action (the bench harness does, per query; tests do, per module).
Strong references are load-bearing: the operator's local variable is
usually the only other reference, so a weak registry would drop the
handle the moment the operator returns and release would free nothing
(the Python wrapper is a few hundred bytes; the JVM cache it controls is
the thing that must not leak).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
# (SparkContext, rdd_id) pairs for localCheckpoint RDDs — those are plain
# RDD-level persists the DataFrame-level tracker can't see
_TRACKED_RDDS: list[tuple[weakref.ref, int]] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() + register the handle for a later :func:`release_caches`."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def _persistent_rdd_ids(sc) -> set[int]:
    ids: set[int] = set()
    it = sc._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def tracked_local_checkpoint(df: DataFrame) -> DataFrame:
    """``localCheckpoint(eager=True)`` + register the materialized RDD so
    :func:`release_caches` can free its blocks.

    A checkpoint truncates lineage, so once released the RETURNED frame
    cannot be re-executed — consume (collect/write) before releasing, and
    re-invoke the operator for a fresh result.  Iterative operators (see
    ``dedup.connected_components``) need this: their per-round frames are
    invisible to DataFrame-level unpersist and would otherwise accumulate
    in executor storage for the life of the session.
    """
    sc = df.sparkSession.sparkContext
    before = _persistent_rdd_ids(sc)
    out = df.localCheckpoint(eager=True)
    for rid in _persistent_rdd_ids(sc) - before:
        _TRACKED_RDDS.append((weakref.ref(sc), rid))
    return out


def reliable_checkpoint(df: DataFrame, checkpoint_dir: str) -> DataFrame:
    """``df.checkpoint(eager=True)`` into a durable directory.

    localCheckpoint blocks live in executor storage and die with the
    executor — fine on local[*], fatal for a multi-hour iterative job on
    a real cluster where executor loss is routine.  A reliable checkpoint
    writes the round's frame to ``checkpoint_dir`` (HDFS/S3A at cluster
    scale) so a lost executor recomputes from durable files, not from the
    start of the job.  Files are removed automatically only when
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true``; otherwise
    clean the directory after the job (see DEPLOY.md).
    """
    sc = df.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=True)


def checkpointer(checkpoint_dir: str | None):
    """The per-round checkpoint strategy for iterative operators
    (connected components, PageRank, k-means): tracked localCheckpoint on
    a single node — released by :func:`release_caches` — or
    :func:`reliable_checkpoint` when the caller supplies a durable dir."""
    if checkpoint_dir:
        return lambda df: reliable_checkpoint(df, checkpoint_dir)
    return tracked_local_checkpoint


def release_caches() -> int:
    """Unpersist every tracked DataFrame + checkpoint RDD; returns how many
    were released.  Non-blocking: executors free blocks asynchronously."""
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:
            pass  # session already stopped — nothing to free
    _TRACKED.clear()
    for sc_ref, rid in _TRACKED_RDDS:
        sc = sc_ref()
        if sc is None:
            continue
        try:
            opt = sc._jsc.sc().getPersistentRDDs().get(rid)
            if not opt.isEmpty():
                opt.get().unpersist(False)
                n += 1
        except Exception:
            pass
    _TRACKED_RDDS.clear()
    return n
