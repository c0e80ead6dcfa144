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

import threading
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


_CKPT_LOCK = threading.Lock()
# SparkContext id -> (dir last set, reliable checkpoints currently in flight)
_CKPT_STATE: dict[int, list] = {}
# (sc weakref, hadoop path string) of every rdd-* checkpoint dir we wrote
_TRACKED_CKPT_PATHS: list[tuple[weakref.ref, str]] = []


def _hadoop_fs(sc, dir_str: str):
    jvm = sc._jvm
    p = jvm.org.apache.hadoop.fs.Path(dir_str)
    return p.getFileSystem(sc._jsc.hadoopConfiguration()), p, jvm


def _list_rdd_ckpt_dirs(sc, base: str) -> set[str]:
    """Every ``{base}/{uuid}/rdd-*`` directory currently on disk (the
    layout ``SparkContext.setCheckpointDir`` creates)."""
    fs, p, jvm = _hadoop_fs(sc, base)
    out: set[str] = set()
    if not fs.exists(p):
        return out
    for uuid_st in fs.listStatus(p):
        if not uuid_st.isDirectory():
            continue
        for rdd_st in fs.listStatus(uuid_st.getPath()):
            name = rdd_st.getPath().getName()
            if name.startswith("rdd-"):
                out.add(rdd_st.getPath().toString())
    return out


def reliable_checkpoint(df: DataFrame, checkpoint_dir: str) -> DataFrame:
    """``df.checkpoint(eager=True)`` into a durable directory.

    localCheckpoint blocks live in executor storage and die with the
    executor — fine on local[*], fatal for a multi-hour iterative job on
    a real cluster where executor loss is routine.  A reliable checkpoint
    writes the round's frame to ``checkpoint_dir`` (HDFS/S3A at cluster
    scale) so a lost executor recomputes from durable files, not from the
    start of the job.

    ``setCheckpointDir`` is SESSION-GLOBAL, so two concurrent iterative
    jobs given different dirs would race and checkpoint into each other's
    directory.  The guard below makes that an error instead of silent
    cross-writes: switching the dir is allowed only while no other
    reliable checkpoint is in flight on the same SparkContext.  Written
    ``rdd-*`` directories are recorded so :func:`release_checkpoints`
    can delete them (Spark only auto-removes them when
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true``; see
    DEPLOY.md).
    """
    sc = df.sparkSession.sparkContext
    key = id(sc)
    with _CKPT_LOCK:
        state = _CKPT_STATE.setdefault(key, [None, 0])
        if state[0] != checkpoint_dir:
            if state[1] > 0:
                raise RuntimeError(
                    "reliable_checkpoint: another iterative job is mid-"
                    f"checkpoint into {state[0]!r}; the checkpoint dir is "
                    "session-global, so concurrent jobs must share one "
                    f"dir (requested {checkpoint_dir!r})"
                )
            sc.setCheckpointDir(checkpoint_dir)
            state[0] = checkpoint_dir
        state[1] += 1
    try:
        before = _list_rdd_ckpt_dirs(sc, checkpoint_dir)
        out = df.checkpoint(eager=True)
        new_paths = _list_rdd_ckpt_dirs(sc, checkpoint_dir) - before
        with _CKPT_LOCK:
            for path in new_paths:
                _TRACKED_CKPT_PATHS.append((weakref.ref(sc), path))
        return out
    finally:
        with _CKPT_LOCK:
            _CKPT_STATE[key][1] -= 1


def release_checkpoints() -> int:
    """Delete every durable checkpoint directory written through
    :func:`reliable_checkpoint`; returns how many were removed.

    Like releasing a localCheckpoint, this breaks re-execution of the
    frames that depended on those files — call only after the consuming
    job has finished (bench does, per query; long-lived services after
    each maintenance cycle)."""
    n = 0
    with _CKPT_LOCK:  # snapshot-and-swap so a concurrent checkpoint's
        paths = _TRACKED_CKPT_PATHS[:]  # append can't land between our
        _TRACKED_CKPT_PATHS.clear()  # iteration and the clear
    for sc_ref, path in paths:
        sc = sc_ref()
        if sc is None:
            continue
        try:
            fs, p, _ = _hadoop_fs(sc, path)
            if fs.exists(p) and fs.delete(p, True):
                n += 1
        except Exception:
            pass  # session stopped / already cleaned
    return n


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
