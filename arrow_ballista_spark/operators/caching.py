"""Tracked persist: release-able operator-internal caches.

Several operators persist() an intermediate that both sides of a
self-join consume (LSH band tables, simhash chunks, IVF cell index).
The returned DataFrame is lazy, so the operator itself can never
unpersist — the consuming action hasn't run yet.  Left alone, those
cached blocks accumulate across repeated invocations (a bench loop runs
every query twice per session) and leak executor storage memory in
long-lived sessions.

:func:`tracked_persist` registers every such handle (weakly) and
:func:`release_caches` frees them all — call it after the consuming
action (the bench harness does, per query; tests do, per module).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

_TRACKED: "weakref.WeakSet[DataFrame]" = weakref.WeakSet()


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() + register the handle for a later :func:`release_caches`."""
    df = df.persist()
    _TRACKED.add(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked DataFrame; returns how many were released.

    Non-blocking: the executors free the blocks asynchronously."""
    n = 0
    for df in list(_TRACKED):
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:
            pass  # session already stopped — nothing to free
        _TRACKED.discard(df)
    return n
