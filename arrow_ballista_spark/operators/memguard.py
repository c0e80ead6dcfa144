"""Heap-pressure guard for broadcast-built joins (VERDICT r7 item 5).

The r6/r7 memory-pressure sweep (tools/measure_memory_pressure.py,
SCALING.md) mapped the ONLY non-spillable failure mode at a constrained
local-mode heap: Catalyst auto-broadcasts a small (~MB) frame, and the
broadcast hash-table BUILD has no spill path — "Not enough memory to
build and broadcast the table" — while every shuffle/sort path spills
hundreds of MB and completes.  The graph entries (triangles, pagerank)
were the two casualties at 1500m.

The guard: when the JVM running the query has a small max heap (local
mode only — there the driver heap IS every executor's heap), hint the
join side ``merge`` so Spark plans a sort-merge join (spillable) instead
of a broadcast build.  On a real cluster the session is untouched: the
guard keys off the actual JVM heap of the local master, not a config
guess, and broadcast remains the right default with executor-sized
heaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: below this JVM max heap (MB) in local mode, prefer spillable
#: sort-merge joins over non-spillable broadcast builds — the measured
#: boundary: 1500m fails the build, 4g never pressures it; 2 GiB leaves
#: margin for the ~700 MB execution pool the shuffle paths need
MIN_BROADCAST_HEAP_MB = 2048


def local_heap_mb(spark) -> float | None:
    """The JVM max heap in MB when running in local mode (where driver
    == all executors), else None (cluster mode: executor heaps are not
    observable from here and broadcast stays the default)."""
    try:
        master = spark.sparkContext.master
        # 'local' / 'local[k]' / 'local[*]' only — NOT 'local-cluster',
        # whose executors are separate JVMs whose heaps the driver's
        # Runtime.maxMemory() does not reflect
        if master != "local" and not master.startswith("local["):
            return None
        return (
            spark._jvm.java.lang.Runtime.getRuntime().maxMemory()
            / 1048576.0
        )
    except Exception:
        return None


def apply_heap_guard(
    spark, min_heap_mb: int = MIN_BROADCAST_HEAP_MB
) -> bool:
    """Session-level guard (the 'one conf check'): when the local JVM
    heap is below ``min_heap_mb``, disable auto-broadcast (both the
    planner threshold and AQE's runtime-conversion threshold) so every
    would-be broadcast build becomes a spillable shuffled join.  The
    per-join ``spill_safe_side`` hints cover the graph operators' own
    joins, but broadcasts also arise inside upstream pipelines (the
    LSH edge producers) and from AQE runtime conversions — the measured
    1500m failures moved between entries run-to-run with session heap
    state, so only the session-wide switch closes the class.  Returns
    True when the guard engaged."""
    heap = local_heap_mb(spark)
    if heap is not None and heap < min_heap_mb:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        return True
    return False


def spill_safe_side(
    df: DataFrame, min_heap_mb: int = MIN_BROADCAST_HEAP_MB
) -> DataFrame:
    """Return ``df`` hinted ``merge`` when the local JVM heap is below
    ``min_heap_mb``, else unchanged.  Apply to a join input whose
    auto-broadcast build could OOM a constrained heap: the hint
    propagates up through projections/filters to the enclosing join and
    forces the spillable sort-merge strategy; plans on healthy heaps
    are byte-identical to before."""
    heap = local_heap_mb(df.sparkSession)
    if heap is not None and heap < min_heap_mb:
        return df.hint("merge")
    return df
