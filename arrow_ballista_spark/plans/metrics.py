"""Per-operator execution metrics (reference parity: TaskMetrics /
OperatorMetrics — output_rows, elapsed_compute, spill_count, spilled_bytes,
mem_used — ``ballista.proto:245-278``, collected in
``ballista/core/src/utils.rs:366-377``).

Spark records the same counters as SQLMetrics on every physical operator;
this module walks the executed (post-AQE) plan over py4j and returns them
as plain dicts — the engine's answer to the reference's job-metrics REST
endpoint."""

from __future__ import annotations

from pyspark.sql import DataFrame


def _walk(node, allow_final: bool):
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i), allow_final)
    # AQE / shuffle stage nodes hide their subtree behind plan();
    # finalPhysicalPlan FORCES execution — only follow it when the caller
    # asked to execute (metrics on an unexecuted plan are all zero anyway)
    accessors = ("plan", "finalPhysicalPlan" if allow_final else "initialPlan")
    for attr in accessors:
        try:
            sub = getattr(node, attr)()
            yield from _walk(sub, allow_final)
        except Exception:
            pass


def collect_metrics(df: DataFrame, execute: bool = True) -> list[dict]:
    """[{node, metric, value}] for every operator in the executed plan."""
    if execute:
        df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    out: list[dict] = []
    seen = set()
    for node in _walk(plan, allow_final=execute):
        nid = node.id()
        if nid in seen:
            continue
        seen.add(nid)
        m = node.metrics()
        it = m.iterator()
        while it.hasNext():
            kv = it.next()
            out.append(
                {
                    "node": node.nodeName(),
                    "metric": str(kv._1()),
                    "value": kv._2().value(),
                }
            )
    return out


def metrics_summary(df: DataFrame, execute: bool = True) -> dict:
    """Aggregate view: total rows produced per operator type, spill bytes,
    peak memory — the reference's PartitionStats rollup equivalent."""
    rows = collect_metrics(df, execute=execute)
    summary: dict = {"output_rows": {}, "spill_bytes": 0, "peak_memory": 0}
    for r in rows:
        if r["metric"] == "numOutputRows":
            summary["output_rows"][r["node"]] = (
                summary["output_rows"].get(r["node"], 0) + r["value"]
            )
        elif r["metric"] == "spillSize":
            summary["spill_bytes"] += r["value"]
        elif r["metric"] == "peakMemory":
            summary["peak_memory"] = max(summary["peak_memory"], r["value"])
    return summary
