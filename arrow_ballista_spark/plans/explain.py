"""EXPLAIN / plan-introspection surface.

Reference parity (SURVEY.md §2.B.12): ``ExplainNode`` / ``AnalyzeNode``
(``datafusion.proto:219-228``) and per-operator metrics
(``ballista.proto:245-278``) map onto Spark's explain modes and SQL
metrics.  Beyond parity, this module is the engine's own feedback loop:
the perf test-suite asserts plan *shape* — filters pushed to the parquet
scan, pruned read schemas, broadcast joins where a side is small, and
whole-stage codegen coverage — so regressions in the physical plan fail
CI, not just the stopwatch.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The EXPLAIN text (modes: simple, extended, codegen, cost, formatted)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def executed_plan_str(df: DataFrame) -> str:
    """Final (post-AQE) physical plan string — call after an action for
    the adaptively re-planned tree."""
    return df._jdf.queryExecution().executedPlan().toString()


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested in ()/[] — filters like In(x, [1,2])
    contain commas of their own."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """Predicates that reached the parquet scan (PushedFilters: [...])."""
    out: list[str] = []
    # greedy-to-last-] within the line: filters like In(x, [1,2]) nest
    # brackets of their own
    for m in re.finditer(r"PushedFilters: \[(.*)\]", explain_str(df)):
        if m.group(1).strip():
            out.extend(_split_top_level(m.group(1)))
    return out


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — the column-pruning witness."""
    return [
        m.group(1)
        for m in re.finditer(r"ReadSchema: ([^\n]+)", explain_str(df))
    ]


def num_exchanges(df: DataFrame) -> int:
    """Shuffle-exchange count in the initial plan (each is a full
    materialization boundary — the thing to minimize at 100 TB)."""
    return len(re.findall(r"\bExchange ", explain_str(df, "simple")))


def num_broadcast_joins(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin", explain_str(df, "simple")))


def num_sortmerge_joins(df: DataFrame) -> int:
    return len(re.findall(r"SortMergeJoin", explain_str(df, "simple")))


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """Whole-stage-codegen span count.  Under AQE the codegen tree only
    exists after execution, so this runs the plan (cheap at test SF) and
    counts ``WholeStageCodegen (n)`` markers in the final physical plan."""
    if execute:
        df.collect()  # finalize THIS plan's AQE (count() would plan anew)
    ids = set(re.findall(r"\*\((\d+)\) ", executed_plan_str(df)))
    return len(ids)


def plan_report(df: DataFrame) -> dict:
    """One-call plan summary used by tests and ad-hoc tuning."""
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": scan_read_schemas(df),
        "exchanges": num_exchanges(df),
        "broadcast_joins": num_broadcast_joins(df),
        "sortmerge_joins": num_sortmerge_joins(df),
        "codegen_stages": codegen_stage_count(df),
    }
