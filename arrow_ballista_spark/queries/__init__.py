"""Query registry — the engine's declared capability surface.

Every operator family from SURVEY.md §2 gets at least one named query here,
implemented twice:

 - ``spark``: a callable ``(SparkSession, sf_dir) -> DataFrame`` built with
   the idiomatic PySpark DataFrame/SQL API (Catalyst plans the physical
   strategy);
 - ``oracle``: an equivalent ANSI-SQL string DuckDB can run over the same
   parquet tables (the driver's correctness gate).  ``None`` marks a
   genuinely non-SQL-expressible op (weaker rows-only check).

Column names are aliased identically on both sides; float aggregates are
rounded identically on both sides so order-of-summation noise cannot flip
the driver's value hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB-compatible ANSI SQL, or None (rows-only check)
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None, doc: str = ""):
    """Register a query implementation + its DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryDef(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    """Import every query module so REGISTRY is fully populated."""
    from arrow_ballista_spark.queries import (  # noqa: F401
        extensions,
        functions_suite,
        operators,
        tpch,
    )

    return REGISTRY
