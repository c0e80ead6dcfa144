"""arrow_ballista_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of apache/arrow-ballista (reference at
/root/reference, surveyed in SURVEY.md).

Spark-first design: Spark already *is* the scheduler/shuffle/executor layer
the reference hand-builds (SURVEY.md §0); this package provides the product
surface — session defaults, catalog, client context, the relational query
suite, the DataFusion-compatible function mapping, and the
LLM-data-pipeline extension operators (dedup, similarity search, text
analysis, multimodal plumbing, as-of joins).

Quickstart::

    from arrow_ballista_spark import BallistaContext
    ctx = BallistaContext()
    ctx.register_parquet("t", "/path/data.parquet")
    ctx.sql("SELECT count(*) FROM t").show()
"""

from arrow_ballista_spark.session import get_session


def __getattr__(name):
    # lazy: importing context pulls in pyspark session machinery
    if name in ("BallistaContext", "BallistaDataFrame", "JobHandle"):
        from arrow_ballista_spark import context

        return getattr(context, name)
    if name == "release_caches":
        from arrow_ballista_spark.operators.caching import release_caches

        return release_caches
    raise AttributeError(name)


__all__ = [
    "BallistaContext",
    "BallistaDataFrame",
    "JobHandle",
    "get_session",
    "release_caches",
]
__version__ = "0.1.0"
