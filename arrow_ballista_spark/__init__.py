"""arrow_ballista_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of apache/arrow-ballista (reference at
/root/reference, surveyed in SURVEY.md).

Spark-first design: Spark already *is* the scheduler/shuffle/executor layer
the reference hand-builds (SURVEY.md §0); this package provides the product
surface — session defaults, catalog, the relational query suite, the
DataFusion-compatible function mapping, and the LLM-data-pipeline extension
operators (dedup, similarity search, text analysis, multimodal plumbing).
"""

from arrow_ballista_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
