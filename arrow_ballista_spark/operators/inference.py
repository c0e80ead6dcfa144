"""Batched model-inference plumbing — scoring every document with a
model (quality classifier, perplexity filter, reward model, embedder) is
the single most common LLM-pipeline operation, and its Spark shape is
always the same: Arrow-batched ``mapInPandas``, model loaded once per
Python worker, map-only over the corpus scan.

No reference parity (arrow-ballista has no Python batch-UDF surface —
SURVEY.md §2 extension).  The model itself is pluggable; the container
ships no ML runtime, so the default scorer is a deterministic stub
(documented, SQL-expressible) and the Spark-side plumbing — schema,
batching, worker lifecycle — is real and oracle-tested, exactly like the
multimodal codec stubs (operators/multimodal.py).

Scale notes:
- map-only: rides the scan, no shuffle, linear in corpus size;
- the model should be loaded lazily ONCE per worker process (inside the
  generator, before the batch loop), never per row or per batch;
- batch size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  — tune so (batch x model activation memory) fits the worker;
- GPU clusters: one worker per GPU via ``spark.task.resource.gpu.amount``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def stub_scorer(texts: pd.Series) -> pd.Series:
    """Deterministic stand-in for a quality/perplexity model: a pure
    function of document length, reproducible across engines (the DuckDB
    oracle computes the identical expression).  Swap in a real
    ``Callable[[pd.Series], pd.Series]`` (HF pipeline, ONNX session) —
    the Spark plumbing is unchanged."""
    return (texts.str.len() % 97) / 96.0


def model_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scorer: Callable[[pd.Series], pd.Series] | None = None,
) -> DataFrame:
    """Score every row with a batched model: returns ``(doc_id, score)``.

    ``scorer`` maps a pandas Series of texts to a same-length Series of
    float scores; it is resolved lazily inside the worker generator so a
    heavyweight model initializes once per worker process, not per batch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = scorer or stub_scorer  # model init point: once per worker
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "score": fn(pdf[text_col]).astype("float64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, score double"
    )
