"""IVF (inverted-file) approximate nearest neighbor over embedding columns.

The second ANN layout next to hyperplane LSH (similarity.py): a coarse
quantizer partitions the corpus into cells; queries probe only the
``nprobe`` nearest cells and exact-rerank inside them.

Spark-first design:
- centroids are a tiny driver-side list (n_cells × dim floats) chosen
  deterministically from the corpus (min-xxhash sample — a seeded k-means
  refinement can swap in without changing the dataflow);
- cell assignment is a map-only broadcast argmax (no shuffle);
- at scale the indexed corpus is written ``partitionBy("cell")`` so a
  query's probes prune to ~nprobe/n_cells of the data at the file level
  (partition pruning, no compute on unprobed cells);
- the probe join is queries×nprobe exploded rows joined on ``cell`` —
  corpus-sized shuffle avoided by broadcasting the (small) query side.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from arrow_ballista_spark.operators.caching import tracked_persist
from arrow_ballista_spark.operators.similarity import (
    _dlit,
    _sql_array,
    cosine_with_norms,
    norm,
)


def _sql_dot(vec_col: str, lit_array: str) -> str:
    """SQL twin of similarity.dot (same zip_with/aggregate fold, same
    casts) — built as ONE expression string.  Constructing the same tree
    from nested F.lit/F.array/F.aggregate Column objects costs thousands
    of Py4J round-trips (n_cells x dim literals ~= seconds of driver time
    per query build); one expr() string is a single JVM parse."""
    return (
        f"aggregate(zip_with({vec_col}, {lit_array}, "
        f"(x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def choose_centroids(
    corpus: DataFrame, id_col: str, vec: str, n_cells: int
) -> list[list[float]]:
    """Deterministic coarse centroids: the n_cells corpus vectors with the
    smallest md5(id) — a seedable uniform sample (collect is n_cells rows,
    never the corpus).  md5 over the id's decimal string is engine-portable
    (bit-identical in DuckDB), so the whole IVF pipeline is oracle-able;
    zero-norm vectors are excluded up front (a zero centroid would make
    every cosine against it NULL/÷0)."""
    rows = (
        corpus.select(F.col(id_col), F.col(vec))
        .filter(norm(F.col(vec)) > 0)
        .orderBy(
            F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col)
        )
        .limit(n_cells)
        .collect()
    )
    return [[float(x) for x in r[1]] for r in rows]


def assign_cells(
    corpus: DataFrame, vec: str, centroids: list[list[float]]
) -> DataFrame:
    """Map-only nearest-centroid assignment (broadcast argmax over the
    centroid literals)."""
    # centroid norms are Python constants; the row norm folds once —
    # one interpreted dot fold per centroid instead of three
    sims_sql = "array(" + ", ".join(
        f"({_sql_dot(vec, _sql_array(c))} / "
        f"nullif(__rn * {_dlit(math.sqrt(sum(x * x for x in c)))}, "
        f"cast(0.0 as double)))"
        for c in centroids
    ) + ")"
    best = F.expr(
        f"array_position(cells_sims, array_max(cells_sims)) - 1"
    )
    return (
        corpus.withColumn("__rn", norm(F.col(vec)))
        .withColumn("cells_sims", F.expr(sims_sql))
        .withColumn("cell", best.cast("int"))
        .drop("cells_sims", "__rn")
    )


def probe_cells(
    queries: DataFrame, vec: str, centroids: list[list[float]], nprobe: int
) -> DataFrame:
    """Attach the nprobe nearest cell ids to each query row (exploded)."""
    sims_sql = "array(" + ", ".join(
        f"named_struct('s', ({_sql_dot(vec, _sql_array(c))} / "
        f"nullif(__rn * {_dlit(math.sqrt(sum(x * x for x in c)))}, "
        f"cast(0.0 as double))), 'cell', {i})"
        for i, c in enumerate(centroids)
    ) + ")"
    top = F.expr(f"slice(reverse(array_sort({sims_sql})), 1, {nprobe})")
    return (
        queries.withColumn("__rn", norm(F.col(vec)))
        .withColumn("cell", F.explode(F.transform(top, lambda x: x["cell"])))
        .withColumn("cell", F.col("cell").cast("int"))
        .drop("__rn")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """End-to-end IVF top-k: build centroids from the corpus, assign
    cells, probe, exact-cosine rerank within probed cells."""
    centroids = choose_centroids(corpus, corpus_id, vec, n_cells)
    # tracked persist: consumed by the probe join; released via
    # operators.caching.release_caches() after the consuming action
    indexed = tracked_persist(
        assign_cells(
            corpus.select(
                F.col(corpus_id),
                F.col(vec).alias("cv"),
                norm(F.col(vec)).alias("cn"),
            )
            # zero-norm vectors have no cosine to ANY centroid (NULL
            # sims -> NULL cell): exclude them from the index explicitly
            # rather than letting them fall out as unjoinable NULL cells
            .filter(F.col("cn") > 0),
            "cv",
            centroids,
        )
    )
    probed = probe_cells(
        queries.select(
            F.col(query_id),
            F.col(vec).alias("qv"),
            norm(F.col(vec)).alias("qn"),
        ),
        "qv",
        centroids,
        nprobe,
    )
    scored = (
        F.broadcast(probed)
        .join(indexed, "cell")
        .filter(F.col(query_id) != F.col(corpus_id))
        .select(
            query_id,
            corpus_id,
            cosine_with_norms(
                F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
            ).alias("cos_raw"),
        )
        .distinct()
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_raw").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            query_id,
            corpus_id,
            F.col("cos_raw").alias("cosine"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
