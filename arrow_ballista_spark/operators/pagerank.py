"""PageRank over a document graph — the third iterative-algorithm family
next to Lloyd's k-means (operators/kmeans.py) and connected components
(operators/dedup.py).

Corpus-curation uses: centrality-weighted canonical selection (keep the
most-central member of a duplicate cluster), host/source quality
propagation over a link graph, seed expansion.  No reference parity:
arrow-ballista has no graph operators (SURVEY.md §2 — extension).

Scale shape (per iteration, the standard distributed PageRank):
- contributions = edges ⋈ ranks on src (shuffle on src), then one
  two-phase SUM per dst (shuffle on dst) — two bounded shuffles per
  iteration, each O(|E|);
- degrees are computed once up front;
- ranks never collect to the driver; the only driver action is the
  node-count scalar for the teleport term.

Determinism / oracle-exactness: a fixed iteration count is unrolled into
a CTE chain on the DuckDB side; per-iteration ranks round to
``round_digits`` with the engine-portable floor(|x|+0.5)·sign macro, so
cross-engine float-summation-order noise (≈1e-17) can never flip a value
at 1e-9 resolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arrow_ballista_spark.queries import cround


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "v",
    d: float = 0.85,
    iters: int = 3,
    round_digits: int = 9,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank; returns ``(node_col, rank)``.

    ``edges`` must be directed (src, dst) — pass both directions for an
    undirected graph.  Nodes with no out-edges contribute nothing
    (dangling mass is dropped, identically on both engines); isolated
    nodes keep the teleport mass (1-d)/N.

    ``checkpoint_dir``: with many iterations the rank lineage deepens one
    join per round; a lost executor late in the job otherwise recomputes
    the whole chain.  Passing a durable directory checkpoints the rank
    frame (N small rows) each iteration via ``df.checkpoint()`` —
    recovery restarts from the last round's files (see DEPLOY.md).
    """
    from arrow_ballista_spark.operators.caching import (
        reliable_checkpoint,
        tracked_local_checkpoint,
        tracked_persist,
    )

    n = nodes.count()  # planning-time scalar (one action, one number)
    if n == 0:
        # empty graph: empty result with the declared schema, not a
        # ZeroDivisionError buried in plan-build
        return nodes.select(
            F.col(node_col), F.lit(0.0).alias("rank")
        ).limit(0)
    from arrow_ballista_spark.operators.memguard import spill_safe_side

    # tracked persists: every iteration re-references the edge list —
    # without them an expensive upstream edge generator (e.g. the LSH
    # dedup pipeline) re-runs once per iteration per reference (measured
    # 45s -> 7s at sf0.01).  Released via release_caches().
    # The out-degree is attached to the edge list ONCE here (r12
    # optimization): the old shape computed a separate ``deg`` aggregate
    # and re-joined it inside every iteration — iters extra keyed joins
    # of the full edge list.  A count window partitioned by src needs
    # exactly one shuffle+sort of the edges and no join at all, and the
    # persisted frame then carries (src, dst, deg) into every iteration.
    # r/deg per edge and the per-dst SUM are unchanged, so ranks are
    # identical.
    # spill_safe_side: under a constrained local heap the small rank
    # frames auto-broadcast and the non-spillable build OOMs (the 1500m
    # sweep, SCALING.md) — hint sort-merge there instead.
    from pyspark.sql import Window as _W

    # localCheckpoint BEFORE the window: an expensive upstream edge
    # generator (the LSH dedup pipeline) otherwise rides along as
    # LINEAGE of the persisted frame, and every iteration's reference
    # re-plants that whole subtree in the final plan — the pagerank
    # entry's pre-r12 plan was 1,417 lines / 149 Exchange nodes of
    # mostly-duplicated LSH lineage that Catalyst re-analyzed on every
    # plan build (execution already hit the cache; the cost was driver
    # planning).  The checkpoint truncates lineage to a flat RDD scan;
    # the window's hash partitioning by src is preserved by the persist
    # on top for the per-iteration join.
    edges = tracked_local_checkpoint(edges.select("src", "dst"))
    edges = spill_safe_side(
        tracked_persist(
            edges.withColumn(
                "deg",
                F.count(F.lit(1)).over(_W.partitionBy("src")),
            )
        )
    )
    base = float((1.0 - d) / n)
    ranks = nodes.select(
        F.col(node_col).alias("v"), F.lit(float(1.0 / n)).alias("r")
    )
    for _ in range(iters):
        ranks = spill_safe_side(ranks)
        contrib = (
            edges.join(ranks, edges.src == ranks.v)
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("deg")).alias("contrib"))
        )
        contrib = spill_safe_side(contrib)
        ranks = (
            nodes.select(F.col(node_col).alias("v"))
            .join(contrib, F.col("v") == contrib.dst, "left")
            .select(
                "v",
                cround(
                    F.lit(base)
                    + F.lit(d) * F.coalesce(F.col("contrib"), F.lit(0.0)),
                    round_digits,
                ).alias("r"),
            )
        )
        if checkpoint_dir:
            ranks = reliable_checkpoint(ranks, checkpoint_dir)
    return ranks.select(F.col("v").alias(node_col), F.col("r").alias("rank"))


def triangle_counts(
    edges: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    orient: str = "degree",
) -> DataFrame:
    """Per-node triangle counts over an undirected edge set (unique pairs,
    any endpoint order): ``(node, n_triangles)``.

    Orientation strategy (the classic Schank/Wagner node-iterator++ /
    Suri-Vassilvitskii MR refinement — public algorithms):

    - ``orient="degree"`` (default): every edge points from its
      lower-(degree, id) endpoint to the higher one, so each triangle is
      counted exactly once with its MINIMUM-degree vertex as the wedge
      pivot.  A hub of degree D that pivots O(D^2) wedges under id
      orientation generates at most O(sum of its neighbors' out-degrees)
      wedges here — out-degree is bounded by O(sqrt(|E|)) for every node,
      which is what keeps the wedge count near-linear on power-law
      graphs (measured: tools/measure_triangles.py, SCALING.md r7).
    - ``orient="id"``: the simpler low-id -> high-id orientation (the r6
      entry's shape) — correct, but a low-id hub explodes the wedge join.

    Dataflow in both modes: two keyed equi-joins (wedge build + closing-
    edge semijoin), one explode, one keyed count — no cartesian.  The
    degree mode adds one up-front degree aggregation and an extra keyed
    join to attach orientation keys; at scale that O(|E|) prepass buys a
    quadratic->linear wedge reduction on skewed graphs.
    """
    from arrow_ballista_spark.operators.memguard import spill_safe_side

    if orient not in ("degree", "id"):
        raise ValueError(f"orient must be 'degree' or 'id', got {orient!r}")
    # under a constrained local heap the edge/degree frames auto-
    # broadcast and the non-spillable build OOMs (the 1500m sweep,
    # SCALING.md) — hint sort-merge there; plans are unchanged otherwise
    e = spill_safe_side(
        edges.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
    )
    if orient == "id":
        o = e.select(
            F.least("x", "y").alias("u"), F.greatest("x", "y").alias("v")
        )
    else:
        deg = spill_safe_side(
            e.select(F.col("x").alias("n"))
            .unionAll(e.select(F.col("y").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        o = (
            e.join(deg.withColumnRenamed("n", "x"), "x")
            .withColumnRenamed("deg", "dx")
            .join(
                deg.withColumnRenamed("n", "y").withColumnRenamed(
                    "deg", "dy"
                ),
                "y",
            )
            .select(
                F.when(
                    (F.col("dx") < F.col("dy"))
                    | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))),
                    F.struct(F.col("x").alias("u"), F.col("y").alias("v")),
                )
                .otherwise(
                    F.struct(F.col("y").alias("u"), F.col("x").alias("v"))
                )
                .alias("o")
            )
            .select("o.u", "o.v")
        )
    from arrow_ballista_spark.operators.caching import (
        tracked_local_checkpoint,
    )

    # eager localCheckpoint: materializes the oriented edges before the
    # three wedge-join branches read them (the r6 persist-race lesson,
    # 33s vs 6s at 10x — previously persist + count()) AND truncates
    # lineage, so the branches reference a flat RDD scan instead of each
    # re-planting the whole upstream pipeline: the triangles entry's
    # pre-r12 final plan was 8,982 lines / 1,039 Exchange nodes of
    # triplicated LSH lineage that Catalyst re-analyzed per plan build.
    op = tracked_local_checkpoint(o)
    op = spill_safe_side(op)
    ab = op.select(F.col("u").alias("a"), F.col("v").alias("b"))
    ac = op.select(F.col("u").alias("a"), F.col("v").alias("c"))
    bc = op.select(F.col("u").alias("b"), F.col("v").alias("c"))
    # wedges pivot at a (the orientation-minimum): pairs of out-neighbors
    # (b, c) with b < c in ID keeps each unordered pair once; the closing
    # oriented edge may run b->c or c->b (degree order is not id order),
    # so the semijoin matches either direction via least/greatest keys.
    wedge = ab.join(ac, "a").filter(F.col("b") < F.col("c"))
    closing = bc.select(
        F.least("b", "c").alias("b"), F.greatest("b", "c").alias("c")
    )
    tri = wedge.join(closing, ["b", "c"])
    nodes = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
