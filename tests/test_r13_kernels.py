"""Round-13 optimization pins: each changed operator internal is pinned
against the exact shape it replaced (bit-parity, not closeness) on
adversarial inputs — the same discipline as the r12 kernel swaps."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_winnowing_kernel_matches_expression_form(spark):
    """The mapInArrow fingerprint kernel must be BIT-identical to the
    retired split/md5/window-min expression chain (which is also the
    shape the generated DuckDB oracle mirrors) — including leading/
    trailing/multiple spaces, NULLs, short docs, and non-ASCII."""
    from arrow_ballista_spark.operators.text import (
        _winnowing_fingerprints_expr,
        winnowing_fingerprints,
    )

    rows = [
        (1, "a b c d e f g"),
        (2, "  leading and   multiple  spaces "),
        (3, None),
        (4, ""),
        (5, "one two"),
        (6, "x y z"),
        (7, "a a a a a a a a a a"),
        (8, "tab\tis not a split char plus more tokens to pass"),
        (9, "     "),
        (10, "ünïcode tökens ällow méé tôo pass ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k, w in [(3, 4), (2, 3), (4, 2)]:
        a = sorted(
            (r["doc_id"], r["fp"])
            for r in winnowing_fingerprints(
                df, "text", "doc_id", k=k, w=w
            ).collect()
        )
        b = sorted(
            (r["doc_id"], r["fp"])
            for r in _winnowing_fingerprints_expr(
                df, "text", "doc_id", k=k, w=w
            ).collect()
        )
        assert a == b, f"k={k} w={w}: kernel diverged from expression form"
    assert a, "expected non-empty fingerprints"


def test_winnowing_bucket_pairs_match_self_join_form(spark):
    """winnowing_dedup_pairs' single-exchange bucket pair generator
    (groupBy(fp) + collect_list + double explode — safe there because
    max_df caps bucket size) must emit exactly the pairs and shared-fp
    counts of the retired fp self-join, including the df cap and the
    min_shared filter."""
    from arrow_ballista_spark.operators.caching import release_caches
    from arrow_ballista_spark.operators.dedup import winnowing_dedup_pairs
    from arrow_ballista_spark.operators.text import winnowing_fingerprints

    rows = [
        (i,
         "alpha beta gamma delta epsilon zeta eta theta iota kappa "
         + f"tail{i} more{i} filler{i} words{i} end{i}")
        for i in range(1, 5)
    ] + [(7, "totally different words here nothing shared"),
         (8, "alpha beta gamma delta epsilon zeta eta theta other end")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        map(str, winnowing_dedup_pairs(
            df, "text", "doc_id", k=3, w=4, min_shared=2, max_df=8
        ).collect())
    )
    release_caches()

    # reference: the retired fp self-join, inlined
    fps = winnowing_fingerprints(df, "text", "doc_id", k=3, w=4)
    hot = (
        fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") > 8).select("fp")
    )
    fps = fps.join(F.broadcast(hot), "fp", "left_anti")
    cnt = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n"))
    a = fps.select(F.col("doc_id").alias("id_a"), "fp")
    b = fps.select(F.col("doc_id").alias("id_b"), "fp")
    pairs = (
        a.join(b, "fp").where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("int").alias("shared_fps"))
        .where(F.col("shared_fps") >= 2)
    )
    s = F.col("shared_fps").cast("double")
    want = sorted(
        map(str, pairs
            .join(cnt.withColumnRenamed("doc_id", "id_a"), "id_a")
            .withColumnRenamed("_n", "_na")
            .join(cnt.withColumnRenamed("doc_id", "id_b"), "id_b")
            .withColumnRenamed("_n", "_nb")
            .select(
                "id_a", "id_b", "shared_fps",
                F.col("_na").cast("int").alias("n_a"),
                F.col("_nb").cast("int").alias("n_b"),
                (F.floor(s / (F.col("_na") + F.col("_nb") - s) * 10000.0
                         + 0.5) / 10000.0).alias("jaccard"),
            ).collect())
    )
    assert got == want and got, got


def test_lloyd_update_partials_match_posexplode_means(spark):
    """The fused assignment+partial-sum kernel's ``round(sum/count, 6)``
    means must equal the retired posexplode + ``round(avg, 6)`` means,
    and the driver-state Lloyd must produce the identical final
    assignment."""
    from arrow_ballista_spark.operators.kmeans import (
        _assign_exact_arrow,
        _collect_centroids,
        _lloyd_driver,
        _update_partials_arrow,
    )

    rows = [
        (i, [float((i * 7 + j * 3) % 11) / 4.0 + (0.125 if i % 3 else -0.5)
             for j in range(6)])
        for i in range(40)
    ]
    e = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cent_rows = _collect_centroids(e, 4, "vec_id")

    # old update: posexplode + round(avg, 6) over the assignment
    assigned = _assign_exact_arrow(e, cent_rows, "vec_id")
    old = {
        (int(r["cluster"]), int(r["pos"])): float(r["m"])
        for r in assigned.select(
            "cluster", F.posexplode("v").alias("pos", "val")
        )
        .groupBy("cluster", "pos")
        .agg(F.round(F.avg("val"), 6).alias("m"))
        .collect()
    }
    new = {
        (int(r["cluster"]), int(r["pos"])): float(r["m"])
        for r in _update_partials_arrow(e, cent_rows)
        .groupBy("cluster", "pos")
        .agg(F.round(F.try_divide(F.sum("s"), F.sum("n")), 6).alias("m"))
        .collect()
    }
    assert new == old

    # end-to-end: the full driver-state loop is deterministic over it
    out1 = sorted(
        (r["vec_id"], r["cluster"])
        for r in _lloyd_driver(e, cent_rows, 3, "vec_id", False).collect()
    )
    out2 = sorted(
        (r["vec_id"], r["cluster"])
        for r in _lloyd_driver(e, cent_rows, 3, "vec_id", False).collect()
    )
    assert out1 == out2 and len(out1) == 40


def test_cc_driver_union_find_matches_distributed(spark):
    """The bounded driver union-find path (r13) must produce the exact
    labels of the distributed pointer-jumping loop, report n_nodes the
    same way, and stay off when checkpoint_dir is given."""
    from arrow_ballista_spark.operators.dedup import connected_components

    edges = (
        [(i, i + 1) for i in range(40)]          # a 41-node chain
        + [(100, 101), (101, 102), (100, 102)]   # a clique
        + [(200, 201)]
        + [(7, 7)]                               # self-loop
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    s_drv: dict = {}
    s_dist: dict = {}
    drv = {
        r.id: r.cluster_id
        for r in connected_components(pairs, stats=s_drv).collect()
    }
    dist = {
        r.id: r.cluster_id
        for r in connected_components(
            pairs, stats=s_dist, driver_pairs_cap=0
        ).collect()
    }
    assert drv == dist
    assert s_drv["driver_union_find"] is True
    assert s_drv["n_nodes"] == s_dist["n_nodes"] == len(drv)


def test_lloyd_arrow_update_drops_empty_clusters(spark):
    """An empty cluster (duplicate seed vectors: argmin first-hit sends
    every point to the first copy) must be dropped by the fused partial-
    sum update exactly like the retired posexplode update dropped it —
    not crash on the NULL sum/0 mean (r13 review finding)."""
    from arrow_ballista_spark.operators.kmeans import (
        _collect_centroids,
        _lloyd_driver,
    )

    rows = [(0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0, 3.0])] + [
        (i, [float(i), float(i % 5), 0.25 * i]) for i in range(2, 30)
    ]
    e = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cent_rows = _collect_centroids(e, 3, "vec_id")
    assert cent_rows[0][1] == cent_rows[1][1]  # duplicate seeds
    out = sorted(
        (r["vec_id"], r["cluster"])
        for r in _lloyd_driver(e, cent_rows, 3, "vec_id", False).collect()
    )
    assert len(out) == 30
    assert all(c in (0, 1, 2) for _, c in out)
    # the duplicated centroid 1 must have emptied (first-hit ties)
    assert not any(c == 1 for _, c in out)
