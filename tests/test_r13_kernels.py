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


def test_lsh_bucket_pairs_match_self_join_form(spark):
    """The single-exchange groupBy/collect_list/double-explode candidate
    generator must emit exactly the pair set of the retired band_sig
    self-join — including multi-band duplicate pairs (deduped once) and
    all-NULL signatures (which band together, as xxhash64 of NULL rows
    is a deterministic non-NULL value)."""
    from arrow_ballista_spark.operators.dedup import (
        band_hash_array_from_sig,
        lsh_candidate_pairs,
    )

    rows = [
        (1, [7, 7, 3, 3]),
        (2, [7, 7, 9, 9]),   # shares band 0 with doc 1
        (3, [7, 7, 3, 3]),   # identical sig: pairs with 1 in BOTH bands
        (4, [0, 1, 2, 5]),   # no shared band
        (5, None),           # NULL sig
        (6, None),           # NULL sig: bands with doc 5
    ]
    sigs = spark.createDataFrame(rows, "doc_id long, mh array<long>")
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(
            sigs, "doc_id", num_perm=4, rows_per_band=2, sig_col="mh"
        ).collect()
    )
    # reference: the retired self-join form, inlined
    exploded = sigs.select(
        "doc_id",
        F.explode(band_hash_array_from_sig("mh", 4, 2)).alias("band_sig"),
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    want = sorted(
        (r["id_a"], r["id_b"])
        for r in a.join(
            b,
            (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
        .collect()
    )
    assert got == want
    assert (1, 3) in got and (5, 6) in got and (1, 2) in got


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
        .agg(F.round(F.sum("s") / F.sum("n"), 6).alias("m"))
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
