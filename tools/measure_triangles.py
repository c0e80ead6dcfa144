"""Measure id- vs degree-oriented triangle counting on a hub-skewed
graph (VERDICT r6 item 2): id orientation makes a LOW-ID hub the wedge
pivot of all its neighbor pairs — O(deg^2) wedges — while degree
orientation pivots every wedge at its minimum-degree vertex, bounding
out-degrees by ~sqrt(|E|) and keeping the wedge count near-linear.

Fixture: ``n`` background nodes with ``e`` random edges (deterministic
splitmix-style hashing, no RNG state), plus node 0 as a hub carrying
``hub_frac`` of all edges.  Node 0 is the WORST case for id orientation
(lowest id -> always the pivot).

For each scale (1x, 10x) runs both orientations, asserts identical
per-node counts, and prints wall times + the wedge-count ratio.

Usage: python tools/measure_triangles.py [n] [e] [hub_frac]
       (defaults: 20000 100000 0.05)
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
E = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
HUB = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05


def main():
    from pyspark.sql import functions as F

    from arrow_ballista_spark.operators.caching import release_caches
    from arrow_ballista_spark.operators.pagerank import triangle_counts
    from arrow_ballista_spark.session import get_session

    spark = get_session(app_name="tri-skew", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def hub_graph(n: int, e: int):
        """Deterministic hub graph as a DataFrame (no driver-side RNG):
        background edges hash i -> (x, y); hub edges attach node 0 to a
        hashed neighbor.  Self-loops and duplicate pairs dropped."""
        n_hub = int(e * HUB)
        bg = spark.range(e - n_hub).select(
            (F.abs(F.xxhash64(F.col("id"), F.lit(1))) % (n - 1) + 1).alias("x"),
            (F.abs(F.xxhash64(F.col("id"), F.lit(2))) % (n - 1) + 1).alias("y"),
        )
        hub = spark.range(n_hub).select(
            F.lit(0).cast("long").alias("x"),
            (F.abs(F.xxhash64(F.col("id"), F.lit(3))) % (n - 1) + 1).alias("y"),
        )
        return (
            bg.unionAll(hub)
            .filter(F.col("x") != F.col("y"))
            .select(
                F.least("x", "y").alias("id_a"),
                F.greatest("x", "y").alias("id_b"),
            )
            .distinct()
        )

    results = []
    for scale, (n, e) in (("1x", (N, E)), ("10x", (N * 10, E * 10))):
        edges = hub_graph(n, e).persist()
        m = edges.count()
        hub_deg = edges.filter(
            (F.col("id_a") == 0) | (F.col("id_b") == 0)
        ).count()
        counts = {}
        times = {}
        for orient in ("id", "degree"):
            t0 = time.time()
            rows = triangle_counts(edges, orient=orient).collect()
            times[orient] = time.time() - t0
            counts[orient] = {r["node"]: r["n_triangles"] for r in rows}
            release_caches()
        assert counts["id"] == counts["degree"], "orientations disagree!"
        total = sum(counts["id"].values()) // 3
        results.append(
            {
                "scale": scale, "nodes": n, "edges": m,
                "hub_deg": hub_deg, "triangles": total,
                "t_id": round(times["id"], 2),
                "t_degree": round(times["degree"], 2),
            }
        )
        print(results[-1], flush=True)
        edges.unpersist()

    print("\n| scale | edges | hub deg | triangles | id-orient s |"
          " degree-orient s |")
    print("| --- | --- | --- | --- | --- | --- |")
    for r in results:
        print(
            f"| {r['scale']} | {r['edges']} | {r['hub_deg']} |"
            f" {r['triangles']} | {r['t_id']} | {r['t_degree']} |"
        )
    r1, r10 = results
    print(
        f"\n10x/1x wall ratio: id {r10['t_id'] / r1['t_id']:.2f}x,"
        f" degree {r10['t_degree'] / r1['t_degree']:.2f}x"
    )


if __name__ == "__main__":
    main()
