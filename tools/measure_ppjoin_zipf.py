"""Measure PPJoin under a Zipf (narrow) vocabulary — VERDICT r6 item 7.

The prefix filter's near-linearity rests on RARE-token selectivity: a
document only indexes its lowest-document-frequency tokens, and rare
tokens carry few documents each.  Real crawl text is Zipf; in the
narrow-vocabulary limit nearly every document shares the same few
hundred words, every "rare" token is still common, and the word-mode
prefix join degenerates toward all-pairs.  Bigram tokens re-sharpen
selectivity (V^2 effective vocabulary), which is why
``ppjoin_pairs(token="bigram")`` exists.

Fixture: deterministic hash-driven docs of ``L`` words drawn from a
``V``-word Zipf(a) vocabulary (no RNG state), at 1x and 10x doc counts.
Both modes are exact for their own token universe, so this measures
CANDIDATE-GENERATION cost, not recall.  Output: wall times + measured
candidate-pair counts per mode/scale.

Usage: python tools/measure_ppjoin_zipf.py [n_docs] [V] [L] [alpha]
       (defaults: 3000 120 40 1.5)
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
V = int(sys.argv[2]) if len(sys.argv) > 2 else 120
L = int(sys.argv[3]) if len(sys.argv) > 3 else 40
A = float(sys.argv[4]) if len(sys.argv) > 4 else 1.5


def main():
    from pyspark.sql import functions as F

    from arrow_ballista_spark.operators.caching import release_caches
    from arrow_ballista_spark.operators.dedup import ppjoin_pairs
    from arrow_ballista_spark.session import get_session

    spark = get_session(app_name="ppjoin-zipf", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def zipf_docs(n: int):
        """doc i = L words 'w<r>' with rank r inverse-power sampled from
        a deterministic per-(doc, position) hash."""
        word = (
            f"'w' || cast(least(cast(pow("
            f"((abs(xxhash64(id, j)) % 1000000) + 1) / 1000000.0,"
            f" -1.0 / ({A} - 1.0)) as bigint), {V}) as string)"
        )
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.expr(
                f"array_join(transform(sequence(1, {L}), j -> {word}), ' ')"
            ).alias("text"),
        )

    results = []
    for scale, n in (("1x", N), ("10x", N * 10)):
        docs = zipf_docs(n).persist()
        docs.count()
        for mode in ("word", "bigram"):
            release_caches()
            t0 = time.monotonic()
            out = ppjoin_pairs(
                docs, "text", "doc_id", threshold=0.8, token=mode
            )
            row = out.selectExpr(
                "count(*) AS pairs", "sum(hash(*)) AS cs"
            ).collect()[0]
            dt = time.monotonic() - t0
            results.append(
                {
                    "scale": scale, "docs": n, "mode": mode,
                    "pairs": row["pairs"], "sec": round(dt, 2),
                }
            )
            print(results[-1], flush=True)
        docs.unpersist()

    print("\n| scale | docs | mode | matching pairs | sec |")
    print("| --- | --- | --- | --- | --- |")
    for r in results:
        print(
            f"| {r['scale']} | {r['docs']} | {r['mode']} |"
            f" {r['pairs']} | {r['sec']} |"
        )
    by = {(r["scale"], r["mode"]): r["sec"] for r in results}
    for mode in ("word", "bigram"):
        print(
            f"{mode}: 10x/1x wall ratio ="
            f" {by[('10x', mode)] / by[('1x', mode)]:.2f}x"
        )


if __name__ == "__main__":
    main()
