"""10x scaling ratios for the round-8 new/changed operators (repo
discipline: every new operator ships with a measured sf0.1 -> 10x wall
ratio, checksum sink).  Build /tmp/scale10x first
(tools/make_scale_fixture.py 10 /root/testdata/sf0.1 /tmp/scale10x).

Round-8 surface: the residual IVF-PQ witnessed entry, the numpy
logistic model scorer, the progressive-mix JPEG entry, and the
driver-side BPE training loop.

Usage: python tools/measure_new_r8.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

QUERIES = sys.argv[1:] or [
    "ext_sim_topk_ivfpq_residual",
    "ext_model_score",
    "ext_multimodal_jpeg_stats",
    "ext_text_bpe_train",
    "ext_multimodal_gif_stats",
    "ext_multimodal_mulaw_stats",
    "ext_multimodal_png_stats",
    "ext_multimodal_tiff_stats",
    "ext_multimodal_gif_frames",
    "ext_multimodal_adpcm_stats",
]
FIXTURES = [("sf0.1", "/root/testdata/sf0.1"), ("10x", "/tmp/scale10x")]


def main():
    from arrow_ballista_spark.operators.caching import release_caches
    from arrow_ballista_spark.queries import load_all
    from arrow_ballista_spark.session import get_session

    spark = get_session(app_name="r8-scale", shuffle_partitions=32)
    reg = load_all()
    out = {}
    for name in QUERIES:
        times = {}
        for label, sf in FIXTURES:
            samples = []
            for _ in range(3):  # warm + 2 timed
                release_caches()
                t0 = time.monotonic()
                df = reg[name].spark(spark, sf)
                df.selectExpr(
                    "count(*) AS n", "sum(hash(*)) AS cs"
                ).collect()
                samples.append(time.monotonic() - t0)
            times[label] = round(min(samples[1:]), 3)
        ratio = round(times["10x"] / times["sf0.1"], 2)
        out[name] = {**times, "ratio_10x": ratio}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
