"""10x scaling ratios for the round-9 changed codec entries (repo
discipline: every new/changed operator ships with a measured
sf0.1 -> 10x wall ratio, checksum sink).  Build /tmp/scale10x first
(tools/make_scale_fixture.py 10 /root/testdata/sf0.1 /tmp/scale10x).

Round-9 surface: the TIFF entry's new lanes (tiled §15, predictor-2
§14, Deflate, new-style JPEG-in-TIFF with shared JPEGTables), the JPEG
entry's arithmetic lane (SOF9 QM-coder, doc_id%4==1), and the GIF
frames entry's disposal-3 lane.

Usage: python tools/measure_new_r9.py [query ...]
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
    "ext_multimodal_tiff_stats",
    "ext_multimodal_jpeg_stats",
    "ext_multimodal_gif_frames",
]
FIXTURES = [("sf0.1", "/root/testdata/sf0.1"), ("10x", "/tmp/scale10x")]


def main():
    from arrow_ballista_spark.operators.caching import release_caches
    from arrow_ballista_spark.queries import load_all
    from arrow_ballista_spark.session import get_session

    spark = get_session(app_name="r9-scale", shuffle_partitions=32)
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
