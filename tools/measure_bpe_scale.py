"""Measure BPE training k-scaling at sf0.1 (VERDICT r7 item 1).

The r8 driver-side merge loop makes k merges cost O(affected-word
updates) after ONE corpus shuffle; this script times bpe_train_merges
at k = 8 / 256 / 1024 / 8192 on the sf0.1 documents table and prints a
JSON line per k.  Done-bar: k=1024 in seconds, not minutes.

Usage: python tools/measure_bpe_scale.py [sf_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from arrow_ballista_spark.catalog import load_table
from arrow_ballista_spark.operators.text import bpe_train_merges


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("bpe-scale")
        .getOrCreate()
    )
    docs = load_table(spark, sf_dir, "documents")
    docs.count()  # warm the scan
    for k in (8, 256, 1024, 8192):
        t0 = time.time()
        out = bpe_train_merges(docs, "text", k=k).collect()
        dt = time.time() - t0
        print(
            json.dumps(
                {
                    "k": k,
                    "sec": round(dt, 2),
                    "merges_learned": len(out),
                    "last_count": out[-1]["pair_count"] if out else None,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
