"""sim03's SCALE form at large SF (round-7 probe): embedding LSH
near-dup pairs with ``auto_n_planes`` — the dial the round-6 sweep
established (plane count must grow ~log2(corpus) to hold bucket
occupancy constant; 395 -> 33 -> 10 s at 6/10/12 planes on 500k
vectors).

The REGISTRY entry sim03 pins n_planes=6 because its DuckDB oracle
embeds the plane constants — correct for the correctness gate, and
deliberately NOT the configuration anyone runs at scale: at 2M vectors
(sf100) 64 buckets give ~31k vectors/bucket => ~10^10 candidate pairs.
This script measures the documented production call instead
(n_planes=None => auto).

Usage: python scripts/bench_sim03_auto.py [SF_DIR]
Prints one JSON line: {"query": "sim03_auto_n_planes", "sec": ...,
"n_planes": chosen, "pairs": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from db_loganalyzer_spark.session import get_spark
from db_loganalyzer_spark.operators.similarity import (
    auto_n_planes,
    embedding_near_dups,
)
from db_loganalyzer_spark.sources.tables import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/scale/sf100r"


def main():
    spark = get_spark("bench-sim03-auto")
    emb = load_table(spark, SF_DIR, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    n_planes = auto_n_planes(emb)
    t0 = time.time()
    out = embedding_near_dups(emb, threshold=0.25)  # n_planes auto inside
    n_pairs = out.count()
    sec = round(time.time() - t0, 2)
    print(
        json.dumps(
            {
                "query": "sim03_auto_n_planes",
                "sec": sec,
                "n_planes": n_planes,
                "pairs": n_pairs,
                "sf_dir": SF_DIR,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
