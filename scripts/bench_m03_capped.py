"""m03's SCALE configuration at large SF (round-8 disposition).

The registry entry pins `minhash_lsh_dedup(threshold=0.12, num_hashes=16,
bands=8, n=2)` — 2-row bands, the loose banding a 0.12 threshold needs.
At sf100 (5M docs) that banding yields ~278M pre-distinct candidate
pairs (measured round 8), and the exact-Jaccard verify join must carry
an ~800 B shingle-hash array per candidate through a shuffle — a
30–60 GB spill that exceeds a single dev host's free disk, while being
a routine shuffle volume on a real cluster. The uncapped entry is
therefore disk-bound HERE, not wrong: its plan is linear in candidate
count.

The single-host (and skew-hardened cluster) dial is
``max_bucket_size``: drop (band, bucket) groups above the cap before
the pair join — the LSH analogue of m02c's stop-shingle cap, with the
recall trade documented on `minhash_lsh_candidates`. This script
measures that documented scale configuration.

Usage: python scripts/bench_m03_capped.py [SF_DIR] [CAP]
Prints one JSON line: {"query": "m03_minhash_lsh_dedup_capped",
"sec": ..., "pairs": N, "max_bucket_size": CAP}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from db_loganalyzer_spark.session import get_spark
from db_loganalyzer_spark.operators.dedup import minhash_lsh_dedup
from db_loganalyzer_spark.sources.tables import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/scale/sf100r"
CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 100


def main():
    spark = get_spark("bench-m03-capped")
    docs = load_table(spark, SF_DIR, "documents")
    t0 = time.time()
    out = minhash_lsh_dedup(
        docs, threshold=0.12, num_hashes=16, bands=8, n=2,
        max_bucket_size=CAP,
    )
    out.write.format("noop").mode("overwrite").save()
    sec = round(time.time() - t0, 2)
    pairs = out.count()
    print(json.dumps({
        "query": "m03_minhash_lsh_dedup_capped",
        "sec": sec,
        "pairs": pairs,
        "max_bucket_size": CAP,
        "sf_dir": SF_DIR,
    }))


if __name__ == "__main__":
    main()
