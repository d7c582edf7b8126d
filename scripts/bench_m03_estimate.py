"""m03's UNCAPPED scale run via signature-estimate verify (round-9).

The registry entry's exact verify carries an ~800 B shingle-hash array
per candidate pair through the verify shuffle — linear in candidates,
but at sf100 (5M docs, ~278M LSH candidate pairs) the shuffle volume
exceeds a single dev host's free disk (round-8 disposition). The
``max_bucket_size`` cap completes by trading recall.

``verify="estimate"`` removes the recall trade AND the array shuffle:
estimated Jaccard = matching-minhash fraction over the signatures the
pipeline already computed for banding, so the verify join carries
k longs per doc (k=16 for the registry's pinned config = 128 B, ~6x
smaller than the arrays, and near-identical signatures across near-dup
docs compress hard under LZ4 shuffle compression). Per-pair verify cost
is O(k) regardless of document length — the shape that stays linear in
candidates at any scale.

Usage: python scripts/bench_m03_estimate.py [SF_DIR]
Prints one JSON line: {"query": "m03_minhash_lsh_dedup_estimate",
"sec": ..., "pairs": N}.
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


def main():
    spark = get_spark("bench-m03-estimate")
    docs = load_table(spark, SF_DIR, "documents")
    t0 = time.time()
    out = minhash_lsh_dedup(
        docs, threshold=0.12, num_hashes=16, bands=8, n=2,
        verify="estimate",
    )
    # count() is the sole (timed) action: it executes the full verify
    # pipeline once AND yields the pair count — a noop-sink write
    # followed by a count would run the expensive estimate stage twice
    # (once untimed), doubling the wall clock this script exists to
    # measure at sf100.
    pairs = out.count()
    sec = round(time.time() - t0, 2)
    print(json.dumps({
        "query": "m03_minhash_lsh_dedup_estimate",
        "sec": sec,
        "pairs": pairs,
        "sf_dir": SF_DIR,
    }))


if __name__ == "__main__":
    main()
