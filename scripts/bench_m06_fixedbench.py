"""m06's PRODUCTION shape at large SF (round-8 disposition).

The registry entry `m06_decontaminate` takes its benchmark side as a 2%
slice of the corpus (`doc_id % 50 = 0`) so the DuckDB oracle can state
it — which means the bench-side shingle index GROWS with SF and crosses
the broadcast threshold between sf10r and sf100r: the probe ratio
(21.0 s -> 403.0 s = 19.2x for 10x data) is the one-time broadcast-probe
-> shuffle-join step change of the synthetic entry, not the operator's
asymptotics.

Production decontamination has a FIXED-size eval set (eval benchmarks
don't grow with the training corpus). This script measures that shape:
the same `ngram_contamination` call with the bench side pinned to a
constant absolute id range (doc_id % 50 = 0 AND doc_id < 500_000 —
~10k docs at BOTH sf10r and sf100r), so the sf10r -> sf100r ratio
isolates the corpus-side scan scaling, which is the 100 TB claim
(scan + broadcast-probe, no corpus shuffle).

Usage: python scripts/bench_m06_fixedbench.py [SF_DIR]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from db_loganalyzer_spark.session import get_spark
from db_loganalyzer_spark.operators.dedup import ngram_contamination
from db_loganalyzer_spark.sources.tables import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/scale/sf100r"
BENCH_ID_CAP = 500_000  # constant across SFs => constant bench size


def main():
    spark = get_spark("bench-m06-fixedbench")
    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(
        (F.col("doc_id") % 50 == 0) & (F.col("doc_id") < BENCH_ID_CAP)
    )
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    t0 = time.time()
    out = ngram_contamination(corpus, bench, n=3)
    out.write.format("noop").mode("overwrite").save()
    sec = round(time.time() - t0, 2)
    n_bench = bench.count()
    print(json.dumps({
        "query": "m06_decontaminate_fixedbench",
        "sec": sec,
        "bench_docs": n_bench,
        "sf_dir": SF_DIR,
    }))


if __name__ == "__main__":
    main()
