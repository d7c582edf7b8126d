"""One-off experiment: time the headline queries under different runtime
configs (shuffle partitions, AQE, cached base tables) to pick bench.py's
defaults. Passes run in ONE JVM, so later passes benefit from codegen/JIT
warmup — re-check the winner in a fresh process with bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from db_loganalyzer_spark.session import get_spark
from db_loganalyzer_spark.sources import tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HEADLINE = [
    "q01_pricing_summary", "q03_shipping_priority", "q05_nation_revenue",
    "a05_rollup_3600s", "a06_metric_baselines", "a10_zscore_hotspots",
    "j03_lookback_join", "w01_value_drops", "w05_sessionization",
    "t01_topk_per_group",
]


def run_pass(spark, qs, label):
    times = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times[name] = time.time() - t0
    total = sum(times.values())
    per = " ".join(f"{k.split('_')[0]}={v:.2f}" for k, v in times.items())
    print(f"[{label}] total={total:.2f}s  {per}", flush=True)
    return total


def main():
    spark = get_spark("bench-tune")
    qs = entry_mod.queries()
    # warmup
    qs[HEADLINE[0]](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    run_pass(spark, qs, "baseline s=32 aqe=on")
    run_pass(spark, qs, "baseline again (warm)")

    spark.conf.set("spark.sql.shuffle.partitions", "8")
    run_pass(spark, qs, "s=8 aqe=on")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    run_pass(spark, qs, "s=8 aqe=off")

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # cache every base table once, materialize
    cached = {}
    for t in ("lineitem", "orders", "customer", "supplier", "nation",
              "region", "part", "events", "documents", "embeddings"):
        df = tables.load_table(spark, SF_DIR, t).cache()
        df.count()
        cached[(SF_DIR, t)] = df
    tables._CACHE = cached  # type: ignore[attr-defined]
    orig = tables.load_table

    def cached_load(spark, sf_dir, name):
        return cached.get((sf_dir, name)) or orig(spark, sf_dir, name)

    tables.load_table = cached_load
    entry_mod.load_table = cached_load
    run_pass(spark, qs, "s=8 aqe=on cache")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    run_pass(spark, qs, "s=8 aqe=off cache")

    spark.conf.set("spark.sql.shuffle.partitions", "4")
    run_pass(spark, qs, "s=4 aqe=off cache")

    spark.stop()


if __name__ == "__main__":
    main()
