"""q05 flat-vs-bucketed layout at scale (VERDICT r6 item 8).

q05's fact⋈fact edge (lineitem ⋈ orders on orderkey) is the one measured
sf10 cost center (5.55 s in the round-6 sweep): past the broadcast
threshold both sides shuffle on every run. SCALING.md sells
``sinks.write_bucketed`` as the lever for REPEATED fact⋈fact joins —
pay the shuffle once at write time, then every later join on the bucket
key is exchange-free. The zero-Exchange plan is already pinned at toy
scale (tests/test_sinks.py); this script produces the measured number
at sf10 that turns the claim into evidence.

Usage: python scripts/bench_q05_bucketed.py [SF_DIR] [N_BUCKETS] [REPS]

Prints one JSON line per layout: {"layout": "flat"|"bucketed",
"sec": min-of-REPS warm, "exchanges_on_fact_join": N, ...} plus a
"write_sec" line for the one-time bucketing cost (the amortized
investment: it pays for itself after ~write_sec/saving runs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from db_loganalyzer_spark.session import get_spark
from db_loganalyzer_spark.sources import tables
from db_loganalyzer_spark.sources.sinks import write_bucketed
from db_loganalyzer_spark.operators.aggregates import dsum

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/scale/sf10r"
N_BUCKETS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def q05_from(li, orders, geo):
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(geo), orders["o_custkey"] == geo["c_custkey"])
        .groupBy("r_name", "n_name")
        .agg(dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def bench(df, reps):
    best = None
    for _ in range(reps):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3)


def count_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def main():
    spark = get_spark("bench-q05-bucketed")
    geo = tables.load_customer_geo(spark, SF_DIR)

    # flat: plain parquet scans, the join shuffles both facts every run
    li = tables.load_table(spark, SF_DIR, "lineitem")
    orders = tables.load_table(spark, SF_DIR, "orders")
    flat = q05_from(li, orders, geo)
    flat_sec = bench(flat, REPS)
    print(
        json.dumps(
            {
                "layout": "flat",
                "sec": flat_sec,
                "exchanges_total": count_exchanges(flat),
                "sf_dir": SF_DIR,
            }
        ),
        flush=True,
    )

    # one-time investment: bucket both facts on the join key
    t0 = time.time()
    write_bucketed(
        li, "bench_li_b", ["l_orderkey"], n_buckets=N_BUCKETS,
        sort_cols=["l_orderkey"],
    )
    write_bucketed(
        orders, "bench_orders_b", ["o_orderkey"], n_buckets=N_BUCKETS,
        sort_cols=["o_orderkey"],
    )
    write_sec = round(time.time() - t0, 3)
    print(
        json.dumps(
            {"layout": "bucketed_write_once", "write_sec": write_sec,
             "n_buckets": N_BUCKETS}
        ),
        flush=True,
    )

    li_b = spark.table("bench_li_b")
    orders_b = spark.table("bench_orders_b")
    bucketed = q05_from(li_b, orders_b, geo)
    buck_sec = bench(bucketed, REPS)
    print(
        json.dumps(
            {
                "layout": "bucketed",
                "sec": buck_sec,
                "exchanges_total": count_exchanges(bucketed),
                "speedup_vs_flat": round(flat_sec / buck_sec, 2)
                if buck_sec
                else None,
                "n_buckets": N_BUCKETS,
                "sf_dir": SF_DIR,
            }
        ),
        flush=True,
    )
    spark.sql("DROP TABLE IF EXISTS bench_li_b")
    spark.sql("DROP TABLE IF EXISTS bench_orders_b")
    spark.stop()


if __name__ == "__main__":
    main()
