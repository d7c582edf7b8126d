"""Fresh-JVM bench experiment: mirrors bench.py but takes extra Spark confs
as KEY=VALUE argv pairs (set before session start, so core confs like
spark.shuffle.compress and spark.driver.memory take effect). Prints the
same one-line JSON as bench.py.

Usage: python scripts/bench_exp.py spark.shuffle.compress=false ...
Optional env: BENCH_EXP_PARTITIONS (cache repartition count, default 16).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from db_loganalyzer_spark.session import get_spark
from db_loganalyzer_spark.sources import tables
from bench import HEADLINE, SF_DIR


def main():
    extra = dict(a.split("=", 1) for a in sys.argv[1:])
    parts = int(os.environ.get("BENCH_EXP_PARTITIONS", "16"))
    spark = get_spark("bench-exp", extra_conf=extra)
    spark.conf.set("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "8"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    qs = entry_mod.queries()
    tables.cache_tables(spark, SF_DIR, partitions=parts)
    dfs = {name: qs[name](spark, SF_DIR) for name in HEADLINE}
    for name in HEADLINE:
        dfs[name].write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    for _ in range(3):
        for name in HEADLINE:
            t0 = time.time()
            dfs[name].write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            times[name] = min(times.get(name, dt), dt)
    times["total"] = round(sum(times.values()), 3)
    print(json.dumps({"confs": extra, "partitions": parts, **times}))
    spark.stop()


if __name__ == "__main__":
    main()
