"""Measure opt01's REALIZED data-skipping win (VERDICT r10 item 8):
write the same events table (a) ts-range-sorted and (b) Z-ordered on
(ts, user_id), run a 2-D predicate suite against both, and record — per
(layout, predicate) — how many FILES and ROW GROUPS the parquet min/max
statistics actually prune, plus the filtered-count wall time.

The audit entry (opt01) reports per-bucket bounding boxes, which is the
PREDICTED effectiveness; this script closes the loop by counting what a
reader skips for real. Row-group pruning is computed exactly from the
parquet footers (pyarrow), i.e. engine-independent; wall time comes
from Spark reads with the predicate pushed down.

Usage: python scripts/bench_zorder.py [SF_DIR] [OUT.jsonl]
Defaults: /tmp/scale/sf10r bench_data/zorder_r11.jsonl
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from db_loganalyzer_spark.operators.layout import grid_terms, zorder_key
from db_loganalyzer_spark.session import get_spark

N_FILES = 64
BITS = 16


def write_layouts(spark, sf_dir, work):
    # ts lands as an explicit int64 microsecond column: the source (and
    # Spark 4's round-trip) stores TIMESTAMP(NANOS), whose parquet
    # row-group statistics pyarrow reports as absent — an int64 column
    # carries min/max everywhere and is what the z-key uses anyway
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id", "event_type", "value",
    )
    epoch = F.col("ts_us")
    bounds = ev.agg(
        F.min(epoch).alias("__xmin"), F.max(epoch).alias("__xmax"),
        F.min("user_id").cast("long").alias("__ymin"),
        F.max("user_id").cast("long").alias("__ymax"),
    )
    d = ev.crossJoin(F.broadcast(bounds))
    numx, spanx = grid_terms(epoch, F.col("__xmin"), F.col("__xmax"), BITS)
    numy, spany = grid_terms(
        F.col("user_id").cast("long"), F.col("__ymin"), F.col("__ymax"), BITS
    )
    keyed = d.withColumn("__nx", numx).withColumn("__sx", spanx).withColumn(
        "__ny", numy
    ).withColumn("__sy", spany).withColumn(
        "__z",
        zorder_key(
            F.expr("__nx div __sx"), F.expr("__ny div __sy"), BITS
        ),
    ).select("event_id", "ts_us", "user_id", "event_type", "value", "__z")

    ts_path = os.path.join(work, "events_ts_sorted")
    z_path = os.path.join(work, "events_zorder")
    (
        ev.repartitionByRange(N_FILES, "ts_us")
        .sortWithinPartitions("ts_us")
        .write.mode("overwrite")
        .parquet(ts_path)
    )
    (
        keyed.repartitionByRange(N_FILES, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(z_path)
    )
    return {"ts_sorted": ts_path, "zorder": z_path}


def footer_pruning(path, pred):
    """Exact file/row-group pruning from parquet footers: a unit is HIT
    if its [min,max] ranges overlap the predicate box on every bounded
    dimension (what any stats-based reader must scan)."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    f_total = f_hit = rg_total = rg_hit = 0
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        file_hit = False
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            hit = True
            for col, (lo, hi) in pred.items():
                st = rg.column(names[col]).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats -> the reader must scan it
                cmin, cmax = st.min, st.max
                if cmax < lo or cmin > hi:
                    hit = False
                    break
            rg_total += 1
            if hit:
                rg_hit += 1
                file_hit = True
        f_total += 1
        f_hit += int(file_hit)
    return f_total, f_hit, rg_total, rg_hit


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale/sf10r"
    out_path = (
        sys.argv[2] if len(sys.argv) > 2 else "bench_data/zorder_r11.jsonl"
    )
    work = "/tmp/zorder_bench"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark("bench-zorder")
    layouts = write_layouts(spark, sf_dir, work)

    # ~3%-of-ROWS slices per dimension (percentile bounds, so replica-id
    # holes in the key domain can't produce an accidentally-empty box):
    # the needle-in-a-month query shapes
    q = spark.read.parquet(layouts["ts_sorted"]).agg(
        F.expr("percentile(ts_us, array(0.45, 0.48))").alias("t"),
        F.expr("percentile(user_id, array(0.45, 0.48))").alias("u"),
    ).first()
    t_lo, t_hi = (int(x) for x in q["t"])
    u_lo, u_hi = (int(x) for x in q["u"])
    preds = {
        "ts_3pct": {"ts_us": (t_lo, t_hi)},
        "user_3pct": {"user_id": (u_lo, u_hi)},
        "both_3pct": {
            "ts_us": (t_lo, t_hi),
            "user_id": (u_lo, u_hi),
        },
    }

    with open(out_path, "w") as out:
        for lname, path in layouts.items():
            for pname, pred in preds.items():
                ft, fh, rt, rh = footer_pruning(path, pred)
                df = spark.read.parquet(path)
                cond = F.lit(True)
                for col, (lo, hi) in pred.items():
                    cond = cond & (F.col(col) >= lo) & (F.col(col) <= hi)
                t0 = time.time()
                n = df.filter(cond).count()
                wall = round(time.time() - t0, 3)
                row = {
                    "layout": lname, "predicate": pname, "rows": n,
                    "files_total": ft, "files_hit": fh,
                    "rowgroups_total": rt, "rowgroups_hit": rh,
                    "wall_sec": wall,
                }
                out.write(json.dumps(row) + "\n")
                print(row, flush=True)


if __name__ == "__main__":
    main()
