"""Measure opt04's REALIZED compaction win (VERDICT r11 item 2): build
the small-files tree a streaming ingest leaves behind (8 partition dirs
x 64 parquet files), EXECUTE the opt03 sorted-fill plan through
layout.compaction_apply with the z-key local sort, and record — per
layout — the real file count, the parquet-footer row-group pruning for
the 2-D predicate suite, and the filtered-count wall time.

opt01/opt02 predicted the skipping; bench_zorder.py validated the
prediction for a one-shot z-ordered write; this closes the last gap:
the INCREMENTAL maintenance path (compact many small files into
plan-many big ones) preserves the table bit-for-bit (opt04's oracle
proves that) while restoring both the file-count hygiene and the
stats-pruning the small tree destroyed.

Usage: python scripts/bench_compaction.py [SF_DIR] [OUT.jsonl]
Defaults: /tmp/scale/sf10r bench_data/compaction_r12.jsonl
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

from db_loganalyzer_spark.operators.layout import (
    compaction_apply,
    compaction_plan,
    zorder_key,
)
from db_loganalyzer_spark.session import get_spark

N_PART_DIRS = 8
N_FILES_PER_DIR = 64
TARGET_ROWS = 20_000  # rows per compacted file (~50 output files at sf10r)
BITS = 8


def footer_pruning(path, pred):
    """Exact row-group pruning from parquet footers over a (possibly
    partitioned) tree: a unit is HIT if its [min,max] overlaps the
    predicate box on every bounded dimension."""
    import pyarrow.parquet as pq

    files = sorted(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
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
                    continue
                if st.max < lo or st.min > hi:
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
        sys.argv[2] if len(sys.argv) > 2 else "bench_data/compaction_r12.jsonl"
    )
    work = "/tmp/compaction_bench"
    shutil.rmtree(work, ignore_errors=True)
    small_path = os.path.join(work, "small_tree")
    compacted_path = os.path.join(work, "compacted")
    spark = get_spark("bench-compaction")

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )
    tagged = ev.select(
        F.pmod("user_id", F.lit(N_PART_DIRS)).cast("long").alias("part_key"),
        F.pmod("event_id", F.lit(N_FILES_PER_DIR))
        .cast("long")
        .alias("file_id"),
        "event_id",
        "ts_us",
        "user_id",
        "event_type",
        "value",
    )
    t0 = time.time()
    (
        tagged.repartition(F.col("part_key"), F.col("file_id"))
        .write.mode("overwrite")
        .partitionBy("part_key", "file_id")
        .parquet(small_path)
    )
    small_write = round(time.time() - t0, 3)

    small = spark.read.parquet(small_path).select(
        F.col("part_key").cast("long").alias("part_key"),
        F.col("file_id").cast("long").alias("file_id"),
        "event_id",
        "ts_us",
        "user_id",
        "event_type",
        "value",
    )
    manifest = small.groupBy("part_key", "file_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows_f")
    )
    plan = compaction_plan(
        manifest, TARGET_ROWS, ["part_key"], bytes_col="n_rows_f"
    )
    b = small.agg(
        F.min("user_id").alias("ul"),
        F.max("user_id").alias("uh"),
        F.min("ts_us").alias("tl"),
        F.max("ts_us").alias("th"),
    ).first()
    top = (1 << BITS) - 1
    uspan = max(int(b["uh"]) - int(b["ul"]), 1)
    tspan = max(int(b["th"]) - int(b["tl"]), 1)
    gx = F.expr(f"(user_id - {int(b['ul'])}) * {top} div {uspan}")
    gy = F.expr(f"(ts_us - {int(b['tl'])}) * {top} div {tspan}")
    clustered = small.withColumn(
        "__zkey", zorder_key(gx.cast("long"), gy.cast("long"), bits=BITS)
    )
    t0 = time.time()
    # ~16 row groups per compacted file: the z-sort inside each file
    # only becomes PRUNABLE stats at row-group granularity
    compaction_apply(
        clustered,
        plan,
        ["part_key"],
        compacted_path,
        sort_cols=["__zkey"],
        write_options={
            "parquet.block.size": 32 * 1024,
            "parquet.page.size": 8 * 1024,
        },
    )
    compact_wall = round(time.time() - t0, 3)
    n_groups = plan.select("part_key", "out_group").distinct().count()

    q = ev.agg(
        F.expr("percentile(ts_us, array(0.45, 0.48))").alias("t"),
        F.expr("percentile(user_id, array(0.45, 0.48))").alias("u"),
    ).first()
    t_lo, t_hi = (int(x) for x in q["t"])
    u_lo, u_hi = (int(x) for x in q["u"])
    preds = {
        "ts_3pct": {"ts_us": (t_lo, t_hi)},
        "user_3pct": {"user_id": (u_lo, u_hi)},
        "both_3pct": {"ts_us": (t_lo, t_hi), "user_id": (u_lo, u_hi)},
    }

    with open(out_path, "w") as out:
        meta = {
            "layout": "meta",
            "small_tree_files": N_PART_DIRS * N_FILES_PER_DIR,
            "planned_groups": n_groups,
            "small_write_sec": small_write,
            "compact_wall_sec": compact_wall,
            "target_rows": TARGET_ROWS,
        }
        out.write(json.dumps(meta) + "\n")
        print(meta, flush=True)
        for lname, path in (
            ("small_tree", small_path),
            ("compacted", compacted_path),
        ):
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
                    "layout": lname,
                    "predicate": pname,
                    "rows": n,
                    "files_total": ft,
                    "files_hit": fh,
                    "rowgroups_total": rt,
                    "rowgroups_hit": rh,
                    "wall_sec": wall,
                }
                out.write(json.dumps(row) + "\n")
                print(row, flush=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
