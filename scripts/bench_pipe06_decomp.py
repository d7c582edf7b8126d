"""pipe06 scale-slope scrutiny (VERDICT r12 item #5): the sf10r->sf100r
row pair 18.5 s -> 38.3 s is 2.1x/decade — confirm the sf100r run
drains the same per-row volume (not a trigger-count artifact) and
decompose the wall time per stage.

Usage: python scripts/bench_pipe06_decomp.py SF_DIR

Prints one JSON line: rows drained through the landing tree, files
landed, per-partition compacted row totals, and per-stage seconds
(source-split write, streaming drain+landing, compaction read+apply,
verify). The stages are the entry's own code path cut at its natural
seams — same slicing (event_id % 3 -> 3 micro-batches at ANY SF, by
design: trigger count is fixed, per-trigger volume scales), same
landing layout, same z-ordered compaction.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from db_loganalyzer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale/sf10r"
    spark = get_spark("pipe06-decomp")
    from db_loganalyzer_spark.operators.layout import (
        compaction_apply,
        compaction_plan,
        compaction_verify,
        zorder_key,
    )
    from db_loganalyzer_spark.operators.sketches import mix32

    P = 2147483647
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = tempfile.mkdtemp(prefix="p6d_src_")
    landing = tempfile.mkdtemp(prefix="p6d_landing_")
    out_dir = tempfile.mkdtemp(prefix="p6d_out_")
    ck = tempfile.mkdtemp(prefix="p6d_ck_")
    stages: dict[str, float] = {}
    try:
        t0 = time.time()
        for i in range(3):
            tmp = tempfile.mkdtemp(prefix=f"p6d_split{i}_")
            (
                ev.filter(F.pmod("event_id", F.lit(3)) == i)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(tmp)
            )
            part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            shutil.move(part, os.path.join(src, f"batch{i}.parquet"))
            shutil.rmtree(tmp, ignore_errors=True)
        stages["split_write"] = round(time.time() - t0, 2)

        t0 = time.time()
        raw = spark.read.parquet(src)
        stream = (
            spark.readStream.schema(raw.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def _land(batch_df, batch_id):
            tagged = batch_df.select(
                F.pmod("user_id", F.lit(4)).cast("long").alias("part_key"),
                (
                    F.lit(int(batch_id) * 4) + F.pmod("event_id", F.lit(4))
                ).cast("long").alias("file_id"),
                "event_id", "ts", "user_id", "event_type", "value",
            )
            (
                tagged.repartition(F.col("part_key"), F.col("file_id"))
                .write.mode("overwrite")
                .partitionBy("part_key", "file_id")
                .parquet(os.path.join(landing, f"batch_id={int(batch_id)}"))
            )

        q = (
            stream.writeStream.foreachBatch(_land)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        stages["stream_drain_landing"] = round(time.time() - t0, 2)

        t0 = time.time()
        small = spark.read.parquet(landing).select(
            F.col("part_key").cast("long").alias("part_key"),
            F.col("file_id").cast("long").alias("file_id"),
            "event_id", "ts", "user_id", "event_type", "value",
        )
        n_rows_source = ev.count()
        n_rows_landed = small.count()
        n_files_landed = len(
            _glob.glob(
                os.path.join(
                    landing, "batch_id=*/part_key=*/file_id=*/*.parquet"
                )
            )
        )
        stages["landed_counts"] = round(time.time() - t0, 2)

        t0 = time.time()
        manifest = small.groupBy("part_key", "file_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_rows_f")
        )
        plan = compaction_plan(manifest, 600, ["part_key"], bytes_col="n_rows_f")
        b = small.agg(
            F.min("user_id").alias("ul"), F.max("user_id").alias("uh"),
            F.min(F.unix_micros("ts")).alias("tl"),
            F.max(F.unix_micros("ts")).alias("th"),
        ).first()
        uspan = max(int(b["uh"]) - int(b["ul"]), 1)
        tspan = max(int(b["th"]) - int(b["tl"]), 1)
        gx = F.expr(f"(user_id - {int(b['ul'])}) * 255 div {uspan}")
        gy = F.expr(f"(unix_micros(ts) - {int(b['tl'])}) * 255 div {tspan}")
        clustered = small.withColumn(
            "__zkey", zorder_key(gx.cast("long"), gy.cast("long"), bits=8)
        )
        compaction_apply(clustered, plan, ["part_key"], out_dir,
                         sort_cols=["__zkey"])
        stages["compaction_apply"] = round(time.time() - t0, 2)

        t0 = time.time()
        micro = F.floor(F.col("value") * 1000000.0 + 0.5).cast("long")
        lin = (
            F.pmod(F.col("event_id"), F.lit(P)) * 1000003
            + F.pmod(F.col("user_id"), F.lit(P)) * 999983
            + F.pmod(F.unix_micros("ts"), F.lit(P)) * 1000033
            + F.pmod(micro, F.lit(P)) * 999979
            + F.length("event_type").cast("long") * 31
        )
        verify = compaction_verify(
            spark, out_dir, ["part_key"], mix32(lin, salt=7)
        ).collect()
        stages["verify"] = round(time.time() - t0, 2)

        print(json.dumps({
            "sf_dir": sf_dir,
            "n_rows_source": n_rows_source,
            "n_rows_landed": n_rows_landed,
            "n_files_landed": n_files_landed,
            "n_triggers": 3,
            "rows_equal": bool(
                n_rows_landed == n_rows_source
                and sum(r["n_rows"] for r in verify) == n_rows_source
            ),
            "n_rows_compacted": int(sum(r["n_rows"] for r in verify)),
            "stages_sec": stages,
            "total_sec": round(sum(stages.values()), 2),
        }))
    finally:
        for d in (src, landing, out_dir, ck):
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
