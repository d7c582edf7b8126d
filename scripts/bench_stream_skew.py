"""Streaming skew evidence (round-10): j13's salted layout measured in
the ONE regime AQE cannot help — stream-stream joins in micro-batches
(AQE is disabled under streaming, so OptimizeSkewedJoin never splits the
hot partition).

Method: plant a hot key on the PROBE side of st13's stream-stream
interval join — a deterministic 30% slice of click rows is remapped to
one user id, so every micro-batch lands ~30% of its click volume (the
state-heavy side) in a single shuffle partition's state store and join
task. The error side keeps its original key distribution, so the hot
rows produce (almost) no extra OUTPUT — the experiment isolates task/
state skew from result-size blowup. Two variants stream the SAME landed
slices:

  plain   — equi keys (err_user, clk_user): the hot user's clicks all
            hash to one task per micro-batch.
  salted  — clicks carry salt = pmod(xxhash64(clk_id), S) (a within-key
            VARYING column, never the key); errors are exploded S ways;
            the join runs on (user, salt). Row-for-row the plain join
            (each click meets each error replica exactly once), the
            batch equivalence j13's oracle + unit test pin.

Reported per variant from StreamingQueryProgress: micro-batch p50/p95,
sustained rows/s, state rows/MB, and the output count (must match).

Usage: python scripts/bench_stream_skew.py [SF_DIR] [N_SLICES] [S] [HOT_TENTHS]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from db_loganalyzer_spark.session import get_spark
from db_loganalyzer_spark.streaming import streams as ST

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/scale/sf10r"
N_SLICES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SALTS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
HOT_TENTHS = int(sys.argv[4]) if len(sys.argv) > 4 else 3  # 3 => 30% of clicks
HOT_USER = 424_242


def main():
    spark = get_spark("bench_stream_skew")
    from scripts.bench_streaming import (  # reuse the landing harness
        drain_with_progress,
        land_slices,
        stream_from,
    )
    from db_loganalyzer_spark.sources.tables import load_table

    workdir = tempfile.mkdtemp(prefix="stream_skew_")
    # land ONE skewed copy of events: 30% of CLICK rows remapped to the
    # hot user (deterministic in event_id), everything else untouched
    ev = load_table(spark, SF_DIR, "events")
    skewed = ev.withColumn(
        "user_id",
        F.when(
            (F.col("event_type") == "click")
            & (F.pmod(F.xxhash64("event_id"), F.lit(10)) < HOT_TENTHS),
            F.lit(HOT_USER),
        ).otherwise(F.col("user_id")),
    )
    import scripts.bench_streaming as BS

    BS.SF_DIR = SF_DIR  # land_slices reads the module global
    BS.N_SLICES = N_SLICES
    skew_dir = os.path.join(workdir, "events_skewed")
    os.makedirs(skew_dir, exist_ok=True)
    # land_slices loads by table name; write our frame the same way
    sliced = skewed.orderBy("ts", "event_id").repartitionByRange(
        N_SLICES, "ts", "event_id"
    )
    tmp = os.path.join(workdir, "__parts")
    sliced.write.mode("overwrite").parquet(tmp)
    import shutil
    import time

    parts = sorted(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    for i, fname in enumerate(parts):
        shutil.move(
            os.path.join(tmp, fname),
            os.path.join(skew_dir, f"events-{i:05d}.parquet"),
        )
        time.sleep(0.02)
    n = skewed.count()
    hot = skewed.filter(F.col("user_id") == HOT_USER).count()
    print(
        json.dumps(
            {"landed_rows": n, "hot_rows": hot, "slices": len(parts),
             "salts": SALTS, "hot_tenths": HOT_TENTHS, "sf_dir": SF_DIR}
        )
    )

    def sides(tag: str):
        sa = (
            stream_from(spark, skew_dir, skewed)
            .filter(F.col("event_type") == "error")
            .select(
                F.col("event_id").alias("err_id"),
                F.col("user_id").alias("err_user"),
                F.col("ts").alias("err_ts"),
            )
        )
        sb = (
            stream_from(spark, skew_dir, skewed)
            .filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("clk_id"),
                F.col("user_id").alias("clk_user"),
                F.col("ts").alias("clk_ts"),
            )
        )
        return sa, sb

    results = {}
    for variant in ("plain", "salted"):
        sa, sb = sides(variant)
        if variant == "salted":
            sb = sb.withColumn(
                "clk_salt",
                F.pmod(F.xxhash64("clk_id"), F.lit(SALTS)).cast("int"),
            )
            sa = sa.withColumn(
                "err_salt", F.explode(F.sequence(F.lit(0), F.lit(SALTS - 1)))
            )
            keys = [("err_user", "clk_user"), ("err_salt", "clk_salt")]
        else:
            keys = [("err_user", "clk_user")]
        sij = ST.streaming_interval_join(
            sa, sb, keys, 3600, left_ts="err_ts", right_ts="clk_ts"
        )
        # count output via a foreachBatch-free path: drain to noop for
        # timing, then recompute the count with a second tiny drain to
        # parquet? Instead: drain once to parquet so timing INCLUDES the
        # same sink work for both variants and the count is exact.
        out_dir = os.path.join(workdir, f"out_{variant}")
        q = (
            sij.writeStream.format("parquet")
            .queryName(f"st13_skew_{variant}")
            .outputMode("append")
            .option("path", out_dir)
            .option(
                "checkpointLocation",
                os.path.join(workdir, "ckpt", variant),
            )
            .trigger(availableNow=True)
            .start()
        )
        t0 = time.time()
        q.awaitTermination()
        wall = time.time() - t0
        prog = [
            p if isinstance(p, dict) else json.loads(p.json)
            for p in q.recentProgress
        ]
        batches = [p for p in prog if p.get("numInputRows", 0) > 0]
        durs = sorted(p["batchDuration"] for p in batches)
        state_rows = state_mb = 0
        for p in reversed(prog):
            ops = p.get("stateOperators") or []
            if ops:
                state_rows = sum(o.get("numRowsTotal", 0) for o in ops)
                state_mb = sum(
                    o.get("memoryUsedBytes", 0) for o in ops
                ) / 1e6
                break
        out_rows = spark.read.parquet(out_dir).count()
        if variant == "salted":
            out_cols = spark.read.parquet(out_dir).drop(
                "err_salt", "clk_salt"
            )
            out_rows = out_cols.count()
        row = {
            "query": f"st13_skew_{variant}",
            "wall_sec": round(wall, 2),
            "micro_batches": len(batches),
            "batch_ms_p50": durs[len(durs) // 2] if durs else None,
            "batch_ms_p95": durs[int(len(durs) * 0.95)] if durs else None,
            "batch_ms_max": durs[-1] if durs else None,
            "state_rows": state_rows,
            "state_mb": round(state_mb, 2),
            "output_rows": out_rows,
            "salts": SALTS if variant == "salted" else None,
        }
        results[variant] = row
        print(json.dumps(row))
    assert (
        results["plain"]["output_rows"] == results["salted"]["output_rows"]
    ), "salted output must equal plain output row count"


if __name__ == "__main__":
    main()
