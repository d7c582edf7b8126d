"""SparkSession builder tuned for this engine.

Local testing runs ``local[N]`` in one JVM; the configs below are chosen so
the same code scales to a real cluster: AQE for runtime re-planning and skew
joins, UTC session timezone (matches the DuckDB oracle and the reference's
UTC trace timestamps), Arrow for the few pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "db_loganalyzer_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    ``shuffle_partitions`` defaults to the local core count — at cluster
    scale this should be ~2-3x the total executor cores instead; AQE's
    partition coalescing makes the initial value mostly a ceiling.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    n_shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # larger cached-columnar batches amortize per-batch dispatch in
        # whole-stage codegen over cached tables (default 10k is conservative)
        .config("spark.sql.inMemoryColumnarStorage.batchSize", "65536")
        # the driver's events.parquet has stored ts as TIMESTAMP(NANOS)
        # (no native Spark type; read as long + convert in load_table) or
        # as naive TIMESTAMP(MICROS). For the latter, NTZ inference is
        # disabled so naive micros read as session-tz (UTC) timestamps —
        # same interpretation as the DuckDB oracle's naive timestamps.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
