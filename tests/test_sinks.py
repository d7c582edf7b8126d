"""Egress + DDL surfaces (S4/S8/S10/A7) smoke tests."""

import json
import os

import pytest
from pyspark.sql import functions as F

from db_loganalyzer_spark.sources.sinks import (
    CORE_TABLES,
    bootstrap_tables,
    export_result,
    write_metric_baselines,
)
from db_loganalyzer_spark.sources.trace_logs import load_preprocessed_events


@pytest.fixture()
def small_df(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, name string, val double"
    )


@pytest.mark.parametrize("fmt", ["csv", "json", "parquet"])
def test_export_roundtrip(spark, small_df, tmp_path, fmt):
    out = str(tmp_path / f"out_{fmt}")
    export_result(small_df, out, format=fmt, single_file=True)
    if fmt == "csv":
        back = spark.read.option("header", "true").csv(out)
    elif fmt == "json":
        back = spark.read.json(out)
    else:
        back = spark.read.parquet(out)
    assert back.count() == 2
    assert set(back.columns) == {"id", "name", "val"}
    # single_file writes exactly one data part
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 1


def test_export_rejects_unknown_format(small_df, tmp_path):
    with pytest.raises(ValueError):
        export_result(small_df, str(tmp_path / "x"), format="xml")


def test_bootstrap_creates_core_tables(spark):
    bootstrap_tables(spark, database="t_boot")
    tables = {r.tableName for r in spark.sql("SHOW TABLES IN t_boot").collect()}
    assert set(CORE_TABLES) <= tables
    # empty but correctly typed
    ev = spark.table("t_boot.events")
    assert ev.count() == 0
    assert dict(ev.dtypes)["fields"] == "map<string,string>"
    # idempotent re-run (drop + recreate)
    bootstrap_tables(spark, database="t_boot")
    assert spark.table("t_boot.events").count() == 0


def test_write_metric_baselines(spark, tmp_path):
    base = spark.createDataFrame(
        [("VersionLag", "SS", 1.0, 0.5, 2.0, 0.0, 3.0, 10)],
        "metric_name string, role string, mean double, stddev double,"
        "p95 double, min double, max double, count long",
    )
    path = str(tmp_path / "baselines")
    write_metric_baselines(base, path)
    back = spark.read.parquet(path)
    assert back.count() == 1
    assert "updated_at" in back.columns
    # overwrite semantics: rewriting replaces, not appends
    write_metric_baselines(base, path)
    assert spark.read.parquet(path).count() == 1


def test_load_preprocessed_events_string_and_null_fields(spark, tmp_path):
    rows = [
        {
            "event_id": 1,
            "ts": "2024-02-03T04:05:06Z",
            "severity": 20,
            "event": "Role",
            "fields_json": json.dumps({"A": "1"}),
            "raw_json": json.dumps({"Type": "Role"}),
        },
        {
            "event_id": 2,
            "ts": "2024-02-03T04:05:07",
            "severity": None,
            "event": None,
            "fields_json": None,
            "raw_json": None,
        },
    ]
    p = tmp_path / "pre.json"
    p.write_text(json.dumps(rows))
    ev = load_preprocessed_events(spark, str(p))
    got = {r["event_id"]: r for r in ev.collect()}
    assert got[1]["fields"] == {"A": "1"}
    assert got[1]["ts"].isoformat() == "2024-02-03T04:05:06"
    assert got[2]["fields"] == {}
    assert got[2]["severity"] is None
    assert set(ev.columns) >= {
        "event_id", "ts", "severity", "event", "role", "fields",
    }


def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path):
    """Two tables bucketed by the join key with the same bucket count:
    Spark proves co-partitioning, so the join plans with NO Exchange on
    either side — the write-once/join-many lever for J1 at scale. With
    sortBy the per-task Sort disappears too."""
    from db_loganalyzer_spark.sources.sinks import write_bucketed
    from db_loganalyzer_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    metrics = ev.select(
        "event_id", (F.col("value") * 2).alias("metric_value")
    )
    write_bucketed(ev, "ev_bucketed", ["event_id"], 4, sort_cols=["event_id"])
    write_bucketed(
        metrics, "metrics_bucketed", ["event_id"], 4, sort_cols=["event_id"]
    )
    joined = spark.table("ev_bucketed").join(
        spark.table("metrics_bucketed").hint("merge"), "event_id"
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # bucket layout replaces the shuffle
    n = joined.count()
    assert n == ev.count()
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS metrics_bucketed")


def test_partitioned_scan_prunes(spark, sf_dir, tmp_path):
    """Day-partitioned layout: a predicate on the partition column lands
    in the scan's PartitionFilters — whole directories are skipped before
    any parquet footer is read (the 100 TB time-slice path)."""
    from db_loganalyzer_spark.sources.sinks import write_partitioned
    from db_loganalyzer_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(ev, path, ["event_date"])

    back = spark.read.parquet(path)
    one_day = ev.groupBy("event_date").count().orderBy("event_date").first()
    sliced = back.filter(F.col("event_date") == F.lit(one_day["event_date"]))
    plan = sliced._jdf.queryExecution().executedPlan().toString()
    # the partition predicate must be a directory-level filter, not a
    # row-level one: PartitionFilters carries it, PushedFilters does not
    assert "PartitionFilters: [" in plan
    assert "event_date" in plan.split("PartitionFilters")[1].split("]")[0]
    assert sliced.count() == one_day["count"]
