"""CLI parity surface (reference cli_wrapper/main.py:39-226 argparse
dispatch, :711-718 entry): the reference's user-facing commands as a thin
argparse front over this engine's operators. The "database" is a Spark
warehouse directory of managed parquet tables — the catalog plays the
role the reference's single-file DB plays.

Commands
  init                      S10 — create database + five core tables
  load LOG_PATH             S1-S7 — ingest trace logs, append core tables
  query SQL_OR_FILE         S9  — ad-hoc SQL against the catalog
  stats                     A17 — totals, time range, severity/role/event
                            distributions (cli_wrapper/main.py:434-512)
  export SQL --out PATH     S8  — query result → csv/json/parquet
  rollup --window N         A5  — CTAS rollups_{N}s (tools/storage.py:328)
  chunk                     M8/A15 — marker chunks + summaries
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import SparkSession


def _spark(args) -> SparkSession:
    from .session import get_spark

    warehouse = os.path.abspath(args.db)
    return get_spark(
        "loganalyzer-cli",
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )


def _db_location(args) -> str:
    # explicit per-database location: the warehouse conf is a static conf
    # and silently keeps its old value if a session already exists
    return os.path.join(os.path.abspath(args.db), f"{args.database}.db")


def _use(spark: SparkSession, args) -> None:
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS {args.database} "
        f"LOCATION '{_db_location(args)}'"
    )
    spark.sql(f"USE {args.database}")
    # The default catalog is session-scoped: tables written by a previous
    # CLI process exist on disk but not in this process's catalog.
    # Re-attach each table directory found under the database location.
    loc = _db_location(args)
    if os.path.isdir(loc):
        for name in sorted(os.listdir(loc)):
            tdir = os.path.join(loc, name)
            if not os.path.isdir(tdir) or not name.isidentifier():
                continue
            if not spark.catalog.tableExists(f"{args.database}.{name}"):
                spark.sql(
                    f"CREATE TABLE {args.database}.{name} "
                    f"USING parquet LOCATION '{tdir}'"
                )


def handle_init(args) -> int:
    from .sources.sinks import bootstrap_tables

    spark = _spark(args)
    bootstrap_tables(
        spark,
        args.database,
        drop_existing=args.drop,
        location=_db_location(args),
    )
    print(f"initialized database '{args.database}' in {args.db}")
    return 0


def handle_load(args) -> int:
    from .sources.trace_logs import ingest, load_preprocessed_events

    spark = _spark(args)
    _use(spark, args)
    path = args.log_file
    if os.path.isdir(path):  # S5 multi-file load
        paths = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith((".xml", ".json", ".jsonl", ".log", ".txt"))
        )
    else:
        paths = [path]
    if args.preprocessed:
        events = load_preprocessed_events(spark, paths[0])
        events.write.mode(args.mode).saveAsTable("events")
        print(f"loaded {spark.table('events').count()} preprocessed events")
        return 0
    # appending into a populated DB: continue event_ids past the current
    # max so ids stay unique across CLI invocations (the reference tracks
    # the DB's max id the same way, cli_wrapper/main.py:296-301)
    id_offset = 0
    if args.mode == "append" and spark.catalog.tableExists("events"):
        from pyspark.sql import functions as F

        cur = spark.table("events").agg(F.max("event_id")).first()[0]
        id_offset = (cur or 0) + 1
    tables = ingest(spark, paths, id_offset)
    for name, df in tables.items():
        df.write.mode(args.mode).saveAsTable(name)
        print(f"{name}: {spark.table(name).count()} rows")
    return 0


def _read_sql(sql_or_file: str) -> str:
    if os.path.exists(sql_or_file):
        with open(sql_or_file) as f:
            return f.read()
    return sql_or_file


def handle_query(args) -> int:
    spark = _spark(args)
    _use(spark, args)
    spark.sql(_read_sql(args.sql)).show(args.limit, truncate=False)
    return 0


def handle_stats(args) -> int:
    spark = _spark(args)
    _use(spark, args)
    ev = spark.table("events")
    total = ev.count()
    print("=== Database Statistics ===")
    print(f"warehouse: {os.path.abspath(args.db)}")
    print(f"\nTotal events: {total}")
    if not total:
        return 0
    print("\nTime range:")
    spark.sql(
        "SELECT MIN(ts) AS min_time, MAX(ts) AS max_time FROM events"
    ).show(truncate=False)
    print("Severity distribution:")
    spark.sql(
        "SELECT severity, COUNT(*) AS count FROM events "
        "GROUP BY severity ORDER BY severity"
    ).show()
    print("Top 5 event types:")
    spark.sql(
        "SELECT event, COUNT(*) AS count FROM events "
        "GROUP BY event ORDER BY count DESC, event LIMIT 5"
    ).show(truncate=False)
    print("Role distribution (top 10):")
    spark.sql(
        "SELECT role, COUNT(*) AS count FROM events WHERE role IS NOT NULL "
        "GROUP BY role ORDER BY count DESC, role LIMIT 10"
    ).show()
    return 0


def handle_export(args) -> int:
    from .sources.sinks import export_result

    spark = _spark(args)
    _use(spark, args)
    df = spark.sql(_read_sql(args.sql))
    export_result(
        df, args.out, format=args.format, single_file=args.single_file
    )
    print(f"exported to {args.out} ({args.format})")
    return 0


def handle_rollup(args) -> int:
    from .operators.aggregates import windowed_rollup

    spark = _spark(args)
    _use(spark, args)
    joined = spark.table("events").join(
        spark.table("event_metrics"), "event_id"
    )
    roll = windowed_rollup(
        joined,
        args.window,
        ["role", "metric_name"],
        "metric_value",
        exact_percentile=not args.approx,
        deterministic_avg=False,  # reference parity: plain double AVG
    )
    roll.write.mode("overwrite").saveAsTable(f"rollups_{args.window}s")
    print(
        f"rollups_{args.window}s: "
        f"{spark.table(f'rollups_{args.window}s').count()} rows"
    )
    return 0


def handle_chunk(args) -> int:
    from pyspark.sql import functions as F

    from .operators.windows import marker_chunks

    spark = _spark(args)
    _use(spark, args)
    chunks = marker_chunks(
        spark.table("events"), F.col("event") == args.marker
    )
    summary = (
        chunks.groupBy("chunk_id")
        .count()
        .orderBy("chunk_id")
    )
    summary.show(args.limit)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="db-loganalyzer-spark",
        description="Spark-native log analysis tool (reference CLI parity)",
    )
    p.add_argument(
        "--db",
        default="spark-warehouse",
        help="warehouse directory (default: spark-warehouse)",
    )
    p.add_argument("--database", default="loganalyzer")
    sub = p.add_subparsers(title="subcommands", dest="command")

    sp = sub.add_parser("init", help="initialize database + core tables")
    sp.add_argument("--no-drop", dest="drop", action="store_false")
    sp.set_defaults(func=handle_init)

    sp = sub.add_parser("load", help="load log file(s); directories glob")
    sp.add_argument("log_file")
    sp.add_argument("--mode", default="append", choices=["append", "overwrite"])
    sp.add_argument(
        "--preprocessed",
        action="store_true",
        help="S4 JSON-array input instead of raw trace logs",
    )
    sp.set_defaults(func=handle_load)

    sp = sub.add_parser("query", help="ad-hoc SQL (string or file)")
    sp.add_argument("sql")
    sp.add_argument("--limit", type=int, default=20)
    sp.set_defaults(func=handle_query)

    sp = sub.add_parser("stats", help="database statistics report")
    sp.set_defaults(func=handle_stats)

    sp = sub.add_parser("export", help="query result -> csv/json/parquet")
    sp.add_argument("sql")
    sp.add_argument("--out", required=True)
    sp.add_argument(
        "--format", default="parquet", choices=["csv", "json", "parquet"]
    )
    sp.add_argument("--single-file", action="store_true")
    sp.set_defaults(func=handle_export)

    sp = sub.add_parser("rollup", help="materialize rollups_{N}s")
    sp.add_argument("--window", type=int, default=60)
    sp.add_argument(
        "--approx",
        action="store_true",
        help="p95 via mergeable sketch (the 100TB path) instead of exact",
    )
    sp.set_defaults(func=handle_rollup)

    sp = sub.add_parser("chunk", help="marker-based chunk summaries")
    sp.add_argument("--marker", default="MasterRecoveryState")
    sp.add_argument("--limit", type=int, default=20)
    sp.set_defaults(func=handle_chunk)

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not getattr(args, "func", None):
        build_parser().print_help()
        return 2
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
