"""db_loganalyzer_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of EC528-Fall-2025/DB-LogAnalyzer.

The reference (surveyed in SURVEY.md) is a FoundationDB trace-log analytics
pipeline built on DuckDB SQL + row-at-a-time Python. This package re-expresses
every capability Spark-first: declarative DataFrame/SQL plans optimized by
Catalyst, window functions instead of Python loops, broadcast joins instead of
lookup dicts, and Pandas UDFs only where built-ins genuinely can't express the
semantics.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, UTC, Arrow).
- ``model``      : schemas for the normalized event tables.
- ``sources``    : trace-log ingestion (XML / JSONL / plaintext) and
                   parquet table loaders; export sinks.
- ``functions``  : shared column expressions (``safe_float`` et al.).
- ``operators``  : filters, aggregates, windows, joins, rollups, chunking,
                   dedup, similarity, text stats, multimodal plumbing —
                   all pure DataFrame -> DataFrame functions.
- ``detectors``  : composite anomaly detectors (D1-D11 in SURVEY §2.11).
- ``streaming``  : Structured Streaming forms of the rollup/session ops.
- ``agent``      : driver-side investigation loop with an injectable
                   (stub-by-default) LLM client.
"""

__version__ = "0.1.0"
