"""Delimited-text (CSV/TSV) trace ingest — the S-family source for
fleets that export logs as delimited files rather than the reference's
XML/JSONL (``trace_format = 'xml' | 'json'``, fdb_log_parser.py; this
is the third format slot its dispatch table would grow next).

Same contract as the XML/JSONL readers: explicit schema (never driver-
side inference over a 100 TB glob), PERMISSIVE parse with a quarantine
lane — malformed lines land whole in ``_corrupt_record`` instead of
killing the job or silently vanishing, exactly like S2's plaintext
fallback. Timestamps travel as formatted strings (microsecond
precision) and parse back with an explicit pattern; floats rely on
round-trippable Java double formatting, verified end-to-end by the s11
oracle pairing (exact integer micro-sums survive the round trip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

# Explicit on purpose: schema inference at scale means a second full
# scan of the glob before the first real one.
EVENTS_CSV_SCHEMA = (
    "event_id long, ts_str string, user_id long, event_type string, "
    "value double, props string, _corrupt_record string"
)


def write_events_csv(events: DataFrame, path: str) -> None:
    """Export the events table as headerless CSV (distributed write,
    one file per partition). Quoting/escaping is the Spark default on
    both ends, so JSON-bearing ``props`` round-trips byte-identically."""
    events.select(
        "event_id",
        F.date_format("ts", _TS_FMT).alias("ts_str"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).write.mode("overwrite").option("header", "false").csv(path)


def read_events_csv(spark: SparkSession, path: str) -> DataFrame:
    """Schema'd CSV scan with the corrupt-record quarantine lane: a line
    whose fields don't parse keeps its raw text in ``_corrupt_record``
    (PERMISSIVE — the 100 TB default: one bad exporter shard must not
    fail the corpus); well-formed rows carry a NULL there. The caller
    splits on that column; nothing is silently dropped.

    Pruning contract: Spark's CSV parser only PARSES the columns a
    query references (``spark.sql.csv.parser.columnPruning.enabled``,
    default on — it trades exactly this for scan speed), so a parse
    failure in an unreferenced column never trips the quarantine lane.
    A consumer that splits on ``_corrupt_record`` must therefore
    reference every column whose parse it relies on (s11 counts
    ``event_id`` for this reason); flip the session conf off to
    quarantine on ANY bad field at full-parse cost."""
    df = (
        spark.read.schema(EVENTS_CSV_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", "false")
        .csv(path)
    )
    return df.select(
        "event_id",
        F.to_timestamp("ts_str", _TS_FMT).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
        "_corrupt_record",
    )


def read_events_csv_stream(spark: SparkSession, path: str) -> DataFrame:
    """The streaming twin of ``read_events_csv``: a file-source CSV
    stream over a landing directory — ingest drops delimited shards,
    the stream picks them up; the PERMISSIVE quarantine lane rides
    along per micro-batch. Same explicit schema (a stream cannot
    infer), same pruning contract."""
    df = (
        spark.readStream.schema(EVENTS_CSV_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", "false")
        .csv(path)
    )
    return df.select(
        "event_id",
        F.to_timestamp("ts_str", _TS_FMT).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
        "_corrupt_record",
    )
