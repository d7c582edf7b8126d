"""Schemas for the normalized log tables.

Mirrors the reference's data model (see SURVEY.md §1; reference DDL at
/root/reference/data/schema.sql:1-68 and the pydantic EventModel at
/root/reference/data_transfer_object/event_dto.py:17-31) re-expressed as
Spark StructTypes. The envelope/payload split is identical: the keys in
``MANDATORY_FIELDS`` become typed columns, everything else lands in the
``fields`` map (MAP<STRING,STRING> instead of a JSON blob — enables
``map_entries``/``explode`` and stays JVM-side).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Envelope keys stripped from the fields map; everything else stays in it.
# Mirrors data_transfer_object/event_dto.py:10-14 EXACTLY — note the
# reference strips singular "Role"/"Process" but the plural "Roles"/
# "Processes" keys (which actually feed the role/process columns,
# tools/parser.py:80-81) remain in fields_json, so they remain in our
# fields map too.
MANDATORY_FIELDS = {
    "Severity",
    "Time",
    "DateTime",
    "Type",
    "Process",
    "Role",
    "PID",
    "Machine",
    "MachineId",
    "Address",
    "LogGroup",
    "File",
    "Line",
}

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("severity", T.IntegerType(), True),
        T.StructField("event", T.StringType(), True),
        T.StructField("process", T.StringType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("pid", T.IntegerType(), True),
        T.StructField("machine_id", T.StringType(), True),
        T.StructField("address", T.StringType(), True),
        T.StructField("trace_file", T.StringType(), True),
        T.StructField("src_line", T.IntegerType(), True),
        T.StructField("fields", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# EAV melt of the numeric-parseable payload entries
# (reference: data/schema.sql:17-25)
EVENT_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("event", T.StringType(), True),
        T.StructField("metric_name", T.StringType(), False),
        T.StructField("metric_value", T.DoubleType(), True),
        T.StructField("unit", T.StringType(), True),
        T.StructField("is_counter", T.BooleanType(), True),
    ]
)

# Curated wide pivot (reference: data/schema.sql:40-49)
EVENTS_WIDE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("grv_latency_ms", T.DoubleType(), True),
        T.StructField("txn_volume", T.DoubleType(), True),
        T.StructField("queue_bytes", T.DoubleType(), True),
        T.StructField("durability_lag_s", T.DoubleType(), True),
        T.StructField("data_move_in_flight", T.DoubleType(), True),
        T.StructField("disk_queue_bytes", T.DoubleType(), True),
        T.StructField("kv_ops", T.DoubleType(), True),
    ]
)

# reference: data/schema.sql:51-60
PROCESSES_SCHEMA = T.StructType(
    [
        T.StructField("process_key", T.StringType(), False),
        T.StructField("first_seen_ts", T.TimestampType(), True),
        T.StructField("last_seen_ts", T.TimestampType(), True),
        T.StructField("address", T.StringType(), True),
        T.StructField("pid", T.IntegerType(), True),
        T.StructField("class", T.StringType(), True),
        T.StructField("version", T.StringType(), True),
        T.StructField("command_line", T.StringType(), True),
    ]
)

# reference: data/schema.sql:62-68
PROCESS_ROLES_SCHEMA = T.StructType(
    [
        T.StructField("process_key", T.StringType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("start_ts", T.TimestampType(), True),
        T.StructField("end_ts", T.TimestampType(), True),
    ]
)

# Driver-provided synthetic tables (see TESTDATA.md)
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
