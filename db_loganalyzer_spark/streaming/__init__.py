from .streams import (  # noqa: F401
    read_events_stream,
    read_table_stream,
    run_available_now,
    streaming_event_histogram,
    streaming_exact_dedup,
    streaming_rollup,
    streaming_sliding_rollup,
    streaming_sessions,
    streaming_ewma,
    streaming_hll_registers,
    streaming_value_drops,
    write_stream_parquet,
)
