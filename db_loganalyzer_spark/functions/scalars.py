"""Small shared scalar column helpers used across operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(ts: Column | str) -> Column:
    """EXTRACT(EPOCH FROM ts) equivalent: double seconds including the
    fractional part (timestamp->double cast is epoch seconds in Spark)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return c.cast("double")


def bucket_start(ts: Column | str, seconds: int) -> Column:
    """FLOOR(EPOCH(ts)/N)*N epoch bucketing (reference:
    tools/investigation_tools/global_scanner.py:232-252). Returned as a
    BIGINT epoch so the DuckDB oracle expression matches exactly."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return (F.floor(F.unix_timestamp(c) / seconds) * seconds).cast("long")


def finite_guard(c: Column) -> Column:
    """isfinite(x) AND abs(x) < 1e308 (reference: global_scanner.py:74)."""
    return (~F.isnan(c)) & (F.abs(c) < F.lit(1e308))
