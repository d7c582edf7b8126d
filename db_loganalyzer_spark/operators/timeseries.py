"""Time-series shaping operators: resample/gap-fill and SCD2 intervals.

Log streams are irregular; downstream models and dashboards want a
regular grid (one row per key per bucket, holes filled forward) or a
state-history table (one row per key per *value run*, with validity
intervals). Both reduce event-volume data to bucket/run-level rows
first, so every window below operates on O(span / bucket) or O(distinct
runs) rows per key — never on raw event volume.

Scale shape:
- the only pass over raw events is a two-phase groupBy (map-side
  partial ``max_by``), shuffling one row per (key, bucket);
- the grid explode is bounded by ``time_span / bucket_seconds`` per key
  (a 1-year span at 6h buckets is 1460 rows per key, whatever the
  event volume);
- per-key windows partition on the key — no global window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from db_loganalyzer_spark.functions.scalars import bucket_start


def gap_fill(
    df: DataFrame,
    bucket_seconds: int,
    partition_by: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Resample the non-null value stream onto a regular bucket grid per
    key, carrying the last observation forward across empty buckets
    (LOCF). Emits ``(keys..., bucket, value, is_gap)`` for every bucket
    between each key's first and last observation.

    "Last" inside a bucket is the value at the greatest ``(ts,
    tiebreak)`` — the same total order every sequence operator in this
    engine uses (windows._w), reduced with ``max_by`` so the bucket
    collapse happens map-side, not in a window over raw events.
    """
    if not partition_by:
        raise ValueError("gap_fill needs at least one partition key")
    observed = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            *partition_by,
            bucket_start(ts_col, bucket_seconds).alias("bucket"),
        )
        .agg(
            F.max_by(
                F.col(value_col), F.struct(ts_col, tiebreak)
            ).alias("__last")
        )
    )
    spans = observed.groupBy(*partition_by).agg(
        F.min("bucket").alias("__b0"), F.max("bucket").alias("__b1")
    )
    grid = spans.select(
        *partition_by,
        F.explode(
            F.sequence("__b0", "__b1", F.lit(int(bucket_seconds)))
        ).alias("bucket"),
    )
    joined = grid.join(observed, [*partition_by, "bucket"], "left")
    w = (
        Window.partitionBy(*partition_by)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *partition_by,
        "bucket",
        F.last("__last", ignorenulls=True).over(w).alias(value_col),
        F.col("__last").isNull().alias("is_gap"),
    )


def scd2_intervals(
    df: DataFrame,
    state_col: str,
    partition_by: list[str],
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Collapse a per-key event stream into SCD-type-2 state history:
    one row per run of consecutive identical ``state_col`` values, with
    ``[valid_from, valid_to)`` bounds (``valid_to`` NULL on the open
    current run). The warehouse dimension-building pass: an as-of join
    against the output (j07) reconstructs state at any point in time.

    One key shuffle: the run-start filter sits between two window
    stages over the same (key, order) spec, so the second stage reuses
    the first's hash partitioning (one Exchange; each stage sorts its
    own — filtered — input). Run boundaries compare with null-safe
    equality, so NULL states form runs too.
    """
    order = [F.col(ts_col), F.col(tiebreak)]
    w = Window.partitionBy(*partition_by).orderBy(*order)
    prev = F.lag(F.col(state_col)).over(w)
    prev_cnt = F.count(F.lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    changes = df.withColumn(
        "__is_run_start",
        (prev_cnt == 0) | ~F.col(state_col).eqNullSafe(prev),
    ).filter(F.col("__is_run_start"))
    nxt = F.lead(F.col(ts_col)).over(w)
    return changes.select(
        *partition_by,
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def level_shifts(
    df: DataFrame,
    value_col: str,
    window_seconds: int,
    partition_by: list[str],
    ts_col: str = "ts",
    min_points: int = 5,
    id_col: str = "event_id",
) -> DataFrame:
    """Level-shift (change-point) scoring: at every event, the
    difference between the NEXT window's mean and the PREVIOUS
    window's mean of the key's values — a step change scores ~ its
    height, noise scores ~ 0. The two means are RANGE frames on epoch
    micros ((-W, -1] behind, [0, W-1] ahead, so the current row counts
    in the leading side only); rows without ``min_points`` on both
    sides are dropped rather than scored on noise.

    One key shuffle, two frames over one sort; means ride integer
    micro-units (dsum discipline) so scores hash-match across engines.
    """
    micros = F.unix_micros(F.col(ts_col))
    base = Window.partitionBy(*partition_by).orderBy(micros)
    w_us = int(window_seconds) * 1_000_000
    prev_f = base.rangeBetween(-w_us, -1)
    next_f = base.rangeBetween(0, w_us - 1)
    v = F.col(value_col)
    vm = F.floor(v * F.lit(1000000.0) + F.lit(0.5)).cast("long")

    def mean_over(frame):
        n = F.count(v).over(frame)
        return n, F.sum(vm).over(frame).cast("double") / F.lit(1000000.0) / n

    n_prev, avg_prev = mean_over(prev_f)
    n_next, avg_next = mean_over(next_f)
    return (
        df.select(
            *partition_by,
            F.col(id_col),
            micros.alias("ts_us"),
            n_prev.cast("long").alias("n_prev"),
            n_next.cast("long").alias("n_next"),
            avg_prev.alias("avg_prev"),
            avg_next.alias("avg_next"),
            (avg_next - avg_prev).alias("shift"),
        )
        .filter(
            (F.col("n_prev") >= min_points) & (F.col("n_next") >= min_points)
        )
    )


def counter_rates(
    df: DataFrame,
    value_col: str,
    partition_by: list[str],
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Per-sample rate of a monotonic counter (the Prometheus ``rate()``
    primitive): ``(v - prev_v) / (t - prev_t)`` between consecutive
    samples per key, with counter RESETS handled the standard way — a
    drop (v < prev_v) means the counter restarted, so the increase is
    taken as ``v`` (from zero), not the negative difference. Rows with
    no predecessor, or zero elapsed time (duplicate timestamps), emit
    NULL rather than a fake rate.

    One key shuffle, one lag window over the (ts, tiebreak) total
    order; the rate is a single IEEE division of exact micro-second
    deltas — deterministic cross-engine unrounded.
    """
    micros = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(*partition_by).orderBy(
        F.col(ts_col), F.col(tiebreak)
    )
    v = F.col(value_col)
    prev_v = F.lag(v).over(w)
    prev_t = F.lag(micros).over(w)
    dt_us = micros - prev_t
    increase = F.when(v >= prev_v, v - prev_v).otherwise(v)
    rate = F.when(
        prev_v.isNotNull() & (dt_us > 0),
        increase / (dt_us.cast("double") / 1000000.0),
    )
    return df.select(
        *partition_by,
        F.col(tiebreak),
        micros.alias("ts_us"),
        v.alias(value_col),
        prev_v.alias("prev_value"),
        # coalesced: the first sample of a key is not a reset (also the
        # one nullable-boolean that pandas renders differently per
        # engine — None vs NaN — in the oracle comparison layer)
        F.coalesce(v < prev_v, F.lit(False)).alias("is_reset"),
        rate.alias("rate_per_s"),
    )
