"""Window / sequence operators (SURVEY §2.5, W1-W10).

The reference walks Python lists ordered by ts; here each becomes a Spark
window function. Every operator takes ``partition_by`` — at test scale a
global order (no partitions) reproduces the reference exactly; at 100 TB
you partition by a natural stream key (machine/trace_file/user) so no
single task holds the whole ordering. See ``stitched`` variants' notes for
the boundary-merge strategy when a truly global order is unavoidable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _w(partition_by: list[str], ts_col: str, tiebreak: str | None):
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.orderBy(*order)
    return w.partitionBy(*partition_by) if partition_by else w


def value_drops(
    df: DataFrame,
    value_col: str,
    partition_by: list[str] | None = None,
    ts_col: str = "ts",
    tiebreak: str | None = "event_id",
) -> DataFrame:
    """W1 — compare each non-null value with the LAST NON-NULL previous
    value (not plain lag — nulls are skipped, matching the reference's
    per-column prev tracking); emit rows where the value dropped.

    reference: global_scanner.py:273-323
    """
    w = _w(partition_by or [], ts_col, tiebreak).rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev = F.last(F.col(value_col), ignorenulls=True).over(w)
    return (
        df.withColumn("prev_value", prev)
        .filter(
            F.col(value_col).isNotNull()
            & F.col("prev_value").isNotNull()
            & (F.col(value_col) < F.col("prev_value"))
        )
        .withColumn("drop_amount", F.col("prev_value") - F.col(value_col))
    )


def value_resets(
    df: DataFrame,
    value_col: str,
    high: float,
    low: float,
    partition_by: list[str] | None = None,
    ts_col: str = "ts",
    tiebreak: str | None = "event_id",
) -> DataFrame:
    """W2 — flag transitions prev > high AND current < low (version reset).

    reference: global_scanner.py:325-354
    """
    w = _w(partition_by or [], ts_col, tiebreak).rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev = F.last(F.col(value_col), ignorenulls=True).over(w)
    return (
        df.withColumn("prev_value", prev)
        .filter((F.col("prev_value") > high) & (F.col(value_col) < low))
    )


def lag_regressions(
    df: DataFrame,
    value_col: str,
    partition_by: list[str] | None = None,
    ts_col: str = "ts",
    tiebreak: str | None = "event_id",
) -> DataFrame:
    """W3 — plain-lag regression: current < immediately previous value.

    reference: global_scanner.py:356-385 (RecoveryVersion regressions)
    """
    w = _w(partition_by or [], ts_col, tiebreak)
    prev = F.lag(F.col(value_col)).over(w)
    return (
        df.withColumn("prev_value", prev)
        .filter(F.col("prev_value").isNotNull() & (F.col(value_col) < F.col("prev_value")))
        .withColumn("drop_amount", F.col("prev_value") - F.col(value_col))
    )


def sessionize(
    df: DataFrame,
    gap_seconds: float,
    partition_by: list[str] | None = None,
    ts_col: str = "ts",
    tiebreak: str | None = "event_id",
) -> DataFrame:
    """W5 — gaps-and-islands sessionization: new session where the gap to
    the previous event exceeds ``gap_seconds``; adds ``session_id``
    (0-based per partition).

    reference: global_scanner.py:177-219 (recovery episodes, 60s gap).
    Streaming form: ``session_window(ts, gap)`` — see streaming module.
    """
    w = _w(partition_by or [], ts_col, tiebreak)
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col)).over(w).cast("double")
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    )


def session_summary(
    sessions: DataFrame,
    partition_by: list[str] | None = None,
    ts_col: str = "ts",
    ordered: bool = True,
) -> DataFrame:
    """Per-session rollup: bounds, duration, event count."""
    keys = (partition_by or []) + ["session_id"]
    out = (
        sessions.groupBy(*keys)
        .agg(
            F.unix_micros(F.min(ts_col)).alias("start_ts_us"),
            F.unix_micros(F.max(ts_col)).alias("end_ts_us"),
            F.round(
                F.max(F.col(ts_col)).cast("double")
                - F.min(F.col(ts_col)).cast("double"),
                6,
            ).alias("duration_s"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return out.orderBy(*keys) if ordered else out


def burst_windows(
    df: DataFrame,
    k: int,
    window_seconds: float,
    partition_by: list[str] | None = None,
    ts_col: str = "ts",
    tiebreak: str | None = "event_id",
) -> DataFrame:
    """W6 — rows i where t[i] - t[i-k+1] <= window (k events within the
    window, sliding over the sorted stream) — the recovery-loop shape.

    reference: detectors.py:176-203
    """
    w = _w(partition_by or [], ts_col, tiebreak)
    t_prev = F.lag(F.col(ts_col), k - 1).over(w)
    span = F.col(ts_col).cast("double") - F.col("__t_prev").cast("double")
    return (
        df.withColumn("__t_prev", t_prev)
        .withColumn("window_span_s", F.round(span, 6))
        .filter(F.col("__t_prev").isNotNull() & (span <= window_seconds))
        .drop("__t_prev")
    )


def marker_chunks(
    df: DataFrame,
    marker_predicate,
    partition_by: list[str] | None = None,
    ts_col: str = "ts",
    tiebreak: str | None = "event_id",
) -> DataFrame:
    """W8 — split the ordered stream into chunks that END at each marker
    row (marker belongs to the chunk it closes); adds ``chunk_id``.

    reference: tools/chunker.py:18-44
    """
    w = _w(partition_by or [], ts_col, tiebreak).rowsBetween(
        Window.unboundedPreceding, -1
    )
    marker = F.when(marker_predicate, 1).otherwise(0)
    return df.withColumn(
        "chunk_id", F.coalesce(F.sum(marker).over(w), F.lit(0))
    )


def relative_timeline(
    df: DataFrame,
    ts_col: str = "ts",
    anchor_df: DataFrame | None = None,
) -> DataFrame:
    """W9 — rel_s = ts - min(ts): attach the global start via a broadcast
    1-row cross join (not a whole-frame window — no single-partition sort).

    reference: tools/investigation_tools/timeline_builder.py:42-49
    """
    base = anchor_df if anchor_df is not None else df
    t0 = base.agg(F.min(ts_col).alias("__t0"))
    return (
        df.crossJoin(F.broadcast(t0))
        .withColumn(
            "rel_s",
            F.round(
                F.col(ts_col).cast("double") - F.col("__t0").cast("double"), 6
            ),
        )
        .drop("__t0")
    )


def first_matching(
    df: DataFrame,
    predicate,
    partition_by: list[str] | None = None,
    ts_col: str = "ts",
    tiebreak: str | None = "event_id",
) -> DataFrame:
    """W9b — first event satisfying a predicate (per partition): the
    timeline builder's "first severe / first lag>100k / first Recovery".

    reference: timeline_builder.py:50-71
    """
    w = _w(partition_by or [], ts_col, tiebreak)
    return (
        df.filter(predicate)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def severity_first_ranking(
    df: DataFrame,
    severity_col: str = "severity",
    ts_col: str = "ts",
    high: int = 40,
    limit: int | None = None,
    tiebreak: str | None = "event_id",
    with_rank: bool = False,
) -> DataFrame:
    """W10 — display ordering: severity>=high first, then by time.

    ``with_rank`` additionally materializes the display position as a
    ``rank`` column (row_number over the same total order), which makes
    the ordering itself checkable by an order-insensitive oracle.

    reference: investigation_agent.py:612-631
    """
    key = F.when(F.col(severity_col) >= high, 0).otherwise(1)
    order = [key, F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    if not with_rank:
        out = df.orderBy(*order)
        return out.limit(limit) if limit else out
    if limit:
        # Bounded head: orderBy+limit is TakeOrderedAndProject (per-
        # partition top-k, no global sort); ranking the k survivors is a
        # k-row window, not a full-table one.
        head = df.orderBy(*order).limit(limit)
        return head.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order)).cast("long")
        )
    # Unbounded global rank WITHOUT a single-partition sort: range-shuffle
    # on the total order, rank within each range partition, then shift by
    # the (tiny, collected) per-partition row counts. Every stage is
    # parallel; the only driver-side data is one row count per partition.
    #
    # localCheckpoint(eager) pins ONE physical partitioning: the
    # RangePartitioner samples with a seed derived from the per-execution
    # RDD id, so without materialization the counts job and every later
    # execution of the returned DataFrame would each re-sample — different
    # boundaries, misaligned offsets, silently wrong ranks. Checkpointing
    # makes the counted partitioning the same one all consumers read.
    part = (
        df.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .localCheckpoint(eager=True)
    )
    with_pid = part.withColumn("__pid", F.spark_partition_id())
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in with_pid.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    if not counts:  # empty input: no map to build, rank column still typed
        return with_pid.withColumn("rank", F.lit(None).cast("long")).drop("__pid")
    offsets, acc = {}, 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    off_expr = F.element_at(
        F.create_map(*[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]),
        F.col("__pid"),
    )
    w = Window.partitionBy("__pid").orderBy(*order)
    return (
        with_pid.withColumn("rank", (F.row_number().over(w) + off_expr).cast("long"))
        .drop("__pid")
    )


def ewma(
    df: DataFrame,
    value_col: str,
    partition_by: list[str],
    alpha: float = 0.3,
    ts_col: str = "ts",
    tiebreak: str | None = "event_id",
    out_col: str = "ewma",
) -> DataFrame:
    """W11 — exponentially weighted moving average per key, the smoother
    the reference documents but never implemented (README.md:249,305 —
    only z-score exists in code; SURVEY §2.5 flags the gap).

    Recursive definition (pandas ``ewm(alpha, adjust=False)``):
    ``s_0 = x_0; s_t = (1-alpha)*s_{t-1} + alpha*x_t``.

    A recursive scan is not expressible with built-in window frames
    without O(n^2) work, so this is the documented Arrow-batched
    ``applyInPandas`` path: each key's series is one group, sorted
    in-group, smoothed sequentially. Scales by key-parallelism — at
    100 TB partition on (metric, machine) style keys so every group fits
    an executor; the sequential fold is inherently per-series.
    """
    import pandas as pd

    sort_cols = [ts_col] + ([tiebreak] if tiebreak else [])
    out_fields = df.schema.fields + [T.StructField(out_col, T.DoubleType())]
    schema = T.StructType(out_fields)

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        pdf[out_col] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    return df.groupBy(*partition_by).applyInPandas(smooth, schema)
