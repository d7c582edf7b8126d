"""Join operators (SURVEY §2.3, J1-J6).

The reference's joins are DuckDB SQL; the shapes that matter at scale:
broadcast the small side (baselines, dims), keep the as-of/range join
bounded by an equi key + time band so Spark plans a range join instead of
a cartesian product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame, right: DataFrame, on, how: str = "inner", broadcast_right: bool = False
) -> DataFrame:
    """J1 — plain equi join; hint broadcast for dimension-sized right sides.

    reference: tools/storage.py:349 (events JOIN event_metrics USING(event_id))
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, how)


def attach_global_stats(df: DataFrame, value_col: str) -> DataFrame:
    """J2 — attach whole-table mean/std via broadcast cross join with the
    1-row stats aggregate (reference: detectors.py:248-260 ``FROM b, s``)."""
    stats = df.agg(
        F.avg(value_col).alias("mean_value"),
        F.stddev_samp(value_col).alias("std_value"),
    )
    return df.crossJoin(F.broadcast(stats))


def lookback_join(
    events: DataFrame,
    anchors: DataFrame,
    lookback_seconds: float,
    equi_keys: list[str] | None = None,
    ts_col: str = "ts",
    anchor_ts_col: str = "anchor_ts",
) -> DataFrame:
    """J3 — as-of-style look-back join: for each anchor row, all events in
    ``[anchor_ts - lookback, anchor_ts)``.

    reference: tools/recovery_detector.py:155-207 (scan 5s before each
    MasterRecoveryState for the cause).

    ``equi_keys`` bounds the join (machine/user/trace_file): with them the
    plan is a shuffled equi join + band filter; without them Spark must
    use a broadcast-nested-loop/range join — fine when ``anchors`` is
    small (it is: anchors are rare events), disastrous if both sides are
    big. AQE's skew handling covers hot keys.
    """
    cond = (F.col(ts_col) >= F.col(anchor_ts_col) - F.expr(f"INTERVAL {lookback_seconds} SECONDS")) & (
        F.col(ts_col) < F.col(anchor_ts_col)
    )
    if equi_keys:
        for k in equi_keys:
            cond = cond & (events[k] == anchors[f"anchor_{k}"])
    return events.join(anchors, cond)


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """J5 — rows of left with no match in right (NOT IN / NOT EXISTS).

    reference: hotspot_selector.py:38-55 (uninspected buckets)
    """
    return left.join(right, on, "left_anti")


def lookup_with_fallback(
    df: DataFrame,
    lookup: DataFrame,
    keys: list[str],
    fallback_key: str,
    fallback_value: str = "ALL",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """J6 — left join on full key; where missing, fall back to the row with
    ``fallback_key = fallback_value`` (role='ALL' baselines), coalescing
    each looked-up column. Both lookups broadcast (baselines are small).

    reference: detectors.py:20-57
    """
    value_cols = value_cols or [
        c for c in lookup.columns if c not in keys
    ]
    exact = lookup.select(
        *[F.col(k).alias(f"__e_{k}") for k in keys],
        *[F.col(c).alias(f"__e_{c}") for c in value_cols],
    )
    fb_keys = [k for k in keys if k != fallback_key]
    fallback = (
        lookup.filter(F.col(fallback_key) == fallback_value)
        .select(
            *[F.col(k).alias(f"__f_{k}") for k in fb_keys],
            *[F.col(c).alias(f"__f_{c}") for c in value_cols],
        )
    )
    out = df.join(
        F.broadcast(exact),
        [df[k] == F.col(f"__e_{k}") for k in keys],
        "left",
    ).join(
        F.broadcast(fallback),
        [df[k] == F.col(f"__f_{k}") for k in fb_keys],
        "left",
    )
    for c in value_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"__e_{c}"), F.col(f"__f_{c}")))
    drop = (
        [f"__e_{k}" for k in keys]
        + [f"__f_{k}" for k in fb_keys]
        + [f"__e_{c}" for c in value_cols]
        + [f"__f_{c}" for c in value_cols]
    )
    return out.drop(*drop)
