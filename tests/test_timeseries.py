"""gap_fill / scd2_intervals (operators/timeseries.py).

The oracle gate pins full-table values; these pin the edge semantics —
LOCF across multi-bucket holes, in-bucket tiebreaks, NULL-state runs,
open current intervals — on inputs small enough to reason about by hand.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from db_loganalyzer_spark.operators.timeseries import gap_fill, scd2_intervals


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def stream(spark):
    # key 1: values at minute 0 and minute 30 -> buckets 0 and 1800 with
    # a 600s grid leave holes at 600 and 1200; two events share bucket 0
    # (the later (ts, event_id) must win); a NULL value is ignored.
    rows = [
        (1, _ts(0, 10), 101, 10.0),
        (1, _ts(0, 20), 102, 20.0),
        (1, _ts(0, 20), 99, 15.0),  # same ts, smaller event_id: loses
        (1, _ts(5), 103, None),  # null: not an observation
        (1, _ts(30), 104, 40.0),
        (2, _ts(2), 201, 7.0),  # single-bucket key: no gaps
    ]
    return spark.createDataFrame(
        rows, "user_id: long, ts: timestamp, event_id: long, value: double"
    )


def test_gap_fill_locf_and_tiebreak(stream):
    out = gap_fill(stream, 600, ["user_id"]).orderBy("user_id", "bucket")
    got = [
        (r["user_id"], r["bucket"], r["value"], r["is_gap"])
        for r in out.collect()
    ]
    base = int(dt.datetime(2024, 1, 1).timestamp())
    assert got == [
        (1, base + 0, 20.0, False),  # max (ts,event_id) in bucket wins
        (1, base + 600, 20.0, True),  # hole: carried forward
        (1, base + 1200, 20.0, True),
        (1, base + 1800, 40.0, False),
        (2, base + 0, 7.0, False),
    ]


def test_gap_fill_requires_keys(stream):
    with pytest.raises(ValueError):
        gap_fill(stream, 600, [])


def test_scd2_runs_and_open_interval(spark):
    rows = [
        (1, _ts(0), 1, "a"),
        (1, _ts(1), 2, "a"),  # same run
        (1, _ts(2), 3, "b"),  # change
        (1, _ts(3), 4, None),  # NULL state starts a run
        (1, _ts(4), 5, None),  # ...and continues it
        (1, _ts(5), 6, "a"),  # back to a: new run, not merged
    ]
    df = spark.createDataFrame(
        rows, "user_id: long, ts: timestamp, event_id: long, state: string"
    )
    out = scd2_intervals(df, "state", ["user_id"]).orderBy("valid_from")
    got = [
        (r["state"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    ]
    assert got == [
        ("a", _ts(0), _ts(2), False),
        ("b", _ts(2), _ts(3), False),
        (None, _ts(3), _ts(5), False),
        ("a", _ts(5), None, True),
    ]


def test_scd2_single_sort(spark, stream):
    # both windows share one (key, ts, event_id) sort: the physical plan
    # must contain exactly one Sort over the event input.
    out = scd2_intervals(stream, "value", ["user_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Sort ") <= 2  # one per window stage, no extra
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_gap_fill_property_vs_python_oracle(spark):
    """Randomized LOCF semantics vs a brute-force reference: arbitrary
    observation patterns, nulls, duplicate timestamps."""
    import datetime as dtm

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    t0 = dtm.datetime(2024, 1, 1)
    row = st.tuples(
        st.integers(min_value=0, max_value=2),    # key
        st.integers(min_value=0, max_value=50),   # ts offset (seconds)
        st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
    )

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(rows=st.lists(row, min_size=1, max_size=15))
    def check(rows):
        df = spark.createDataFrame(
            [
                (k, t0 + dtm.timedelta(seconds=s), i,
                 float(v) if v is not None else None)
                for i, (k, s, v) in enumerate(rows)
            ],
            "user_id long, ts timestamp, event_id long, value double",
        )
        got = {
            (r["user_id"], r["bucket"]): (r["value"], r["is_gap"])
            for r in gap_fill(df, 10, ["user_id"]).collect()
        }
        base = int(t0.timestamp())
        # brute force per key
        per_key = {}
        for i, (k, s, v) in enumerate(rows):
            if v is None:
                continue
            b = base + (s // 10) * 10
            per_key.setdefault(k, {}).setdefault(b, []).append((s, i, float(v)))
        want = {}
        for k, buckets in per_key.items():
            lo, hi = min(buckets), max(buckets)
            last = None
            for b in range(lo, hi + 10, 10):
                if b in buckets:
                    last = max(buckets[b])[2]  # max (ts, event_id) wins
                    want[(k, b)] = (last, False)
                else:
                    want[(k, b)] = (last, True)
        assert got == want, (got, want)

    check()


def test_level_shifts_detects_step(spark):
    """A clean step change scores exactly its height; flat segments away
    from the edge score ~0; edge rows fail the min-points gate."""
    import datetime as dtm

    from db_loganalyzer_spark.operators.timeseries import level_shifts

    t0 = dtm.datetime(2024, 1, 1)
    rows = [
        ("m", t0 + dtm.timedelta(seconds=i * 10), i,
         10.0 if i < 10 else 50.0)
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    # 60s windows = 6 samples each side at 10s spacing
    out = {
        r["event_id"]: r
        for r in level_shifts(
            df, "value", 60, ["event_type"], min_points=3
        ).collect()
    }
    # at the step boundary (event 10 opens the next frame with 50s while
    # the prev frame still holds 10s): shift == exactly the step height
    assert out[10]["shift"] == 40.0
    # far enough from the step that neither frame touches it: shift == 0
    assert out[3]["shift"] == 0.0
    assert out[16]["shift"] == 0.0
    # the score ramps as the leading frame absorbs the step
    assert 0.0 < out[6]["shift"] < 40.0
    # first rows have no prev frame -> dropped by the gate
    assert 0 not in out and 1 not in out


def test_counter_rates_semantics(spark):
    import datetime as dtm

    from db_loganalyzer_spark.operators.timeseries import counter_rates

    def t(s):
        return dtm.datetime(2024, 1, 1, 0, 0, s)

    rows = [
        (1, t(0), 1, 100.0),
        (1, t(10), 2, 150.0),   # +50 over 10s -> 5/s
        (1, t(20), 3, 30.0),    # reset: increase = 30 over 10s -> 3/s
        (1, t(20), 4, 40.0),    # same ts as previous: dt=0 -> NULL rate
        (2, t(0), 5, 7.0),      # lone sample -> NULL rate, not a reset
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = {
        r["event_id"]: (r["rate_per_s"], r["is_reset"])
        for r in counter_rates(df, "value", ["user_id"]).collect()
    }
    assert out[1] == (None, False)
    assert out[2] == (5.0, False)
    assert out[3] == (3.0, True)
    assert out[4] == (None, False)  # 40 >= 30: not a reset, but dt = 0
    assert out[5] == (None, False)
