"""HyperLogLog sketch operator (operators/sketches.py).

Three properties matter: the mixer actually avalanches (the whole reason
it replaced the Knuth multiplicative hash), the estimate lands within
HLL's published error bound on adversarially-sequential ids, and the
Spark mixer is bit-identical to its generated DuckDB restatement.
"""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from db_loganalyzer_spark.operators.sketches import (
    hll_estimate,
    hll_registers,
    mix32,
    mix32_sql,
    mix32_sql_select,
)


def _mix32_py(x: int, salt: int = 0) -> int:
    h = (x + salt) % (1 << 32)
    h ^= h >> 16
    h = (h * 0x21F0AAAD) % (1 << 32)
    h ^= h >> 15
    h = (h * 0x735A2D97) % (1 << 32)
    h ^= h >> 15
    return h


def test_mix32_matches_python_and_duckdb(spark):
    # Negative ids included deliberately: Spark/DuckDB % keeps the
    # dividend's sign, Python's never does — mix32 must use pmod (and
    # the SQL forms (x % M + M) % M) to stay well-defined on any
    # integer input, not just the repo's non-negative ids.
    ids = list(range(0, 2000, 7)) + [
        2**31 - 1, 2**40 + 123, 0, -1, -17, -(2**33) - 5,
    ]
    df = spark.createDataFrame([(i,) for i in ids], "id: long")
    got = {
        r["id"]: r["h"]
        for r in df.select("id", mix32("id").alias("h")).collect()
    }
    want = {i: _mix32_py(i) for i in ids}
    assert got == want

    con = duckdb.connect()
    sql_got = dict(
        con.execute(
            f"SELECT id, {mix32_sql('id')} AS h FROM (SELECT unnest(?) AS id)",
            [ids],
        ).fetchall()
    )
    assert sql_got == want


def test_mix32_breaks_sequential_structure():
    # (id * odd) % 2^32 % 4096 is a bijection on 0..4095 — the failure
    # mode this mixer exists to kill. Sequential ids must now collide
    # at ~Poisson rates: for n=m=4096, E[distinct buckets] ~ m(1-1/e).
    n = m = 4096
    buckets = {_mix32_py(i) % m for i in range(n)}
    expected = m * (1 - math.exp(-1))
    assert abs(len(buckets) - expected) < 0.05 * m


@pytest.mark.parametrize("n", [100, 1500, 20000])
def test_hll_estimate_within_error_bound(spark, n):
    # sequential ids = the adversarial input for multiplicative hashing;
    # standard error for m=4096 is 1.04/sqrt(m) ~ 1.6%; allow 5 sigma.
    df = spark.range(n).select(F.col("id").alias("k"))
    row = hll_estimate(df, "k", p=12).collect()[0]
    rel = abs(row["estimate"] - n) / n
    assert rel < 5 * 1.04 / math.sqrt(4096), (n, row["estimate"])


def test_hll_registers_shape_and_null_keys(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (None,), (2,)], "k: long"
    )
    regs = hll_registers(df, "k", p=4)
    rows = regs.collect()
    # nulls excluded; duplicate keys land on one register
    assert len(rows) <= 2
    assert all(1 <= r["rho"] <= 29 for r in rows)
    # partial aggregation: the plan must show a two-phase hash aggregate
    # (map-side partial max before the exchange), the property that keeps
    # shuffle volume at O(m) per partition at 100 TB.
    plan = regs._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_histogram_quantiles_accuracy(spark):
    # uniform 0..9999: every quantile is known; 256 bins over a uniform
    # distribution put the estimate within one bin width of truth.
    from pyspark.sql import functions as F

    from db_loganalyzer_spark.operators.sketches import histogram_quantiles

    df = spark.range(10000).select(
        F.lit("a").alias("g"), F.col("id").cast("double").alias("v")
    )
    out = {
        r["q"]: r["est"]
        for r in histogram_quantiles(df, "v", ["g"], (0.5, 0.99)).collect()
    }
    width = 9999.0 / 256
    assert abs(out[0.5] - 5000) <= width
    assert abs(out[0.99] - 9900) <= width


def test_histogram_quantiles_rejects_out_of_range_q(spark):
    # q=0 used to make target = ceil(0*n) = 0 and the pick filter
    # unsatisfiable — the quantile silently vanished from the output
    # instead of erroring. The guard must reject q outside (0, 1].
    from pyspark.sql import functions as F

    from db_loganalyzer_spark.operators.sketches import histogram_quantiles

    df = spark.range(10).select(
        F.lit("a").alias("g"), F.col("id").cast("double").alias("v")
    )
    for bad in ((0.0, 0.5), (-0.1,), (1.5,)):
        with pytest.raises(ValueError, match="quantile"):
            histogram_quantiles(df, "v", ["g"], bad)
    with pytest.raises(ValueError, match="at least one"):
        histogram_quantiles(df, "v", ["g"], ())


def test_histogram_quantiles_vs_exact_percentile(spark, sf_dir):
    from pyspark.sql import functions as F

    from db_loganalyzer_spark.operators.sketches import histogram_quantiles
    from db_loganalyzer_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    est = {
        (r["event_type"], r["q"]): r["est"]
        for r in histogram_quantiles(
            ev, "value", ["event_type"], (0.5, 0.95)
        ).collect()
    }
    # the estimator's contract is the CEIL-RANK order statistic (the
    # target-th smallest value): the estimate must land in that value's
    # bin, i.e. within one bin width. (A continuous-interpolated
    # percentile can sit several bins away across a sparse tail, so it
    # is the wrong reference.)
    from pyspark.sql import Window

    w_rank = Window.partitionBy("event_type").orderBy("value")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    for q in (0.5, 0.95):
        kth = {
            r["event_type"]: r["value"]
            for r in ranked.filter(
                F.col("rn") == F.ceil(F.lit(q) * F.col("n"))
            ).collect()
        }
        widths = {
            r["event_type"]: r["w"]
            for r in ev.groupBy("event_type")
            .agg(((F.max("value") - F.min("value")) / 256).alias("w"))
            .collect()
        }
        for et, v in kth.items():
            assert abs(est[(et, q)] - v) <= widths[et], (et, q)


def test_histogram_quantiles_constant_group(spark):
    from pyspark.sql import functions as F

    from db_loganalyzer_spark.operators.sketches import histogram_quantiles

    df = spark.range(5).select(
        F.lit("c").alias("g"), F.lit(42.0).alias("v")
    )
    rows = histogram_quantiles(df, "v", ["g"], (0.5,)).collect()
    assert len(rows) == 1 and rows[0]["est"] == 42.0


def test_mix32_sql_select_matches_inline_form():
    ids = list(range(0, 500, 3)) + [2**40 + 7]
    con = duckdb.connect()
    staged = dict(
        con.execute(
            "SELECT id, h FROM "
            + mix32_sql_select(
                "id", "(SELECT unnest(?) AS id)", passthrough=["id"]
            )
            + " x",
            [ids],
        ).fetchall()
    )
    assert staged == {i: _mix32_py(i) for i in ids}


def test_hll_estimate_grouped_within_bound(spark):
    # two groups with known distinct counts; m=4096 -> se ~1.6%, allow 5x
    from pyspark.sql import functions as F

    from db_loganalyzer_spark.operators.sketches import hll_estimate_grouped

    df = spark.range(30000).select(
        F.when(F.col("id") % 3 == 0, "a").otherwise("b").alias("g"),
        (F.col("id") % 7000).alias("k"),  # group a sees ~3334, b sees 7000
    )
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("k").alias("n")).collect()
    }
    est = {
        r["g"]: r["estimate"]
        for r in hll_estimate_grouped(df, "k", ["g"], p=12).collect()
    }
    for g, n in exact.items():
        assert abs(est[g] - n) / n < 0.08, (g, est[g], n)


def test_countmin_never_underestimates_and_is_bounded(spark):
    from pyspark.sql import functions as F

    from db_loganalyzer_spark.operators.sketches import (
        countmin_estimates,
        countmin_sketch,
    )

    # zipf-ish: key k appears k times, keys 1..60 -> 1830 rows
    df = spark.range(1, 61).select(
        F.explode(F.sequence(F.lit(1), F.col("id"))).alias("_"),
        F.col("id").alias("kh"),
    ).select("kh")
    sketch = countmin_sketch(df, "kh", depth=4, width=1024)
    assert sketch.count() <= 4 * 1024
    # every counter sums the rows that hashed there: total mass per row d
    per_d = {r["d"]: r["s"] for r in sketch.groupBy("d").agg(
        F.sum("cnt").alias("s")).collect()}
    assert set(per_d.values()) == {1830}

    keys = df.groupBy("kh").agg(F.count(F.lit(1)).alias("true_n"))
    est = {
        r["kh"]: (r["est"], r["true_n"])
        for r in countmin_estimates(df, keys, "kh", depth=4, width=1024)
        .join(keys, "kh")
        .collect()
    }
    assert len(est) == 60
    for k, (e, t) in est.items():
        assert e >= t, (k, e, t)  # count-min never underestimates
        assert e - t <= 1830 * 0.02  # way inside the e/width mass bound


def test_hll_cumulative_monotone_and_matches_prefix_estimates(spark):
    import datetime as dt

    from db_loganalyzer_spark.operators.sketches import (
        hll_cumulative,
        hll_estimate,
    )

    # three daily waves of users with heavy overlap: day 0 users 0..999,
    # day 1 users 500..1999, day 2 users 0..2999 (nothing new on day 2
    # beyond wave 1's tail — curve must flatten, never dip)
    t0 = dt.datetime(2024, 3, 1)
    waves = [range(0, 1000), range(500, 2000), range(0, 3000)]
    rows = [
        (t0 + dt.timedelta(days=d), int(u))
        for d, wave in enumerate(waves)
        for u in wave
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    out = {
        r["bkt"]: r["estimate"]
        for r in hll_cumulative(df, "user_id", bucket_seconds=86400).collect()
    }
    assert len(out) == 3
    bkts = sorted(out)
    # monotone non-decreasing (registers only ever grow)
    assert out[bkts[0]] <= out[bkts[1]] <= out[bkts[2]]
    # each cumulative point IS the plain estimate of the prefix
    for i, b in enumerate(bkts):
        seen = set()
        for w in waves[: i + 1]:
            seen.update(w)
        prefix = spark.createDataFrame(
            [(int(u),) for u in seen], "user_id long"
        )
        want = hll_estimate(prefix, "user_id", p=12).collect()[0]["estimate"]
        assert out[b] == want, (b, out[b], want)


def test_hll_overlap_absent_label_yields_zero_not_empty(spark):
    from db_loganalyzer_spark.operators.sketches import hll_overlap

    df = spark.createDataFrame(
        [(i, "a") for i in range(100)], "user_id long, lab string"
    )
    r = hll_overlap(df, "user_id", "lab", "a", "b", p=10).collect()
    assert len(r) == 1  # never zero rows
    assert r[0]["est_b"] == 0.0 and r[0]["est_intersection"] == 0.0
    assert r[0]["est_a"] > 50
