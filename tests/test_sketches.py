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
    ids = list(range(0, 2000, 7)) + [2**31 - 1, 2**40 + 123, 0]
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
