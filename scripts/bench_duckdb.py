"""Measure the DuckDB baseline for BASELINE.md: run oracle_sql() for the
headline queries at $SPARK_GRAFT_SF_DIR on a warm connection, min-of-3,
and print one JSON line {query: sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from bench import HEADLINE, SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = entry_mod.oracle_sql()
    times: dict[str, float] = {}
    for name in HEADLINE:
        sql = oracles[name]
        con.execute(sql).fetchall()  # warm
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = round(time.time() - t0, 3)
            times[name] = min(times.get(name, dt), dt)
    times["total"] = round(sum(times.values()), 3)
    print(json.dumps(times))


if __name__ == "__main__":
    main()
