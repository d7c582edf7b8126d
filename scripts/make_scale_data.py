"""Generate scaled-up bench data by replicating a driver-generated SF dir.

Usage: python scripts/make_scale_data.py SRC_DIR DST_DIR REPLICAS

Each replica i shifts every key column by i * OFF(domain), where OFF is
the next power of 10 above the domain's max key — so replicas never
collide and every FK edge (o_custkey->c_custkey, l_orderkey->o_orderkey,
l_partkey->p_partkey, l_suppkey->s_suppkey) stays consistent within its
replica. Timestamps are left unchanged: scaling densifies the fixed time
range (more rows per bucket), which is how log volume actually grows and
keeps rollup output cardinality comparable across SFs. region/nation are
fixed-cardinality dims (as in TPC-H) and are copied as-is.

This mirrors TPC-H's own scaling shape (customer/supplier/part/orders/
lineitem all grow linearly with SF; nation/region constant). Output is
for PERFORMANCE measurement (BASELINE.md scale-inversion table), not for
the correctness gate — the driver's sf0.01 data stays the oracle input.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

# column -> key domain; every column in one domain gets the same offset
DOMAINS = {
    "c_custkey": "custkey",
    "o_custkey": "custkey",
    "o_orderkey": "orderkey",
    "l_orderkey": "orderkey",
    "p_partkey": "partkey",
    "l_partkey": "partkey",
    "s_suppkey": "suppkey",
    "l_suppkey": "suppkey",
    "event_id": "event_id",
    "user_id": "user_id",
    "doc_id": "doc_id",
    "vec_id": "vec_id",
}

# table -> (key columns to offset); region/nation copied verbatim
SCALED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPIED = ["region", "nation"]

# domain max is read from the table that OWNS the key, so FK columns
# (which may not cover the full domain) can't produce a too-small offset
DOMAIN_OWNER = {
    "custkey": ("customer", "c_custkey"),
    "orderkey": ("orders", "o_orderkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def main() -> None:
    src, dst, replicas = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    offs: dict[str, int] = {}
    for dom, (tab, col) in DOMAIN_OWNER.items():
        mx = con.execute(
            f"SELECT MAX({col}) FROM read_parquet('{src}/{tab}.parquet')"
        ).fetchone()[0]
        offs[dom] = 10 ** math.ceil(math.log10(int(mx) + 1))

    for tab in COPIED:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{tab}.parquet')) "
            f"TO '{dst}/{tab}.parquet' (FORMAT PARQUET)"
        )
        print(f"{tab}: copied")

    for tab, keys in SCALED.items():
        repl = ", ".join(
            f"{k} + r.i * {offs[DOMAINS[k]]} AS {k}" for k in keys
        )
        con.execute(
            f"COPY (SELECT * REPLACE ({repl}) "
            f"FROM read_parquet('{src}/{tab}.parquet') "
            f"CROSS JOIN (SELECT range AS i FROM range({replicas})) r "
            f"ORDER BY r.i) "
            f"TO '{dst}/{tab}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}/{tab}.parquet')"
        ).fetchone()[0]
        print(f"{tab}: {n} rows ({replicas}x)")


if __name__ == "__main__":
    main()
