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
    flags = set(sys.argv[4:])
    vary = "--vary" in flags
    # --stretch-time: offset each replica's events by the source time
    # span, so event DENSITY stays constant and the time RANGE grows —
    # the "longer retention" scale model. Without it, replication
    # densifies a fixed span ("more machines"), which makes any
    # time-co-residency work (look-back scans, interval overlap)
    # genuinely quadratic — keep that mode for density stress.
    stretch = "--stretch-time" in flags
    # --grow-vocab: suffix every word of replica i>0 with "_i", giving
    # each replica its own vocabulary namespace — the "new content,
    # same shape" corpus model (real vocabulary grows with corpus
    # size; the source synthetic vocab is ~31 words, so without this
    # EVERY shingle is corpus-wide boilerplate and all pairwise dedup
    # work is quadratic BY CONSTRUCTION). Takes precedence over
    # --vary's permutation for documents.
    grow = "--grow-vocab" in flags
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    span_us = 0
    if stretch:
        lo, hi = con.execute(
            f"SELECT epoch_us(MIN(ts)), epoch_us(MAX(ts)) "
            f"FROM read_parquet('{src}/events.parquet')"
        ).fetchone()
        span_us = (hi - lo) + 3_600_000_000  # +1h guard gap

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
        # --vary: de-clone the content columns. Verbatim replication
        # makes EVERY document an N-clone, so shingle/LSH dedup work
        # grows quadratically in N — useful as a deliberate clone-stress
        # mode (the BASELINE.md sf1 clone tables), but wrong for a
        # breadth sweep: real corpora are exact-deduped before these
        # operators run. Varied mode deterministically permutes each
        # replica's words (token multiset preserved — text stats stay
        # comparable; shingle sets diverge) and circularly shifts each
        # replica's embedding (norm/distribution preserved; cosine
        # neighborhoods diverge).
        if stretch and tab == "events":
            repl += (
                f", ts + to_microseconds(r.i * {span_us}) AS ts"
            )
        if grow and tab == "documents":
            words = "list_filter(string_split(text, ' '), x -> x <> '')"
            repl += (
                ", CASE WHEN r.i = 0 THEN text ELSE "
                f"array_to_string(list_transform({words}, "
                "w -> w || '_' || CAST(r.i AS VARCHAR)), ' ') END AS text"
            )
        elif vary and tab == "documents":
            # Position goes into the shuffle key so repeated words don't
            # clump; replica 0 keeps the original corpus verbatim so the
            # organic near-dup structure survives as a subset.
            words = "list_filter(string_split(text, ' '), x -> x <> '')"
            repl += (
                ", CASE WHEN r.i = 0 THEN text ELSE "
                "array_to_string(list_transform(list_sort("
                f"list_transform(generate_series(1, len({words})), j -> "
                f"struct_pack(h := hash(({words})[j] || '|' || CAST(j AS VARCHAR)"
                " || '|' || CAST(r.i AS VARCHAR)"
                " || '|' || CAST(doc_id AS VARCHAR)), "
                f"w := ({words})[j]))), s -> s.w), ' ') END AS text"
            )
        if vary and tab == "embeddings":
            repl += (
                ", CASE WHEN r.i = 0 THEN embedding ELSE list_concat("
                "embedding[(r.i % len(embedding)) + 1:],"
                " embedding[1:(r.i % len(embedding))]) END AS embedding"
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
