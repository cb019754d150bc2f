#!/usr/bin/env python3
"""Materialize a larger scale factor by replicating an existing testdata
dir N times with consistent key shifts (builder-side tooling for the
one-off sf1 scale probe — never a dependency of the Scala engine).

Each replica r shifts every foreign/primary key family by the same
stride, so joins resolve within a replica exactly as in the source:
replica 0 IS the source data bit-for-bit. Payload columns (text,
embeddings, timestamps, prices) are left unchanged, which means
dedup/near-dup/ANN queries legitimately see each document/vector N
times — a documented caveat for reading their probe numbers (they do
N-clique work real distinct data wouldn't), while the relational/
aggregate/window families scale cleanly.

Usage: python3 tools/gen_sf.py /root/testdata/sf0.1 /tmp/sf1 10
"""
import sys, os
import duckdb

src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW reps AS SELECT unnest(range({n})) AS r")

SHIFT = {
    "lineitem": {"l_orderkey": 1_000_000, "l_partkey": 100_000,
                 "l_suppkey": 10_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "customer": {"c_custkey": 100_000},
    "part": {"p_partkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    "events": {"event_id": 1_000_000, "user_id": 10_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
    "nation": {},   # shared dims: copied once, not replicated
    "region": {},
}

for table, shifts in SHIFT.items():
    p = f"{src}/{table}.parquet"
    out = f"{dst}/{table}.parquet"
    if not shifts:
        con.execute(f"COPY (SELECT * FROM '{p}') TO '{out}' (FORMAT PARQUET)")
    else:
        repl = ", ".join(f"{c} + r * {s} AS {c}" for c, s in shifts.items())
        con.execute(
            f"COPY (SELECT * REPLACE ({repl}) FROM '{p}' CROSS JOIN reps "
            f"ORDER BY r) TO '{out}' (FORMAT PARQUET)")
    rows = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"{table}: {rows} rows")
print(f"done -> {dst}")
