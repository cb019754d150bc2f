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

With --fresh, replica payloads are made DISTINCT instead of copied:
document tokens get a per-replica prefix (replica vocabularies are
disjoint, so near-dup/gram structure is N independent copies of the
source's — the "fresh corpus" scale shape) and embeddings get a small
deterministic per-replica direction perturbation (no duplicate
vectors). Use plain mode as the duplicate-clique torture test and
--fresh to measure engine scaling.

Usage: python3 tools/gen_sf.py /root/testdata/sf0.1 /tmp/sf1 10 [--fresh]
"""
import sys, os
import duckdb

src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
fresh = "--fresh" in sys.argv[4:]
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
        repls = [f"{c} + r * {s} AS {c}" for c, s in shifts.items()]
        if fresh and table == "documents":
            # per-replica token prefix: replica vocabularies (hence
            # shingles, grams, minhash buckets) are pairwise disjoint
            repls.append(
                "regexp_replace(text, '(\\S+)', 'q' || r || '\\1', 'g')"
                " AS text")
        if fresh and table == "embeddings":
            # deterministic per-replica direction nudge: x -> x·(1 +
            # 0.01·(r−(N−1)/2)·x) is component-dependent, so replicas
            # of a vector are distinct directions, not duplicates
            repls.append(
                f"list_transform(embedding, x -> CAST(x * (1.0 + 0.01 * "
                f"(r - {(n - 1) / 2}) * x) AS FLOAT)) AS embedding")
        repl = ", ".join(repls)
        con.execute(
            f"COPY (SELECT * REPLACE ({repl}) FROM '{p}' CROSS JOIN reps "
            f"ORDER BY r) TO '{out}' (FORMAT PARQUET)")
    rows = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"{table}: {rows} rows")
print(f"done -> {dst}")
