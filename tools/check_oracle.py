#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (builder self-check).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Reads each <verifyOutDir>/<name>/ parquet (Spark output) and runs the
matching SQL from oracle_sql.json in DuckDB with views named after the
test tables. Compares row count, sorted values (columns sorted by name,
rows sorted), with a small float tolerance report.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output dir"); fails.append(name); continue
    try:
        sdf = pd.concat([pd.read_parquet(f) for f in
                         sorted(glob.glob(f"{spark_dir}/*.parquet"))],
                        ignore_index=True)
    except Exception as e:
        print(f"FAIL {name}: spark read: {e}"); fails.append(name); continue
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: duckdb: {e}"); fails.append(name); continue
    # normalize: sort columns by name, then sort rows
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    odf = odf.reindex(sorted(odf.columns), axis=1)
    if list(sdf.columns) != list(odf.columns):
        print(f"FAIL {name}: columns spark={list(sdf.columns)} oracle={list(odf.columns)}")
        fails.append(name); continue
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
        fails.append(name); continue
    sdf = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
    odf = odf.sort_values(list(odf.columns)).reset_index(drop=True)
    ok = True
    for c in sdf.columns:
        a, b = sdf[c], odf[c]
        af = np.issubdtype(a.dtype, np.floating)
        bf = np.issubdtype(b.dtype, np.floating)
        # The driver stringifies then hashes, so an int64-vs-float64
        # mismatch ("1435" vs "1435.0") is a driver FAIL even when the
        # values are numerically identical. Replicate that: only
        # tolerance-compare when BOTH sides are float.
        if af != bf:
            print(f"FAIL {name}: col {c} dtype mismatch spark={a.dtype} "
                  f"oracle={b.dtype} (driver stringified hash would differ; "
                  f"cast the oracle SQL, e.g. CAST(sum(x) AS BIGINT))")
            ok = False
            continue
        if af and bf:
            aa = a.astype(float).to_numpy(); bb = b.astype(float).to_numpy()
            both_nan = np.isnan(aa) & np.isnan(bb)
            exact = (aa == bb) | both_nan
            if not exact.all():
                mx = np.nanmax(np.abs(aa - bb))
                print(f"FAIL {name}: col {c} float mismatch max|d|={mx:.3e} "
                      f"n={int((~exact).sum())}")
                ok = False
            # -0.0 == 0.0 numerically, but the driver hashes STRINGS
            # ("-0.0" vs "0.0" differ). DuckDB round() keeps the sign
            # of a tiny negative; Spark's BigDecimal round does not —
            # this slipped nq_mfcc_delta past the r11 local gate.
            zs = np.signbit(aa) & (aa == 0.0)
            zo = np.signbit(bb) & (bb == 0.0)
            if (zs != zo).any():
                print(f"FAIL {name}: col {c} -0.0/+0.0 sign mismatch "
                      f"n={int((zs != zo).sum())} (driver stringified hash "
                      f"differs; normalize with '+ 0.0' in the oracle SQL)")
                ok = False
        else:
            if not (a.astype(str).to_numpy() == b.astype(str).to_numpy()).all():
                n = int((a.astype(str).to_numpy() != b.astype(str).to_numpy()).sum())
                idx = np.where(a.astype(str).to_numpy() != b.astype(str).to_numpy())[0][:3]
                print(f"FAIL {name}: col {c} ({a.dtype} vs {b.dtype}) {n} mismatches, "
                      f"e.g. {[(a.iloc[i], b.iloc[i]) for i in idx]}")
                ok = False
    if ok:
        print(f"PASS {name} ({len(sdf)} rows)")
    else:
        fails.append(name)
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} PASS")
sys.exit(1 if fails else 0)
