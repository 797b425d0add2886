#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each Spark result
parquet from Verify's outDir, run the matching oracle SQL in DuckDB over the
same sfDir tables, and compare (columns sorted by name, exact values).

Usage: python3 tools/verify_local.py <sfDir> <outDir>
"""
import sys, json, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

def cmp_frames(name, sdf, ddf):
    if sorted(sdf.columns) != sorted(ddf.columns):
        return f"SCHEMA cols spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"
    if len(sdf) != len(ddf):
        return f"ROWS spark={len(sdf)} duck={len(ddf)}"
    sdf, ddf = canon(sdf), canon(ddf)
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                ok = ((a.isna() & b.isna()) | (a == b)).all()
            else:
                av = a.astype(object).where(pd.notna(a), None)
                bv = b.astype(object).where(pd.notna(b), None)
                ok = all((x == y) or (x is None and y is None) for x, y in zip(av, bv))
        except Exception as e:
            return f"COMPARE-ERR col {c}: {e}"
        if not ok:
            bad = [(i, a.iloc[i], b.iloc[i]) for i in range(len(a))
                   if not ((pd.isna(a.iloc[i]) and pd.isna(b.iloc[i])) or a.iloc[i] == b.iloc[i])][:3]
            return f"VALUES col {c} ({a.dtype} vs {b.dtype}): first diffs {bad}"
    # dtype report (informational — driver may hash types)
    mism = [(c, str(sdf[c].dtype), str(ddf[c].dtype)) for c in sdf.columns
            if str(sdf[c].dtype) != str(ddf[c].dtype)]
    return ("OK" if not mism else f"OK (dtype note: {mism})")

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_path = f"{outdir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"{name}: MISSING spark output"); continue
        try:
            sdf = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'").df()
        except Exception as e:
            print(f"{name}: SPARK-READ-ERR {e}"); continue
        try:
            ddf = con.sql(sql).df()
        except Exception as e:
            print(f"{name}: ORACLE-ERR {str(e)[:300]}"); continue
        r = cmp_frames(name, sdf, ddf)
        if r.startswith("OK"): n_ok += 1
        print(f"{name}: {r}")
    print(f"\n{n_ok}/{len(oracle)} oracle-matched")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
