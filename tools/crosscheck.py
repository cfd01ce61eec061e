#!/usr/bin/env python3
"""Dev-only harness: replicate the driver's DuckDB-oracle compare locally.

Usage: crosscheck.py [sfdir] [verify_outdir] [only_query ...]
Run graft.Verify first:  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout"
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    import os
    for t in TABLES:
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written fixture: dir of part files
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    fails = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        pq = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not pq:
            print(f"{name}: NO SPARK OUTPUT"); fails += 1; continue
        got = pd.concat([pd.read_parquet(p) for p in pq], ignore_index=True)
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"{name}: ORACLE SQL FAIL: {e}"); fails += 1; continue
        got, exp = got[sorted(got.columns)], exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"{name}: COLS got={list(got.columns)} exp={list(exp.columns)}")
            fails += 1; continue
        if len(got) != len(exp):
            print(f"{name}: NROWS got={len(got)} exp={len(exp)}"); fails += 1; continue
        cols = list(got.columns)
        got = got.sort_values(cols, kind="mergesort").reset_index(drop=True)
        exp = exp.sort_values(cols, kind="mergesort").reset_index(drop=True)
        bad = False
        for c in cols:
            a, b = got[c], exp[c]
            try:
                neq = ~((a == b) | (a.isna() & b.isna()))
            except Exception:
                neq = a.astype(str) != b.astype(str)
            if neq.any():
                i = int(neq.idxmax())
                print(f"{name}: VALUE col={c} row={i} got={a[i]!r} exp={b[i]!r} "
                      f"({int(neq.sum())} mismatches; dtypes {a.dtype}/{b.dtype})")
                bad = True
                break
            if str(a.dtype) != str(b.dtype):
                print(f"{name}: note: dtype col={c} {a.dtype} vs {b.dtype} (values equal)")
        if bad:
            fails += 1
        else:
            print(f"{name}: OK rows={len(got)}")
    print(f"-- {len(oracle) if not only else len(only)} checked, {fails} failing")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
