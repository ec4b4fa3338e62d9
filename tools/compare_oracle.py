#!/usr/bin/env python3
"""Driver-style correctness compare: run each SparkEntry oracle SQL in
DuckDB over the SF tables and diff against the Verify parquet dumps.

Usage: SFDIR=/root/testdata/sf0.01 VOUT=/tmp/verify_out python3 tools/compare_oracle.py
"""
import duckdb, json, os, sys
sfdir = os.environ.get("SFDIR", "/root/testdata/sf0.01")
out = os.environ.get("VOUT", "/tmp/verify_out")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
# a query that CRASHED in graft.Verify writes no output dir — that is the
# worst failure mode and must not pass green
present = {d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d))}
for m in sorted(set(oracle) - present):
    fails.append(m)
    print(f"{m}: MISSING OUTPUT (query failed inside graft.Verify)")
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d): continue
    spark_df = con.execute(f"SELECT * FROM '{d}/*.parquet'").df()
    if name not in oracle:
        print(f"{name}: rows-only ({len(spark_df)})"); continue
    want = con.execute(oracle[name]).df()
    cols_s, cols_w = sorted(spark_df.columns), sorted(want.columns)
    ok_schema = cols_s == cols_w
    a = spark_df[cols_s].sort_values(cols_s).reset_index(drop=True) if ok_schema else None
    b = want[cols_w].sort_values(cols_w).reset_index(drop=True) if ok_schema else None
    ok = ok_schema and len(a)==len(b) and (len(a)==0 or a.astype(str).equals(b.astype(str)))
    status = "OK" if ok else "MISMATCH"
    if not ok: fails.append(name)
    print(f"{name}: {status} spark={len(spark_df)} oracle={len(want) if ok_schema else '?'} schema={'ok' if ok_schema else (cols_s, cols_w)}")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
