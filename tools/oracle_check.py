#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare rows/schema/hash.
Usage: oracle_check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)

fails = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d) or (only and name not in only):
        continue
    files = glob.glob(f"{d}/*.parquet")
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    if name not in oracle:
        print(f"{name:28s} no_oracle rows={len(spark_df)}")
        continue
    try:
        odf = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name:28s} ORACLE-ERR {e}")
        fails += 1
        continue
    a, b = norm(spark_df), norm(odf)
    rows_ok = len(a) == len(b)
    schema_ok = list(a.columns) == list(b.columns)
    try:
        a2 = a.astype(str).reset_index(drop=True)
        b2 = b.astype(str).reset_index(drop=True)
        hash_ok = rows_ok and schema_ok and a2.equals(b2)
    except Exception:
        hash_ok = False
    status = "OK " if (rows_ok and schema_ok and hash_ok) else "FAIL"
    if status == "FAIL":
        fails += 1
    print(f"{name:28s} {status} rows={len(a)}/{len(b)} schema={schema_ok} hash={hash_ok}")
    if status == "FAIL" and rows_ok and schema_ok:
        neq = (a2 != b2).any(axis=1)
        print("  spark:", a2[neq].head(3).to_dict("records"))
        print("  duck :", b2[neq].head(3).to_dict("records"))
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
