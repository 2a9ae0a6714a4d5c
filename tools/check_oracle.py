#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each parquet table in <sfDir> as a DuckDB view, runs every
oracle_sql.json query, and compares row count + sorted value hash against
the Spark result parquet written by graft.Verify.
"""
import sys, json, glob, os, hashlib
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(f)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df):
    # sort columns by name, then rows; hash values
    df = df[sorted(df.columns)]
    rows = sorted(tuple(map(repr, r)) for r in df.itertuples(index=False))
    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    return len(rows), h, rows

fails = 0
for name in sorted(oracle):
    spark_glob = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not spark_glob:
        print(f"{name}: MISSING spark result")
        fails += 1
        continue
    sdf = con.sql(f"SELECT * FROM read_parquet({spark_glob!r})").df()
    try:
        odf = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    sn, sh, srows = canon(sdf)
    on, oh, orows = canon(odf)
    ok = (sn, sh) == (on, oh)
    schema_ok = sorted(sdf.columns) == sorted(odf.columns)
    print(f"{name}: rows {sn} vs {on}, hash "
          f"{'MATCH' if ok else 'MISMATCH'}, schema "
          f"{'ok' if schema_ok else f'MISMATCH {sorted(sdf.columns)} vs {sorted(odf.columns)}'}")
    if not ok:
        fails += 1
        diff_s = [r for r in srows if r not in set(orows)][:3]
        diff_o = [r for r in orows if r not in set(srows)][:3]
        print(f"  spark-only: {diff_s}")
        print(f"  oracle-only: {diff_o}")
print("FAIL" if fails else "ALL MATCH")
sys.exit(1 if fails else 0)
