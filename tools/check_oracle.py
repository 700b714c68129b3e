#!/usr/bin/env python3
"""Dev-loop replica of the driver's correctness gate: run each oracle SQL
in DuckDB over the sf parquet tables, compare against the Spark parquet
dumps produced by graft.Verify (rows sorted, columns sorted by name).
Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"MISSING  {name} (no spark output)")
        fail += 1
        continue
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        print(f"ORA-ERR  {name}: {e}")
        fail += 1
        continue
    sdf = con.execute(
        f"SELECT * FROM '{spark_dir}/*.parquet'").df()
    # normalize: sort columns by name, sort rows, stringify
    def norm(df):
        df = df[sorted(df.columns)].astype(str)  # lists → str before sort
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df
    o, s = norm(odf), norm(sdf)
    if list(o.columns) != list(s.columns):
        print(f"SCHEMA   {name}: oracle={list(o.columns)} spark={list(s.columns)}")
        fail += 1
    elif len(o) != len(s):
        print(f"ROWS     {name}: oracle={len(o)} spark={len(s)}")
        fail += 1
    elif not o.equals(s):
        diff = (o != s).any(axis=1)
        idx = diff[diff].index[:3]
        print(f"VALUES   {name}: {int(diff.sum())}/{len(o)} rows differ; first:")
        for i in idx:
            print(f"  oracle: {o.loc[i].to_dict()}")
            print(f"  spark : {s.loc[i].to_dict()}")
        fail += 1
    else:
        print(f"OK       {name} ({len(o)} rows)")
print(f"{'FAIL' if fail else 'PASS'}: {len(oracle)-fail}/{len(oracle)} queries match")
sys.exit(1 if fail else 0)
