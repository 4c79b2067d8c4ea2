#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate: for each query dir in
the Verify output, run the oracle SQL from oracle_sql.json in DuckDB against
the same parquet tables, and compare row sets (columns sorted by name, rows
sorted, values normalized to strings)."""
import json, sys, glob, os
import duckdb

verify_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{verify_dir}/oracle_sql.json"))
ok, bad = [], []
for qname, sql in sorted(oracle.items()):
    qdir = f"{verify_dir}/{qname}"
    if not os.path.isdir(qdir):
        bad.append((qname, "spark output missing"))
        continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        bad.append((qname, f"exec error: {e}"))
        continue
    s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
    if s_cols != d_cols:
        bad.append((qname, f"schema mismatch: spark={s_cols} duck={d_cols}"))
        continue
    def norm(df):
        df = df[s_cols].copy()
        for c in df.columns:
            df[c] = df[c].map(lambda v: repr(v))
        return sorted(map(tuple, df.itertuples(index=False)))
    a, b = norm(spark_df), norm(duck_df)
    if len(a) != len(b):
        bad.append((qname, f"row count: spark={len(a)} duck={len(b)}"))
    elif a != b:
        diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
        detail = "; ".join(f"row{i}: spark={a[i]} duck={b[i]}" for i in diff)
        bad.append((qname, f"value mismatch ({sum(x!=y for x,y in zip(a,b))} rows): {detail[:500]}"))
    else:
        ok.append((qname, len(a)))

for q, n in ok:
    print(f"OK    {q} ({n} rows)")
for q, msg in bad:
    print(f"FAIL  {q}: {msg}")
print(f"\n{len(ok)} ok, {len(bad)} fail")
sys.exit(1 if bad else 0)
