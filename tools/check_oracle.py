#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each dumped
query result against its DuckDB oracle on the same parquet tables and
compare rows / schema / value hash (column-name-sorted, like the
driver). Usage: check_oracle.py <sfDir> <verifyOutDir> [query ...]"""
import sys, json, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
with open(os.path.join(out, "oracle_sql.json")) as f:
    oracle = json.load(f)
if not names:
    names = sorted(oracle.keys())

con = duckdb.connect()
for t in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}/**/*.parquet')"
                if os.path.isdir(t) else
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

fails = 0
for q in names:
    spark_dir = os.path.join(out, q)
    if not os.path.isdir(spark_dir):
        print(f"{q}: MISSING spark output"); fails += 1; continue
    if q not in oracle:
        print(f"{q}: no oracle (rows-only)"); continue
    s = con.execute(
        f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
    try:
        o = con.execute(oracle[q]).fetchdf()
    except Exception as e:
        print(f"{q}: ORACLE ERROR {e}"); fails += 1; continue
    sc, oc = sorted(s.columns), sorted(o.columns)
    rows = len(s) == len(o)
    schema = sc == oc
    if rows and schema:
        sv = s[sc].astype(str).values.tolist()
        ov = o[oc].astype(str).values.tolist()
        hashm = sv == ov
        if not hashm:
            for i, (a, b) in enumerate(zip(sv, ov)):
                if a != b:
                    print(f"  first diff row {i}: spark={a} oracle={b}")
                    break
    else:
        hashm = False
    ok = rows and schema and hashm
    fails += 0 if ok else 1
    print(f"{q}: rows={rows}({len(s)}/{len(o)}) schema={schema} hash={hashm}"
          + ("" if schema else f" spark={sc} oracle={oc}"))
sys.exit(1 if fails else 0)
