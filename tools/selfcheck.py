#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/verify_out
Reads each <out>/<name> parquet written by graft.Verify, runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the sf tables, and
compares values column-sorted-by-name, row-sorted.
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
ok = fail = skip = 0
# Verify-side runtime errors (crashing queries write no parquet dir; this is
# the loud record of why a query is absent below).
err_path = os.path.join(out_dir, "errors.json")
if os.path.exists(err_path):
    for name, msg in json.load(open(err_path)).items():
        print(f"ERR {name}: {msg}")
        fail += 1
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        continue
    files = glob.glob(path + "/*.parquet")
    if not files:
        print(f"EMPTYDIR {name}")
        fail += 1
        continue
    got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
    if name not in oracles:
        print(f"ROWSONLY {name}: {len(got)} rows")
        skip += 1
        continue
    try:
        exp = con.sql(oracles[name]).df()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}")
        fail += 1
        continue
    g = got.reindex(sorted(got.columns), axis=1)
    e_ = exp.reindex(sorted(exp.columns), axis=1)
    if list(g.columns) != list(e_.columns):
        print(f"SCHEMA {name}: got {list(g.columns)} vs exp {list(e_.columns)}")
        fail += 1
        continue
    if len(g) != len(e_):
        print(f"ROWS {name}: got {len(g)} vs exp {len(e_)}")
        fail += 1
        continue
    gs = g.sort_values(by=list(g.columns)).reset_index(drop=True).astype(str)
    es = e_.sort_values(by=list(e_.columns)).reset_index(drop=True).astype(str)
    if gs.equals(es):
        print(f"OK {name}: {len(g)} rows")
        ok += 1
    else:
        diff = (gs != es).any(axis=1)
        print(f"VALUES {name}: {diff.sum()} differing rows; first:")
        idx = diff[diff].index[:3]
        for i in idx:
            print("  got:", dict(gs.loc[i]))
            print("  exp:", dict(es.loc[i]))
        fail += 1
print(f"\n{ok} ok, {fail} fail, {skip} rows-only")
sys.exit(1 if fail else 0)
