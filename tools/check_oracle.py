#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each parquet table in sfDir as a DuckDB view, runs every oracle SQL
from <verifyOutDir>/oracle_sql.json, loads the engine's dumped parquet result,
and compares: schema (column names sorted), row count, and cell values
(columns sorted by name, rows in dumped order vs oracle order).
"""
import json, sys, glob, os
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    return [c for c in sorted(cols)], out

def norm(v):
    import datetime, decimal
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, float) and v == int(v):
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        try:
            got_rel = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            got_cols, got = canon(got_rel.fetchall(), got_rel.columns)
            want_rel = con.sql(sql)
            want_cols, want = canon(want_rel.fetchall(), want_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: error {str(e)[:200]}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
        elif got != want:
            diffs = [(i, g, w) for i, (g, w) in enumerate(zip(got, want)) if g != w]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: idx={diffs[0][0]}")
            print(f"   got:  {diffs[0][1]}")
            print(f"   want: {diffs[0][2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # queries without oracle: report rows-only
    for res in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(res.rstrip("/"))
        if name not in oracle:
            n = con.sql(f"SELECT count(*) FROM '{res}/*.parquet'").fetchone()[0]
            print(f"INFO {name}: no oracle, rows={n}")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
