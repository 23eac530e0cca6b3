#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [nameFilter,...]

Registers each parquet table in sfDir as a DuckDB view, runs every oracle SQL
from <verifyOutDir>/oracle_sql.json, loads the engine's dumped parquet result,
and compares in the DRIVER'S shape (the r13 lesson — our old fetchall-order
compare could not reproduce the driver's q163 crash or its hash semantics):

  1. both sides go through pandas DataFrames (duckdb .df()), so
     engine-valued HUGEINT/Decimal/list conversions surface exactly as the
     driver sees them;
  2. columns are sorted by name, then rows are sorted with
     DataFrame.sort_values over ALL columns — this CRASHES on list/array
     columns exactly like the driver's canonicalizer, so an array-typed
     output column fails loudly here before the round gate;
  3. the value hash stringifies every cell dtype-sensitively (int64 "3" vs
     float64 "3.0" DIFFER) — a sum the oracle leaves as HUGEINT (→ float64
     in pandas) against Spark's BIGINT is a mismatch even when the values
     are numerically equal, matching the driver's strictness.
"""
import hashlib
import json, sys, glob, os
import duckdb
import numpy as np
import pandas as pd


def canon_df(df):
    """Driver-shaped canonicalization: sorted columns, pandas row sort."""
    cols = sorted(df.columns)
    df = df[cols]
    # the driver sorts rows with sort_values over all columns; lists crash
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df


def cell_repr(v):
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "NULL"
    if isinstance(v, (np.floating, float)):
        return repr(float(v))  # dtype-visible: 3.0 stays "3.0"
    if isinstance(v, (np.integer, int)):
        return repr(int(v))
    if isinstance(v, (np.bool_, bool)):
        return repr(bool(v))
    if isinstance(v, bytes):
        return "0x" + v.hex()
    return repr(v)


def frame_hash(df):
    h = hashlib.sha256()
    for row in df.itertuples(index=False, name=None):
        h.update("|".join(cell_repr(v) for v in row).encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir, name_filter=None):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    pats = name_filter.split(",") if name_filter else None
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if pats and not any(p in name for p in pats):
            continue
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no engine dump")
            n_fail += 1
            continue
        try:
            got = canon_df(con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: engine-side canon error {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            want = canon_df(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {str(e)[:200]}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
        elif frame_hash(got) != frame_hash(want):
            diffs = []
            for i in range(len(got)):
                g = tuple(cell_repr(v) for v in got.iloc[i])
                w = tuple(cell_repr(v) for v in want.iloc[i])
                if g != w:
                    diffs.append((i, g, w))
                    if len(diffs) >= 1:
                        break
            print(f"FAIL {name}: hash mismatch; first diff row idx={diffs[0][0] if diffs else '?'}")
            if diffs:
                print(f"   got:  {diffs[0][1]}")
                print(f"   want: {diffs[0][2]}")
                print(f"   engine dtypes: {dict(got.dtypes.astype(str))}")
                print(f"   oracle dtypes: {dict(want.dtypes.astype(str))}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # queries without oracle: report rows-only
    for res in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(res.rstrip("/"))
        if name not in oracle and (not pats or any(p in name for p in pats)):
            n = con.sql(f"SELECT count(*) FROM '{res}/*.parquet'").fetchone()[0]
            print(f"INFO {name}: no oracle, rows={n}")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None))
