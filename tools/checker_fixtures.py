#!/usr/bin/env python3
"""Synthetic fixtures for every known checker-stack divergence class.

Usage: python3 tools/checker_fixtures.py   (exit 0 = contract holds)

The external gate canonicalizes through pandas (`.df()` → sort_values →
dtype-sensitive value hash). Each class below cost (or nearly cost) a
round when it first surfaced; this suite pins the checker's behavior on
ALL of them so a duckdb/pandas/numpy upgrade that shifts any conversion
is caught by one command instead of by a red round gate. Wired into the
landing checklist next to check_oracle.py (run both, same interpreter).

Classes (expected checker verdict on the UNNORMALIZED form, then on the
Q-conventions form):
  1. list/array output column        → FAIL (pandas sort crash)  / PASS exploded
  2. HUGEINT (sum, //) vs BIGINT     → FAIL (float64 dtype hash) / PASS pinned
  3. NaN vs NULL and NaN row order   → PASS (both canon to NULL — pinned)
  4. signed zero (round of tiny neg) → FAIL (-0.0 repr)          / PASS +0.0
  5. DECIMAL output vs DOUBLE        → FAIL (Decimal object repr)/ PASS cast
  6. array-of-struct output          → FAIL (sort crash)         / PASS exploded
"""
import os
import sys
import tempfile

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
check_oracle = __import__("check_oracle")


def run_case(con, engine_sql, oracle_sql):
    """Dump engine_sql's result as the 'engine parquet', compare against
    oracle_sql through the real checker canon+hash path. Returns
    'PASS' | 'FAIL' | 'CRASH' (crash = canon raised, the checker's FAIL
    path for list columns)."""
    with tempfile.TemporaryDirectory() as td:
        eng = f"{td}/part.parquet"
        con.sql(f"COPY ({engine_sql}) TO '{eng}' (FORMAT PARQUET)")
        try:
            got = check_oracle.canon_df(con.sql(f"SELECT * FROM '{eng}'").df())
        except Exception:
            return "CRASH"
        try:
            want = check_oracle.canon_df(con.sql(oracle_sql).df())
        except Exception:
            return "CRASH"
        if list(got.columns) != list(want.columns) or len(got) != len(want):
            return "FAIL"
        if check_oracle.frame_hash(got) != check_oracle.frame_hash(want):
            return "FAIL"
        return "PASS"


def main():
    con = duckdb.connect()
    con.sql("CREATE TABLE t AS SELECT * FROM (VALUES (1, 10), (2, 20), (3, 30)) v(id, x)")
    cases = [
        # 1. list-valued output: the driver's row sort crashes (q163's red).
        ("list column crashes canon", "CRASH",
         "SELECT id, [x, x+1] AS codes FROM t ORDER BY id",
         "SELECT id, [x, x+1] AS codes FROM t ORDER BY id"),
        ("list column fixed by explode", "PASS",
         "SELECT id, unnest([x, x+1]) AS code FROM t",
         "SELECT id, unnest([x, x+1]) AS code FROM t"),
        # 2. HUGEINT: sum()/`//` widen; pandas converts HUGEINT to float64,
        #    so int64 "60" hashes != float64 "60.0" (q365/q426 reds).
        ("HUGEINT sum vs BIGINT engine", "FAIL",
         "SELECT CAST(sum(x) AS BIGINT) AS s FROM t",
         "SELECT sum(x) // 1 AS s FROM t"),
        ("HUGEINT pinned by CAST AS BIGINT", "PASS",
         "SELECT CAST(sum(x) AS BIGINT) AS s FROM t",
         "SELECT CAST(sum(x) // 1 AS BIGINT) AS s FROM t"),
        # 3. NaN: pandas turns SQL NULL doubles into NaN; the checker canon
        #    treats NaN and NULL as the SAME cell ("NULL") and sort_values
        #    places NaN last on both sides — pinned contract, PASS. A stack
        #    whose float_repr/sort starts distinguishing them breaks this.
        ("NaN == NULL double, NaN sorts last", "PASS",
         "SELECT id, CASE WHEN id = 2 THEN CAST('nan' AS DOUBLE) ELSE x/2.0 END AS v FROM t",
         "SELECT id, CASE WHEN id = 2 THEN NULL ELSE x/2.0 END AS v FROM t"),
        # 4. signed zero: DuckDB round() of a tiny negative yields IEEE -0.0,
        #    Spark emits +0.0 — repr distinguishes (the q435 sf0.1-only red).
        ("-0.0 vs +0.0", "FAIL",
         "SELECT 0.0::DOUBLE AS z",
         "SELECT round(-1e-9, 3) AS z"),
        ("signed zero normalized by + 0.0", "PASS",
         "SELECT 0.0::DOUBLE AS z",
         "SELECT round(-1e-9, 3) + 0.0 AS z"),
        # 5. DECIMAL output: in the CURRENT stack duckdb's .df() maps a
        #    parquet DECIMAL column to float64 on both sides, so an
        #    unrescaled decimal happens to hash equal to its double twin —
        #    PINNED AS PASS. If an upgrade starts surfacing Decimal
        #    objects (pyarrow decimal passthrough) this flips to FAIL and
        #    every decimal-emitting row must move to the cast convention
        #    below BEFORE the round gate sees it.
        ("DECIMAL column vs DOUBLE oracle (stack converts to float64)", "PASS",
         "SELECT CAST(x AS DECIMAL(10,2)) AS d FROM t ORDER BY id",
         "SELECT CAST(x AS DOUBLE) AS d FROM t ORDER BY id"),
        ("DECIMAL pinned by double cast both sides", "PASS",
         "SELECT CAST(CAST(x AS DECIMAL(10,2)) AS DOUBLE) AS d FROM t ORDER BY id",
         "SELECT CAST(x AS DOUBLE) AS d FROM t ORDER BY id"),
        # 6. array-of-struct output: same crash class as plain lists
        #    (pandas can't order ndarray/dict cells).
        ("array-of-struct crashes canon", "CRASH",
         "SELECT id, [{'a': x}] AS s FROM t ORDER BY id",
         "SELECT id, [{'a': x}] AS s FROM t ORDER BY id"),
        ("array-of-struct fixed by explode+flatten", "PASS",
         "SELECT id, x AS a FROM t",
         "SELECT id, unnest([{'a': x}], recursive := true) FROM t"),
    ]
    bad = 0
    for name, expect, engine_sql, oracle_sql in cases:
        got = run_case(con, engine_sql, oracle_sql)
        ok = "ok " if got == expect else "BAD"
        if got != expect:
            bad += 1
        print(f"{ok} [{got:5s} expected {expect:5s}] {name}")
    print(f"== {len(cases) - bad}/{len(cases)} fixture verdicts as pinned")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
