#!/usr/bin/env python3
"""Whole-surface determinism sweep: compare two graft.Verify dumps.

Usage: python3 tools/determinism_diff.py /tmp/det_a /tmp/det_b

For every query dir present in both dumps, counts rows in
(a EXCEPT ALL b) UNION ALL (b EXCEPT ALL a) via DuckDB. Any nonzero
count is a nondeterministic query the driver's hash gate will
eventually flake on.
"""
import sys
import os
import duckdb

a, b = sys.argv[1], sys.argv[2]
names = sorted(set(os.listdir(a)) & set(os.listdir(b)))
names = [n for n in names if os.path.isdir(os.path.join(a, n))]
con = duckdb.connect()
bad = 0
for n in names:
    pa, pb = f"{a}/{n}/*.parquet", f"{b}/{n}/*.parquet"
    diff = con.execute(
        f"SELECT (SELECT COUNT(*) FROM (SELECT * FROM '{pa}' EXCEPT ALL "
        f"SELECT * FROM '{pb}')) + (SELECT COUNT(*) FROM (SELECT * FROM "
        f"'{pb}' EXCEPT ALL SELECT * FROM '{pa}'))").fetchone()[0]
    if diff:
        bad += 1
        print(f"DIFF {n}: {diff} rows differ")
print(f"{len(names) - bad}/{len(names)} queries bit-identical across re-runs")
sys.exit(1 if bad else 0)
