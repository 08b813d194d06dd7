#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf tables and diff against the Spark parquet dumps
produced by graft.Verify. Usage: compare_oracle.py <sfDir> <verifyOut>"""
import json, sys, math
import duckdb

sfdir, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql)
        exp_cols = [d[0] for d in exp.description]
        exp_rows = exp.fetchall()
        got = con.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
    except Exception as e:
        print(f"FAIL {name}: exec error {e}")
        fail += 1
        continue
    if sorted(exp_cols) != sorted(got_cols):
        print(f"FAIL {name}: cols {sorted(exp_cols)} vs {sorted(got_cols)}")
        fail += 1
        continue
    # driver sorts columns by name before hashing values
    eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
    gidx = [got_cols.index(c) for c in sorted(got_cols)]
    er = [tuple(r[i] for i in eidx) for r in exp_rows]
    gr = [tuple(r[i] for i in gidx) for r in got_rows]
    if len(er) != len(gr):
        print(f"FAIL {name}: rows {len(er)} vs {len(gr)}")
        fail += 1
        continue
    bad = None
    for i, (a, b) in enumerate(zip(er, gr)):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                if x != y and not (math.isnan(x) and math.isnan(y)):
                    bad = (i, x, y)
            elif str(x) != str(y):
                bad = (i, x, y)
            if bad:
                break
        if bad:
            break
    if bad:
        print(f"FAIL {name}: row {bad[0]}: {bad[1]!r} != {bad[2]!r}")
        fail += 1
    else:
        print(f"ok   {name}: {len(er)} rows")
print(f"\n{len(oracle) - fail}/{len(oracle)} queries match")
sys.exit(1 if fail else 0)
