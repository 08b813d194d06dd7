#!/usr/bin/env python3
"""Build an N-fold replica of a testdata scale factor for SCALING runs.

Replicates the relational graph K times with consistent key offsets: every
copy i shifts each table's surrogate keys by i * (max_key + 1) of the
referenced table, so referential integrity holds within each copy and the
copies are disjoint. nation/region (fixed-domain dims) are kept single-copy
and FKs into them are left unshifted. Row content is otherwise unchanged —
this measures how plans scale with data volume, not new value distributions.

Usage: make_sf_replica.py SRC_DIR DST_DIR K
"""
import sys

import duckdb

SRC, DST, K = sys.argv[1], sys.argv[2], int(sys.argv[3])

con = duckdb.connect()


def key_base(table, col):
    return con.execute(
        f"SELECT MAX({col}) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0]


BASES = {
    "orders": key_base("orders", "o_orderkey"),
    "customer": key_base("customer", "c_custkey"),
    "supplier": key_base("supplier", "s_suppkey"),
    "part": key_base("part", "p_partkey"),
    "events": key_base("events", "event_id"),
    "users": key_base("events", "user_id"),
    "documents": key_base("documents", "doc_id"),
    "embeddings": key_base("embeddings", "vec_id"),
}

# (table, {column: base-key name}) — every listed column is offset by
# i * BASES[name]; unlisted columns are copied verbatim.
PLAN = [
    ("region", {}),
    ("nation", {}),
    ("customer", {"c_custkey": "customer"}),
    ("supplier", {"s_suppkey": "supplier"}),
    ("part", {"p_partkey": "part"}),
    ("orders", {"o_orderkey": "orders", "o_custkey": "customer"}),
    ("lineitem", {"l_orderkey": "orders", "l_partkey": "part",
                  "l_suppkey": "supplier"}),
    ("events", {"event_id": "events", "user_id": "users"}),
    ("documents", {"doc_id": "documents"}),
    ("embeddings", {"vec_id": "embeddings"}),
]

import os

os.makedirs(DST, exist_ok=True)
for table, offsets in PLAN:
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]
    copies = 1 if not offsets else K  # fixed dims stay single-copy
    selects = []
    for i in range(copies):
        exprs = []
        for c in cols:
            if c in offsets:
                exprs.append(f"{c} + {i} * {BASES[offsets[c]]} AS {c}")
            else:
                exprs.append(c)
        selects.append(
            f"SELECT {', '.join(exprs)} FROM '{SRC}/{table}.parquet'")
    q = " UNION ALL ".join(selects)
    con.execute(f"COPY ({q}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT COUNT(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows ({copies} copies)")
