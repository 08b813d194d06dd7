#!/usr/bin/env python3
"""Build an N-fold replica of a testdata scale factor for SCALING runs.

Replicates the relational graph K times with consistent key offsets: every
copy i shifts each table's surrogate keys by i * (max_key + 1) of the
referenced table, so referential integrity holds within each copy and the
copies are disjoint. nation/region (fixed-domain dims) are kept single-copy
and FKs into them are left unshifted.

Two modes:

- default (DENSITY replica): row content is otherwise unchanged — every
  text, name, and embedding exists in K identical copies. Deliberately
  adversarial for bucketed-similarity operators (each bucket grows K-fold,
  candidate pairs K²-fold): the dedup stress test.

- --distinct (EXTENT replica): content is perturbed per copy with seeded,
  deterministic transforms so cross-copy entities are genuinely distinct —
  the realistic "10× more of the world" growth axis:
    * documents.text: every token of copy i>0 gets the suffix _<i>, so
      cross-copy shingle sets are disjoint (Jaccard 0) while WITHIN-copy
      near-dup structure is preserved exactly;
    * customer.c_name: suffix ~c<i*7919> (multi-char, so cross-copy names
      stay several edits apart for fuzzy joins);
    * embeddings.embedding: copy i>0 components re-randomized value-dependently
      (sin hash of component × copy seed — deterministic, distribution-
      preserving in range, identical base vectors stay identical within a
      copy, cross-copy cosine decorrelated).

Usage: make_sf_replica.py SRC_DIR DST_DIR K [--distinct]
"""
import os
import sys

import duckdb

SRC, DST, K = sys.argv[1], sys.argv[2], int(sys.argv[3])
DISTINCT = "--distinct" in sys.argv[4:]

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
# i * BASES[name]; unlisted columns are copied verbatim (default mode) or
# perturbed per PERTURB below (--distinct mode, copies i > 0 only).
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

# --distinct content transforms: {table: {column: sql_expr_fn(i)}}
PERTURB = {
    "documents": {
        "text": lambda i: (
            "array_to_string(list_transform(string_split(text, ' '), "
            f"w -> w || '_{i}'), ' ')"),
    },
    "customer": {
        "c_name": lambda i: f"c_name || '~c{i * 7919}'",
    },
    "embeddings": {
        "embedding": lambda i: (
            "list_transform(embedding, x -> CAST(sin(x * 43758.5453 + "
            f"{i} * 7.61) AS FLOAT))"),
    },
}

os.makedirs(DST, exist_ok=True)
for table, offsets in PLAN:
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]
    copies = 1 if not offsets else K  # fixed dims stay single-copy
    perturb = PERTURB.get(table, {}) if DISTINCT else {}
    selects = []
    for i in range(copies):
        exprs = []
        for c in cols:
            if c in offsets:
                exprs.append(f"{c} + {i} * {BASES[offsets[c]]} AS {c}")
            elif i > 0 and c in perturb:
                exprs.append(f"{perturb[c](i)} AS {c}")
            else:
                exprs.append(c)
        selects.append(
            f"SELECT {', '.join(exprs)} FROM '{SRC}/{table}.parquet'")
    q = " UNION ALL ".join(selects)
    con.execute(f"COPY ({q}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT COUNT(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows ({copies} copies"
          + (", perturbed" if perturb else "") + ")")
