#!/usr/bin/env python3
"""Synthesize an sf1 (10x sf0.1) dataset under /tmp for SCALE-SLOPE
measurement only (never correctness -- the DuckDB oracle keeps running
at sf0.01 against the driver's own data).

Method: 10 key-offset copies of every sf0.1 table, FK-closure
preserved per copy (orders.o_custkey offsets with customer.c_custkey,
lineitem offsets with orders/part/supplier). region/nation stay fixed
(customer.c_nationkey references them unchanged).

Distribution honesty:
- documents: a verbatim 10x copy would make every doc a 10-way
  near-duplicate and blow up LSH bucket sizes with structure the real
  corpus does not have. Copy i>0 rewrites ~25% of tokens
  (hash(token) % 4 == i % 4 -> token + str(i)), dropping 3-shingle
  Jaccard vs the original well below near-dup thresholds, so the
  DUPLICATE RATE stays that of the base corpus while volume is 10x.
- embeddings: copy i>0 perturbs each component deterministically
  (+ (i * (dim_index % 7 - 3)) * 1e-3) so vectors are distinct but the
  space keeps its cluster shape.
- events: user_id offsets per copy -> 10x users with the SAME per-user
  activity profile; timestamps unchanged (10x concurrent load).
"""
import zlib

import duckdb
import numpy as np
import pandas as pd
import pathlib
import sys

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-sf1"
COPIES = 10

# Writing into SRC would overwrite the driver's test data with 10x
# copies of itself (argv[1] is the DESTINATION — this happened once;
# recovery = filter copy 0, but never again).
assert pathlib.Path(DST).resolve() != pathlib.Path(SRC).resolve(), (
    f"DST {DST} is the source test data — pass an output dir under /tmp")
assert not str(pathlib.Path(DST).resolve()).startswith("/root/testdata"), (
    f"refusing to write into /root/testdata: {DST}")

pathlib.Path(DST).mkdir(parents=True, exist_ok=True)
con = duckdb.connect()


def maxv(table, col):
    return con.sql(
        f"SELECT max({col}) FROM read_parquet('{SRC}/{table}.parquet')"
    ).fetchone()[0]


def copy_union(table, offsets, extra=""):
    """offsets: list of (col, stride) -- col' = col + i*stride in copy i."""
    parts = []
    for i in range(COPIES):
        sel = ", ".join(
            [f"({c} + {i} * {s}) AS {c}" for c, s in offsets]
            + ["* EXCLUDE (" + ", ".join(c for c, _ in offsets) + ")"]
        )
        parts.append(
            f"SELECT {sel}{extra.format(i=i)} "
            f"FROM read_parquet('{SRC}/{table}.parquet')"
        )
    con.sql(" UNION ALL ".join(parts)).write_parquet(
        f"{DST}/{table}.parquet"
    )
    n = con.sql(
        f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')"
    ).fetchone()[0]
    print(f"{table}: {n} rows")


# fixed dims
for t in ("region", "nation"):
    con.sql(f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')") \
        .write_parquet(f"{DST}/{t}.parquet")
    print(f"{t}: copied")

K_CUST = maxv("customer", "c_custkey") + 1
K_ORD = maxv("orders", "o_orderkey") + 1
K_PART = maxv("part", "p_partkey") + 1
K_SUPP = maxv("supplier", "s_suppkey") + 1

copy_union("customer", [("c_custkey", K_CUST)])
copy_union("supplier", [("s_suppkey", K_SUPP)])
copy_union("part", [("p_partkey", K_PART)])
copy_union("orders", [("o_orderkey", K_ORD), ("o_custkey", K_CUST)])
copy_union("lineitem", [("l_orderkey", K_ORD), ("l_partkey", K_PART),
                        ("l_suppkey", K_SUPP)])

# events: scale the user population, keep per-user profiles
K_USER = maxv("events", "user_id") + 1
K_EVENT = maxv("events", "event_id") + 1
copy_union("events", [("event_id", K_EVENT), ("user_id", K_USER)])

# documents: token-rewrite per copy (see module docstring)
docs = con.sql(
    f"SELECT * FROM read_parquet('{SRC}/documents.parquet')"
).df()
K_DOC = int(docs["doc_id"].max()) + 1


def rewrite(text, i):
    if i == 0 or not isinstance(text, str):
        return text
    out = []
    for tok in text.split(" "):
        # deterministic 25% rewrite keyed on the token itself
        # (crc32, not hash() -- python salts hash() per process)
        if tok and zlib.crc32(tok.encode()) % 4 == i % 4:
            out.append(tok + str(i))
        else:
            out.append(tok)
    return " ".join(out)


frames = []
for i in range(COPIES):
    d = docs.copy()
    d["doc_id"] = d["doc_id"] + i * K_DOC
    if i > 0:
        d["text"] = [rewrite(t, i) for t in d["text"]]
        d["n_chars"] = d["text"].str.len()
    frames.append(d)
pd.concat(frames, ignore_index=True).to_parquet(
    f"{DST}/documents.parquet", index=False)
print(f"documents: {len(docs) * COPIES} rows")

# embeddings: deterministic per-copy perturbation
emb = con.sql(
    f"SELECT * FROM read_parquet('{SRC}/embeddings.parquet')"
).df()
K_EMB = int(emb["id"].max()) + 1 if "id" in emb.columns else None
id_col = "id" if "id" in emb.columns else emb.columns[0]
K_EMB = int(emb[id_col].max()) + 1
vec_col = [c for c in emb.columns if c != id_col and
           isinstance(emb[c].iloc[0], (list, np.ndarray))][0]
frames = []
for i in range(COPIES):
    e = emb.copy()
    e[id_col] = e[id_col] + i * K_EMB
    if i > 0:
        e[vec_col] = [
            (np.asarray(v, dtype=np.float32)
             + np.float32(1e-3 * i)
             * ((np.arange(len(v)) % 7) - 3).astype(np.float32))
            for v in e[vec_col]
        ]
    frames.append(e)
pd.concat(frames, ignore_index=True).to_parquet(
    f"{DST}/embeddings.parquet", index=False)
print(f"embeddings: {len(emb) * COPIES} rows")
print("done ->", DST)
