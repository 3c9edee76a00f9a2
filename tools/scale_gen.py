"""Generate an sf1 fixture locally (VERDICT_r12 item 4).

The driver ships sf0.001/sf0.01/sf0.1; the 100 TB story needs at least
one measured 10x point. This produces sf1 as TEN FK-CONSISTENT shifted
copies of sf0.1 (copy j shifts every key and every foreign key by
j * stride, so joins keep exactly the per-copy structure of sf0.1 and
the keyspace grows 10x — more customers/orders/users over the SAME
time range, which is how real traffic scales). region/nation stay
fixed (TPC-H scales facts, not geography).

Text and vectors must NOT be verbatim copies — 10 identical copies
would flood the similarity operators with artificial cross-copy
duplicates and distort their output size. Instead:

- documents: copy j of doc i splices the first half of text(i) with
  the second half of text((i + j*K) mod n) — same length and shingle
  distribution, but cross-copy Jaccard ~1/3, safely below the 0.8-band
  near-dup thresholds (copy 0 keeps the original corpus verbatim).
- embeddings: copy j of vec i is the midpoint of vec(i) and
  vec((i + j*197) mod n) — new in-distribution points, not clones
  (copy 0 keeps the originals).

Rows at sf1: lineitem 6M, orders 1.5M, events 1M, customer 150k,
part 200k, documents 50k, embeddings 20k. Output is written as
N_PARTS parquet part-files per fact table so Spark's scan parallelism
matches a real multi-file layout.

Usage: python tools/scale_gen.py [out_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10

# key strides, comfortably above each table's sf0.1 max key
STRIDE = {
    "c_custkey": 1_000_000,
    "s_suppkey": 1_000_000,
    "p_partkey": 1_000_000,
    "o_orderkey": 10_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def _copy_union(con, table: str, shifted_cols: dict[str, str],
                other_cols: list[str]) -> str:
    """SQL producing COPIES shifted copies of `table`."""
    parts = []
    for j in range(COPIES):
        sel = ", ".join(
            [f"{c} + {j * STRIDE[s]} AS {c}"
             for c, s in shifted_cols.items()]
            + other_cols)
        parts.append(
            f"SELECT {sel} FROM '{SRC}/{table}.parquet'")
    return " UNION ALL ".join(parts)


def _write(con, sql: str, out: str, n_parts: int) -> int:
    tbl = con.execute(sql).arrow()
    os.makedirs(out, exist_ok=True)
    n = tbl.num_rows
    step = (n + n_parts - 1) // n_parts
    for i in range(n_parts):
        chunk = tbl.slice(i * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(out, f"part-{i:03d}.parquet"))
    return n


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    con = duckdb.connect()
    t0 = time.time()

    # fixed dimensions: verbatim
    for t in ("region", "nation"):
        _write(con, f"SELECT * FROM '{SRC}/{t}.parquet'",
               os.path.join(out_root, f"{t}.parquet"), 1)

    n = _write(con, _copy_union(
        con, "customer", {"c_custkey": "c_custkey"},
        ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]),
        os.path.join(out_root, "customer.parquet"), 4)
    print(f"customer {n}")
    n = _write(con, _copy_union(
        con, "supplier", {"s_suppkey": "s_suppkey"},
        ["s_name", "s_nationkey", "s_acctbal"]),
        os.path.join(out_root, "supplier.parquet"), 2)
    print(f"supplier {n}")
    n = _write(con, _copy_union(
        con, "part", {"p_partkey": "p_partkey"},
        ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"]),
        os.path.join(out_root, "part.parquet"), 4)
    print(f"part {n}")
    n = _write(con, _copy_union(
        con, "orders",
        {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
        ["o_orderstatus", "o_totalprice", "o_orderdate",
         "o_orderpriority"]),
        os.path.join(out_root, "orders.parquet"), 16)
    print(f"orders {n}")
    n = _write(con, _copy_union(
        con, "lineitem",
        {"l_orderkey": "o_orderkey", "l_partkey": "p_partkey",
         "l_suppkey": "s_suppkey"},
        ["l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
         "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"]),
        os.path.join(out_root, "lineitem.parquet"), 32)
    print(f"lineitem {n}")
    n = _write(con, _copy_union(
        con, "events",
        {"event_id": "event_id", "user_id": "user_id"},
        ["ts", "event_type", "value", "props"]),
        os.path.join(out_root, "events.parquet"), 16)
    print(f"events {n}")

    # documents: half-splice per copy (see module docstring)
    parts = [f"SELECT * FROM '{SRC}/documents.parquet'"]
    ndocs = con.execute(
        f"SELECT COUNT(*) FROM '{SRC}/documents.parquet'").fetchone()[0]
    for j in range(1, COPIES):
        off = (j * 197) % ndocs
        parts.append(f"""
        SELECT a.doc_id + {j * STRIDE['doc_id']} AS doc_id,
               substr(a.text, 1, CAST(length(a.text) / 2 AS INTEGER))
                 || substr(b.text,
                           CAST(length(b.text) / 2 AS INTEGER) + 1)
                 AS text,
               a.lang, a.source,
               CAST(length(substr(a.text, 1,
                      CAST(length(a.text) / 2 AS INTEGER))
                 || substr(b.text,
                           CAST(length(b.text) / 2 AS INTEGER) + 1))
                 AS BIGINT) AS n_chars
        FROM '{SRC}/documents.parquet' a
        JOIN '{SRC}/documents.parquet' b
          ON b.doc_id = (a.doc_id + {off}) % {ndocs}
        """)
    n = _write(con, " UNION ALL ".join(parts),
               os.path.join(out_root, "documents.parquet"), 8)
    print(f"documents {n}")

    # embeddings: midpoint splice per copy
    emb = con.execute(
        f"SELECT vec_id, embedding, label FROM "
        f"'{SRC}/embeddings.parquet' ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in emb], dtype=np.int64)
    vecs = np.array([r[1] for r in emb], dtype=np.float32)
    labels = np.array([r[2] for r in emb], dtype=np.int32)
    nv = len(ids)
    all_ids, all_vecs, all_labels = [ids], [vecs], [labels]
    for j in range(1, COPIES):
        m = (np.arange(nv) + j * 197) % nv
        all_ids.append(ids + j * STRIDE["vec_id"])
        all_vecs.append(((vecs + vecs[m]) / 2.0).astype(np.float32))
        all_labels.append(labels)
    tbl = pa.table({
        "vec_id": pa.array(np.concatenate(all_ids)),
        "embedding": pa.array(
            list(np.concatenate(all_vecs)),
            type=pa.list_(pa.float32())),
        "label": pa.array(np.concatenate(all_labels)),
    })
    out = os.path.join(out_root, "embeddings.parquet")
    os.makedirs(out, exist_ok=True)
    pq.write_table(tbl, os.path.join(out, "part-000.parquet"))
    print(f"embeddings {tbl.num_rows}")

    print(f"sf1 written to {out_root} in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
