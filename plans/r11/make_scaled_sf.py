"""Deterministic 10x upscale of /root/testdata/sf0.1 for the r11
compute-bound-SF evidence (VERDICT r10 #4: all twelve sf0.1 scaling
ratios read < 1 — the headline bench is driver-bound there, so the
distributed-plan claims need one demonstration at a SF where task
time dominates).

NOT driver data and never used by any declared query or oracle — a
perf-sidecar corpus only (the committed artifact is
plans/r11/SCALE_BENCH.json). /root/testdata stays untouched.

Construction (pure pyarrow, seed-deterministic):
  * fact tables replicate 10x with disjoint key strides, so join
    selectivities, group sizes, and per-user session shapes match
    sf0.1 exactly (copy k offsets every key by k * (max_key+1));
  * events keep their timestamps (sessions per user unchanged);
  * documents for copies k>0 get a per-(copy, doc) seeded word
    shuffle: same vocabulary and length distribution, independent
    shingle sets — replicating text verbatim would make every doc a
    10-way near-dup and blow the candidate-pair count QUADRATICALLY,
    which would fake a superlinear minhash cost that real corpora do
    not have (the shuffle makes the pair count conservative instead:
    only copy-0 keeps the engineered near-dups);
  * embeddings replicate with offset ids (vector values copied: the
    ANN kernels' cost is rows x dim, not value-dependent);
  * every output is written with ~32 row groups — the SPLITTABLE
    production layout, so session.scan_fanout is a no-op (its
    documented at-scale behavior) and scans parallelize natively.

Usage: python plans/r11/make_scaled_sf.py [out_dir] [factor]
"""

from __future__ import annotations

import random
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _write(path: str, table: pa.Table, splits: int = 32) -> None:
    pq.write_table(
        table,
        path,
        row_group_size=max(1, table.num_rows // splits),
        compression="zstd",
    )


def _stride(col: pa.ChunkedArray) -> int:
    return int(pc.max(col).as_py()) + 1


def _replicate(table: pa.Table, factor: int, key_strides: dict[str, int]) -> pa.Table:
    parts = []
    for k in range(factor):
        t = table
        for col, stride in key_strides.items():
            idx = t.schema.get_field_index(col)
            t = t.set_column(
                idx, col, pc.add(t.column(col), pa.scalar(k * stride))
            )
        parts.append(t)
    return pa.concat_tables(parts)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/sf1_scaled"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import os

    os.makedirs(out, exist_ok=True)

    for name in ("region", "nation", "part", "supplier"):
        _write(f"{out}/{name}.parquet", pq.read_table(f"{SRC}/{name}.parquet"), 1)

    cust = pq.read_table(f"{SRC}/customer.parquet")
    orders = pq.read_table(f"{SRC}/orders.parquet")
    li = pq.read_table(f"{SRC}/lineitem.parquet")
    cs = _stride(cust.column("c_custkey"))
    os_ = _stride(orders.column("o_orderkey"))
    _write(f"{out}/customer.parquet", _replicate(cust, factor, {"c_custkey": cs}))
    _write(
        f"{out}/orders.parquet",
        _replicate(orders, factor, {"o_orderkey": os_, "o_custkey": cs}),
    )
    _write(f"{out}/lineitem.parquet", _replicate(li, factor, {"l_orderkey": os_}))

    ev = pq.read_table(f"{SRC}/events.parquet")
    es = _stride(ev.column("event_id"))
    us = _stride(ev.column("user_id"))
    _write(
        f"{out}/events.parquet",
        _replicate(ev, factor, {"event_id": es, "user_id": us}),
    )

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vs = _stride(emb.column("vec_id"))
    _write(f"{out}/embeddings.parquet", _replicate(emb, factor, {"vec_id": vs}))

    docs = pq.read_table(f"{SRC}/documents.parquet")
    ds = _stride(docs.column("doc_id"))
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    parts = [docs]
    for k in range(1, factor):
        shuffled = []
        for did, text in zip(ids, texts):
            toks = (text or "").split(" ")
            random.Random(f"sf-scale:{k}:{did}").shuffle(toks)
            shuffled.append(" ".join(toks))
        t = docs.set_column(
            docs.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(docs.column("doc_id"), pa.scalar(k * ds)),
        )
        t = t.set_column(
            t.schema.get_field_index("text"),
            "text",
            pa.chunked_array([pa.array(shuffled, type=pa.string())]),
        )
        parts.append(t)
    _write(f"{out}/documents.parquet", pa.concat_tables(parts))

    for name in (
        "customer",
        "orders",
        "lineitem",
        "events",
        "embeddings",
        "documents",
    ):
        f = pq.ParquetFile(f"{out}/{name}.parquet")
        print(name, f.metadata.num_rows, "rows,", f.metadata.num_row_groups, "row groups")


if __name__ == "__main__":
    main()
