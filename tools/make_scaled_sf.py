#!/usr/bin/env python
"""Derive a larger scale factor from an existing fixture directory —
the parallelism-measurement tier VERDICT r13 item 7 asks for ("everything
at sf0.1 is overhead-bound ... add an sf1 bench tier").

The driver's generator is not available (testdata is read-only), so this
derives sfN as N deterministic shards of the base fixture with disjoint
key spaces:

- High-cardinality primary/foreign keys shift by ``copy × BASE`` with
  consistent bases across tables, so every join keeps its per-key
  fan-out and selectivity; group counts scale ×N.
- ``region``/``nation`` (low-cardinality dims, referenced by unshifted
  nationkey/regionkey) are copied once.
- ``documents.text`` of copy i>0 gets a per-copy salt token inserted
  every 5 words (n_chars recomputed): exact- and near-dup group sizes
  stay CONSTANT as the corpus scales (plain copies would make every
  dedup query quadratic in N, which is a different workload, not a
  bigger one).  Salt tokens are ``[a-z0-9]+`` so the tokenizers see
  ordinary words.
- ``embeddings.embedding`` of copy i>0 is cyclically rotated by
  ``7·i+1`` dims: norm- and distribution-preserving, and rotated copies
  do not collide in sign buckets, so near-dup pair counts scale ~×N.

Output parquet is written with bounded row groups (the split unit), so
scans parallelize naturally — the point of the tier is to measure
parallel scaling, not to re-create the one-row-group straggler.

Usage: python tools/make_scaled_sf.py [N] [BASE_DIR] [OUT_DIR]
       (defaults: 10 /root/testdata/sf0.1 /root/testdata_derived/sf1)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

BASES = {
    "c_custkey": 100_000,
    "s_suppkey": 10_000,
    "p_partkey": 100_000,
    "o_orderkey": 1_000_000,
    "l_orderkey": 1_000_000,
    "l_partkey": 100_000,
    "l_suppkey": 10_000,
    "o_custkey": 100_000,
    "doc_id": 100_000,
    "vec_id": 10_000,
    "event_id": 1_000_000,
    "user_id": 10_000,
}

COPY_ONCE = {"region", "nation"}

ROWS_PER_GROUP = {
    # ~64 splits for the biggest table at N=10; small tables get >= N
    # groups so even an 8-core run has work to split.
    "lineitem": 100_000,
    "events": 20_000,
    "orders": 30_000,
    "customer": 10_000,
    "part": 10_000,
    "documents": 2_000,
    "embeddings": 1_000,
    "supplier": 1_000,
}


def salt_text(text: str, copy: int) -> str:
    if not text:
        return text
    words = text.split(" ")
    salt = f"zz{copy}x"
    out = []
    for i, w in enumerate(words):
        if i and i % 5 == 0:
            out.append(salt)
        out.append(w)
    return " ".join(out)


def scale_table(name: str, table: pa.Table, copy: int) -> pa.Table:
    import pyarrow.compute as pc

    cols = {}
    for field in table.schema:
        col = table[field.name]
        if field.name in BASES and copy:
            col = pc.add(col, copy * BASES[field.name])
        cols[field.name] = col
    if name == "documents" and copy:
        texts = [salt_text(t, copy) if t is not None else None
                 for t in cols["text"].to_pylist()]
        cols["text"] = pa.array(texts, type=pa.string())
        cols["n_chars"] = pa.array(
            [len(t) if t is not None else None for t in texts],
            type=table.schema.field("n_chars").type,
        )
    if name == "embeddings" and copy:
        rot = 7 * copy + 1
        vecs = []
        for v in cols["embedding"].to_pylist():
            if v is None:
                vecs.append(None)
            else:
                r = rot % len(v)
                vecs.append(v[r:] + v[:r])
        cols["embedding"] = pa.array(
            vecs, type=table.schema.field("embedding").type
        )
    return pa.table(cols, schema=pa.schema(
        [table.schema.field(i) for i in range(len(table.schema))]
    ))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "/root/testdata_derived/sf1"
    )
    os.makedirs(out, exist_ok=True)
    import glob

    for path in sorted(glob.glob(os.path.join(base, "*.parquet"))):
        name = os.path.splitext(os.path.basename(path))[0]
        src = pq.read_table(path)
        if name in COPY_ONCE:
            scaled = src
        else:
            scaled = pa.concat_tables(
                [scale_table(name, src, i) for i in range(n)]
            )
        pq.write_table(
            scaled,
            os.path.join(out, f"{name}.parquet"),
            row_group_size=ROWS_PER_GROUP.get(name, 50_000),
            compression="zstd",
        )
        print(f"{name}: {src.num_rows} -> {scaled.num_rows} rows")


if __name__ == "__main__":
    main()
