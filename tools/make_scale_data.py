#!/usr/bin/env python
"""Deterministic scale-up of the driver's sf0.1 testdata to larger scale
factors for the scale rehearsal (never touches /root/testdata — output
goes to a scratch dir, default .scratch/sf1).

Replication strategy (n_copies disjoint "shards" of the sf0.1 universe,
all transforms seeded per copy index — bit-identical on every run):

- relational tables: keys are dense 0..N-1, so copy i shifts every
  key/FK column by i·N of its own key space — referential integrity is
  preserved per copy, copies never join to each other, and attribute
  distributions are identical by construction.
- events: ids/users shift like keys; ts gets +i seconds so the event
  stream densifies (10× events over the same month — the realistic
  scale-up) without creating mass timestamp ties.
- documents: copy i rewrites each text through a seeded PERMUTATION of
  the corpus vocabulary. Word-level structure (exact dups, shingle
  overlaps, winnowing fingerprints, token counts) is preserved exactly
  WITHIN a copy — permuting the vocabulary is a bijection on shingle
  space — while shingles across copies collide only at the chance rate
  of unrelated docs. Near-dup/minhash candidate counts therefore grow
  LINEARLY in n_copies by construction, which is exactly the property
  the rehearsal must verify the ENGINE preserves (an all-pairs bug shows
  up as super-linear candidates regardless of data). n_chars is
  recomputed from the rewritten text.
- embeddings: copy i applies a seeded signed permutation of the 64
  dimensions — an orthogonal transform, so norms and all intra-copy
  cosines/distances are preserved exactly; cross-copy cosines fall to
  chance level. label kept.
- nation/region: fixed dimensions, single copy.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC_DEFAULT = "/root/testdata/sf0.1"

# table -> {column: key_space_size} (dense 0..N-1 keys at sf0.1)
KEY_SHIFTS = {
    "customer": {"c_custkey": 15_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
FIXED_DIMS = ("nation", "region")


def _shift_keys(tbl: pa.Table, shifts: dict[str, int], i: int) -> pa.Table:
    for col, space in shifts.items():
        idx = tbl.schema.get_field_index(col)
        tbl = tbl.set_column(idx, col, pc.add(tbl.column(col), i * space))
    return tbl


def _permute_texts(texts: list[str], vocab: list[str], i: int) -> list[str]:
    if i == 0:
        return texts
    rng = np.random.RandomState(1_000_003 + i)
    perm = {w: vocab[j] for w, j in zip(vocab, rng.permutation(len(vocab)))}
    return [" ".join(perm[w] for w in t.split(" ")) if t else t for t in texts]


def _copy_documents(tbl: pa.Table, i: int) -> pa.Table:
    tbl = _shift_keys(tbl, KEY_SHIFTS["documents"], i)
    if i == 0:
        return tbl
    texts = tbl.column("text").to_pylist()
    vocab = sorted({w for t in texts if t for w in t.split(" ")})
    new_texts = _permute_texts(texts, vocab, i)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("text"), "text", pa.array(new_texts, pa.string())
    )
    n_chars = pa.array([len(t) if t is not None else None for t in new_texts], pa.int64())
    return tbl.set_column(tbl.schema.get_field_index("n_chars"), "n_chars", n_chars)


def _copy_embeddings(tbl: pa.Table, i: int) -> pa.Table:
    tbl = _shift_keys(tbl, KEY_SHIFTS["embeddings"], i)
    if i == 0:
        return tbl
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float32)
    rng = np.random.RandomState(2_000_003 + i)
    dim = vecs.shape[1]
    perm = rng.permutation(dim)
    signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
    out = vecs[:, perm] * signs  # signed permutation: orthogonal, norm-exact
    emb = pa.array(out.tolist(), pa.list_(pa.float32()))
    return tbl.set_column(tbl.schema.get_field_index("embedding"), "embedding", emb)


def _copy_events(tbl: pa.Table, i: int) -> pa.Table:
    tbl = _shift_keys(tbl, KEY_SHIFTS["events"], i)
    if i == 0:
        return tbl
    idx = tbl.schema.get_field_index("ts")
    ts_type = tbl.schema.field("ts").type  # keep the driver's TIMESTAMP(NANOS)
    shifted = pc.add(
        tbl.column("ts"), pa.scalar(i * 1_000_000_000, pa.duration("ns"))
    ).cast(ts_type)
    return tbl.set_column(idx, "ts", shifted)


def make(src: str, dst: str, n_copies: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for name in FIXED_DIMS:
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"), f"{dst}/{name}.parquet")
    special = {"documents": _copy_documents, "embeddings": _copy_embeddings, "events": _copy_events}
    for name, shifts in KEY_SHIFTS.items():
        base = pq.read_table(f"{src}/{name}.parquet")
        fn = special.get(name)
        copies = [
            fn(base, i) if fn else _shift_keys(base, shifts, i) for i in range(n_copies)
        ]
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{dst}/{name}.parquet", row_group_size=200_000)
        print(f"{name}: {len(base)} -> {len(out)} rows", file=sys.stderr)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=SRC_DEFAULT)
    ap.add_argument("--dst", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1"))
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    make(args.src, args.dst, args.copies)
