"""Sequence packing: greedy assembly of documents into fixed token-budget
training sequences (context windows).

LLM pre-training wants every context window full: short documents are
concatenated until the next one would overflow the window, then a new pack
starts. The scan is inherently sequential — pack membership of document i
depends on the running total of everything before it — so it cannot be a
Catalyst expression. It IS embarrassingly parallel across hash buckets,
which is exactly how the large-scale pipelines run it: shard the corpus,
pack within each shard.

Plan shape: one shuffle (groupBy bucket) into ``applyInPandas``, whose
per-group body is a vectorized cumulative scan — no Python loop per row,
Arrow both ways. Parallelism = n_buckets; at 100 TB raise n_buckets so each
bucket's token counts (16 bytes/doc — the text itself never enters this
operator) fit one task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

PACK_SCHEMA = "doc_id bigint, bucket bigint, pack_id bigint, seq_in_pack bigint, n_tokens bigint"


def _pack_scan(tokens: np.ndarray, budget: int) -> tuple[np.ndarray, np.ndarray]:
    """Greedy pack ids + in-pack positions for an ordered token-count array.

    Rule: a document joins the current pack iff the running total stays
    ≤ budget; otherwise it starts a new pack (an oversized document gets a
    pack of its own). Sequential by nature; numpy keeps it out of the
    per-row Python interpreter for everything but the boundary scan.
    """
    n = len(tokens)
    pack_id = np.zeros(n, dtype=np.int64)
    seq = np.zeros(n, dtype=np.int64)
    acc = 0
    cur = 0
    pos = 0
    for i in range(n):
        t = int(tokens[i])
        if pos > 0 and acc + t > budget:
            cur += 1
            acc = 0
            pos = 0
        pos += 1
        acc += t
        pack_id[i] = cur
        seq[i] = pos
    return pack_id, seq


def pack_sequences(
    docs: DataFrame,
    budget: int = 256,
    n_buckets: int = 16,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(doc_id, bucket, pack_id, seq_in_pack, n_tokens) greedy packing.

    ``docs`` needs an id column and a precomputed token count; the operator
    buckets by ``id mod n_buckets`` (real pipelines hash — the point is any
    deterministic shard function), orders by id within each bucket, and
    packs greedily. pack_id is bucket-local; (bucket, pack_id) is the
    global pack key.
    """
    shard = docs.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(n_buckets)).cast("bigint").alias("bucket"),
        F.col(tokens_col).cast("bigint").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        pack_id, seq = _pack_scan(pdf["n_tokens"].to_numpy(), budget)
        pdf["pack_id"] = pack_id
        pdf["seq_in_pack"] = seq
        return pdf[["doc_id", "bucket", "pack_id", "seq_in_pack", "n_tokens"]]

    return shard.groupBy("bucket").applyInPandas(pack, PACK_SCHEMA)
