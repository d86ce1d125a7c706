"""Sequence packing: assemble documents into fixed-token-budget training
sequences.

LLM training consumes fixed-length sequences; packing short documents
together (instead of padding each to the context length) is the standard
throughput lever.  Exact bin packing is NP-hard and inherently
sequential, so production pipelines shard the corpus and pack greedily
within each shard — which is exactly the Spark-friendly shape:

- shard assignment is a map-only hash of the stable id (deterministic,
  partitioning-invariant — the same doc always lands in the same shard);
- within a shard, docs are walked in id order and packed **next-fit**:
  keep a running fill, start a new sequence when the next doc would
  overflow the budget (an over-budget doc gets a sequence of its own);
- per-shard state is one integer pair, and shards are embarrassingly
  parallel — ``applyInPandas`` with ``n_shards`` sized so a shard's
  (id, weight) pairs fit comfortably in one task (the payload text is
  NOT carried through the packing kernel; join it back by id after).

The kernel is deterministic (pure function of the sorted (id, weight)
list), so the DuckDB oracle can replay it with a recursive CTE and match
bit-for-bit.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_next_fit(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    budget: int,
    n_shards: int = 64,
) -> DataFrame:
    """Assign each row to a training sequence: output (id, weight, shard,
    seq_id, seq_offset) where ``seq_id`` is 1-based within the shard and
    ``seq_offset`` is the row's start position inside its sequence.

    ``shard = id % n_shards``; rows are packed next-fit in ascending id
    order within the shard.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(weight_col, T.LongType()),
            T.StructField("shard", T.LongType()),
            T.StructField("seq_id", T.LongType()),
            T.StructField("seq_offset", T.LongType()),
        ]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        seq_ids, offsets = [], []
        seq, fill = 0, budget  # force a new sequence on the first row
        for w in pdf[weight_col].astype("int64"):
            if fill + w > budget:
                seq += 1
                fill = 0
            seq_ids.append(seq)
            offsets.append(fill)
            fill += w
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        pdf["seq_offset"] = pd.Series(offsets, dtype="int64")
        return pdf[[id_col, weight_col, "shard", "seq_id", "seq_offset"]]

    staged = df.select(
        F.col(id_col).cast("long"),
        F.col(weight_col).cast("long"),
        (F.col(id_col) % n_shards).cast("long").alias("shard"),
    )
    # Explicit repartition defeats AQE coalescing, which sizes
    # partitions by shuffle bytes and would merge every (tiny) shard
    # into one partition, serializing the Python packer — the same
    # pathology fixed for the W11 kernel (pipeline/lineups.py).  Hash
    # partitioning maps shard ids to partitions mod hash, so with
    # exactly n_shards partitions ~1/e of them would hold 2+ shards
    # (expected max load ~3 kernels serialized in one task); 2x
    # partitions drops the expected colliding-pair count to n/4 (max
    # load ~2) while the groupBy still reuses the partitioning.  4x was
    # measured (sf0.1, n=5 warm): no tail-latency win over 2x — the
    # collision distribution barely moves — but +37% wall from doubled
    # task-scheduling overhead.
    staged = staged.repartition(n_shards * 2, "shard")
    return staged.groupBy("shard").applyInPandas(_pack, out_schema)


def sequence_stats(packed: DataFrame, weight_col: str) -> DataFrame:
    """Per-sequence roll-up of a :func:`pack_next_fit` result:
    (shard, seq_id, n_docs, seq_tokens) — the padding-efficiency view
    (sum(seq_tokens) / (n_sequences * budget) is the packing ratio)."""
    return packed.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(weight_col).alias("seq_tokens"),
    )
