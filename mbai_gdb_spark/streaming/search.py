"""Streaming BM25 index maintenance: foreachBatch → bm25_index_append.

The streaming twin of the persisted BM25 inverted index
(ops.text.bm25_index_persist / bm25_index_append): an unbounded
document feed drains micro-batch by micro-batch into the term-bucket-
partitioned layout, so the SERVING artifact — partition-pruned probes,
engine-exact integer scores — is byte-for-byte the same one a batch
build over the drained corpus produces (stream ≡ batch pinned in
tests/test_streaming_search.py, the program's standard).

Why INDEX MAINTENANCE is the streaming answer for ranked retrieval,
rather than a stateful in-memory top-k twin: BM25 scores are GLOBAL
functions of the corpus — every arriving document moves df for its
terms, N, and avgdl, which retroactively changes the score of every
existing (query, doc) pair sharing a term.  A streaming top-k would
therefore have to retract and re-emit unboundedly many past results
per batch (no append-mode plan exists; update mode would re-emit
whole result sets), while the index absorbs the same global shift by
rewriting only the |delta-term| buckets and two `_meta` scalars.
Freshness-vs-cost is then a TRIGGER knob, which is exactly how
production search tiers work (micro-batched segment publishing).

Exactly-once: foreachBatch may replay a batch after a failure, and
``bm25_index_append`` is NOT idempotent (tf/df would double-count), so
each applied batch id is recorded in an ``_applied_batch`` side-car
(written LAST) and replays of recorded batches are skipped.  The two
crash windows both fail LOUDLY rather than silently corrupting
postings: a crash inside the append leaves the index without ``_meta``
(the append removes it before the bucket swaps and rewrites it after),
so the replayed batch's merge — and any probe — refuses an incomplete
index; a crash between the append completing and the marker write
makes the replay trip the append's duplicate-doc_id guard.  Recover
from either by rebuilding (or restoring the previous generation).  A
production deployment would close both windows by versioning whole
index generations behind an atomically-swapped manifest pointer, the
same upgrade path the append docstring names.

The batch-id ledger is scoped to ONE checkpoint lineage: Structured
Streaming numbers batches per checkpointLocation, so replaying the
marker against a different checkpoint would silently skip real data
(new files renumbered into already-recorded ids).  The runner
therefore records its checkpoint in a ``_ckpt_ref`` side-car on
successful completion and REFUSES to drive the same index from a
different checkpoint.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from mbai_gdb_spark.ops.text import bm25_index_append, bm25_index_persist

_BATCH_MARKER = "_applied_batch"


def index_batch_applier(index_path: str, n_buckets: int = 64):
    """The foreachBatch callable: first non-empty batch BUILDS the
    index, every later one APPENDS; recorded batch ids are skipped on
    replay.  Exposed (rather than closed over inside the runner) so
    tests can drive replay/crash scenarios directly."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(index_path, _BATCH_MARKER)
        last = -1
        if os.path.exists(marker):
            with open(marker) as f:
                last = int(f.read().strip() or -1)
        if batch_id <= last:
            return  # replay of an already-merged batch
        # Row-empty batches merge trivially (no N/T contribution).  A
        # non-empty batch whose docs all tokenize to nothing still
        # BUILDS correctly: the builder stores the true total_toks (0)
        # and the append tolerates a bucket-less index.
        if not batch_df.isEmpty():
            if not os.path.isdir(os.path.join(index_path, "_meta")):
                bm25_index_persist(batch_df, index_path, n_buckets=n_buckets)
            else:
                bm25_index_append(batch_df, index_path)
        os.makedirs(index_path, exist_ok=True)
        with open(marker, "w") as f:  # LAST: presence marks the merge
            f.write(str(batch_id))

    return apply_batch


def run_streaming_bm25_index_available_now(
    spark,
    source_dir: str,
    schema,
    index_path: str,
    n_buckets: int = 64,
    max_files_per_trigger: int = 1,
    checkpoint: str | None = None,
) -> None:
    """Drain a parquet document feed file-by-file into the persisted
    BM25 index; returns once the feed is exhausted.  Probe the result
    with :func:`mbai_gdb_spark.ops.text.bm25_probe_persisted` — the
    identical serving path the batch build uses.

    Raises if the index was previously driven from a DIFFERENT
    checkpoint: batch ids are per-checkpoint, so the ledger would
    misfire (see the module docstring).  Drive one index from one
    checkpoint lineage; a lost checkpoint means a rebuild."""
    ckpt = checkpoint or index_path + "__ckpt"
    ref = os.path.join(index_path, "_ckpt_ref")
    if os.path.exists(ref):
        with open(ref) as f:
            prior = f.read().strip()
        if prior != os.path.abspath(ckpt):
            raise ValueError(
                f"streaming bm25 index at {index_path} was built from "
                f"checkpoint {prior}; refusing to continue it from "
                f"{os.path.abspath(ckpt)} — batch ids are per-checkpoint "
                "(rebuild the index to switch checkpoints)"
            )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    q = (
        stream.writeStream.foreachBatch(index_batch_applier(index_path, n_buckets))
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    # Recorded on success only (the first batch's overwrite-build wipes
    # the dir, so writing it before the run would not survive anyway).
    os.makedirs(index_path, exist_ok=True)
    with open(ref, "w") as f:
        f.write(os.path.abspath(ckpt))
