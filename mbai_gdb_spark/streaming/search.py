"""Streaming index maintenance: foreachBatch → incremental append.

The streaming twins of the two persisted index layouts: an unbounded
document feed drains micro-batch by micro-batch into the term-bucket-
partitioned BM25 layout (ops.text.bm25_index_persist /
bm25_index_append), and an unbounded vector feed into the residual
IVF-PQ layout (ops.similarity.ivfpq_persist / ivfpq_append) — so the
SERVING artifact (partition-pruned probes, engine-exact scores) is
byte-for-byte the same one a batch build-then-append over the drained
feed produces (stream ≡ batch pinned in
tests/test_streaming_search.py, the program's standard).

Why INDEX MAINTENANCE is the streaming answer for ranked retrieval,
rather than a stateful in-memory top-k twin: BM25 scores are GLOBAL
functions of the corpus — every arriving document moves df for its
terms, N, and avgdl, which retroactively changes the score of every
existing (query, doc) pair sharing a term.  A streaming top-k would
therefore have to retract and re-emit unboundedly many past results
per batch (no append-mode plan exists; update mode would re-emit
whole result sets), while the index absorbs the same global shift with ONE delta-sized
insert and two `_meta` scalars (df is not stored at all — the probe
recounts it from the postings it reads anyway).
Freshness-vs-cost is then a TRIGGER knob, which is exactly how
production search tiers work (micro-batched segment publishing).  The
IVF-PQ feed is even simpler: PQ codes carry no corpus-global
statistics, so each micro-batch is a pure partition-local insert under
the bootstrap batch's frozen quantizers — the standard vector-database
ingestion model (train once, insert forever, re-train offline).

Exactly-once: foreachBatch may replay a batch after a failure, and
the appends are NOT idempotent, so each applied batch id is recorded
in an ``_applied_batch`` side-car (written LAST) and replays of
recorded batches are skipped.  The crash windows fail LOUDLY rather
than silently corrupting the index: a crash inside the BM25 append
leaves the index without ``_meta`` (removed before the delta insert,
rewritten after), so the replayed merge — and any probe — refuses an
incomplete index; a crash between an append completing and the marker
write makes the replay a no-op for BM25 (the micro-batch id is stored
INSIDE ``_meta``, atomically with the corpus scalars — covering even
token-less deltas, which have no postings for a duplicate guard to
collide on) and trips the duplicate-vec_id guard for IVF-PQ (every
vector batch writes code rows).
Recover by rebuilding (or restoring the previous generation).  A
production deployment would close the windows by versioning whole
index generations behind an atomically-swapped manifest pointer, the
same upgrade path the append docstrings name.

The batch-id ledger is scoped to ONE checkpoint lineage: Structured
Streaming numbers batches per checkpointLocation, so replaying the
marker against a different checkpoint would silently skip real data
(new files renumbered into already-recorded ids).  The runners
therefore record their checkpoint in a ``_ckpt_ref`` side-car on
successful completion and REFUSE to drive the same index from a
different checkpoint.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame

from mbai_gdb_spark.ops.similarity import ivfpq_append, ivfpq_persist
from mbai_gdb_spark.ops.text import bm25_index_append, bm25_index_persist

_BATCH_MARKER = "_applied_batch"


def _ledgered_applier(
    index_path: str,
    is_built: Callable[[], bool],
    build: Callable[[DataFrame], None],
    append: Callable[[DataFrame, str], None],
):
    """The shared replay-safe foreachBatch shape: skip recorded batch
    ids, BUILD on the first non-empty batch, APPEND on every later one
    (handing the batch id down as the merge tag), record the id LAST."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(index_path, _BATCH_MARKER)
        last = -1
        if os.path.exists(marker):
            with open(marker) as f:
                last = int(f.read().strip() or -1)
        if batch_id <= last:
            return  # replay of an already-merged batch
        if not batch_df.isEmpty():
            if not is_built():
                build(batch_df)
            else:
                append(batch_df, str(batch_id))
        os.makedirs(index_path, exist_ok=True)
        with open(marker, "w") as f:  # LAST: presence marks the merge
            f.write(str(batch_id))

    return apply_batch


def index_batch_applier(index_path: str, n_buckets: int = 64):
    """BM25 foreachBatch callable.  Row-empty batches merge trivially
    (no N/T contribution); a non-empty batch whose docs all tokenize
    to nothing still BUILDS correctly (the builder stores the true
    total_toks and the append tolerates a bucket-less index).  Exposed
    (rather than closed over inside the runner) so tests can drive
    replay/crash scenarios directly."""
    return _ledgered_applier(
        index_path,
        is_built=lambda: os.path.isdir(os.path.join(index_path, "_meta")),
        build=lambda df: bm25_index_persist(df, index_path, n_buckets=n_buckets),
        # The batch id rides into _meta as the merge tag, so a replay
        # is idempotent even for a token-less delta (no postings for
        # the duplicate guard to collide on).
        append=lambda df, t: bm25_index_append(df, index_path, tag=t),
    )


def vector_index_batch_applier(
    index_path: str,
    centroid_stride: int = 50,
    code_stride: int = 7,
    vectorized: bool = True,
):
    """IVF-PQ foreachBatch callable: the FIRST non-empty batch is the
    bootstrap corpus — its stride-sampled centroids and codebook become
    the index's frozen quantizers — and every later batch inserts under
    them (geometry derived from the ``_codebook`` side-car).  This is
    the production vector-ingestion model; recall depends on the
    bootstrap being representative, exactly as it depends on the
    training sample in a batch-built index."""
    return _ledgered_applier(
        index_path,
        is_built=lambda: os.path.isdir(os.path.join(index_path, "_codebook")),
        build=lambda df: ivfpq_persist(
            df,
            index_path,
            centroid_stride=centroid_stride,
            code_stride=code_stride,
            vectorized=vectorized,
        ),
        # ivfpq has no _meta to tag; every vector batch writes code
        # rows, so the duplicate-vec_id guard covers replays.
        append=lambda df, _t: ivfpq_append(df, index_path, vectorized=vectorized),
    )


def _run_available_now(
    spark,
    source_dir: str,
    schema,
    index_path: str,
    applier,
    max_files_per_trigger: int,
    checkpoint: str | None,
) -> None:
    """Shared runner: checkpoint-lineage guard, file-by-file drain,
    ``_ckpt_ref`` recorded on success."""
    ckpt = checkpoint or index_path + "__ckpt"
    ref = os.path.join(index_path, "_ckpt_ref")
    if os.path.exists(ref):
        with open(ref) as f:
            prior = f.read().strip()
        if prior != os.path.abspath(ckpt):
            raise ValueError(
                f"streaming index at {index_path} was built from "
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
        stream.writeStream.foreachBatch(applier)
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
    _run_available_now(
        spark,
        source_dir,
        schema,
        index_path,
        index_batch_applier(index_path, n_buckets),
        max_files_per_trigger,
        checkpoint,
    )


def run_streaming_ivfpq_index_available_now(
    spark,
    source_dir: str,
    schema,
    index_path: str,
    centroid_stride: int = 50,
    code_stride: int = 7,
    vectorized: bool = True,
    max_files_per_trigger: int = 1,
    checkpoint: str | None = None,
) -> None:
    """Drain a parquet vector feed file-by-file into the persisted
    residual IVF-PQ index; probe with
    :func:`mbai_gdb_spark.ops.similarity.ivfpq_probe_persisted`.  The
    first file is the bootstrap corpus (it fixes the frozen
    quantizers); the result is bit-identical to
    ``ivfpq_persist(first file) + ivfpq_append(rest)`` in one batch —
    by the append's associativity, across ANY micro-batch split of the
    rest.  Same checkpoint-lineage contract as the BM25 runner."""
    _run_available_now(
        spark,
        source_dir,
        schema,
        index_path,
        vector_index_batch_applier(
            index_path, centroid_stride, code_stride, vectorized
        ),
        max_files_per_trigger,
        checkpoint,
    )
