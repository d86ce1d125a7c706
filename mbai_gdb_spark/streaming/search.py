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
rewritten after), so any probe refuses an incomplete index, and the
replayed batch raises in the applier itself — index bytes without the
completeness side-car mark a crashed merge, and the applier refuses to
take the build() branch over them (the builders write
``mode('overwrite')``, which would silently discard every prior
batch); a crash between an append completing and the marker
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
_CKPT_REF = "_ckpt_ref"


def _index_residue(index_path: str) -> list[str]:
    """Entries under the index path that are INDEX BYTES rather than the
    runner's own bookkeeping (ledger marker, checkpoint ref).  Residue
    with the layout's completeness side-car absent means a build or
    append died mid-flight — NEVER a fresh path.  Distinguishing the
    two is what keeps a replayed batch from taking the build() branch
    over a crashed append: the builders write mode('overwrite'), which
    would silently wipe every prior batch's postings and rebuild the
    index from that one micro-batch."""
    if not os.path.isdir(index_path):
        return []
    return sorted(
        n
        for n in os.listdir(index_path)
        if n not in (_BATCH_MARKER, _CKPT_REF)
    )


def _ledgered_applier(
    index_path: str,
    is_built: Callable[[], bool],
    build: Callable[[DataFrame], None],
    append: Callable[[DataFrame, str], None],
):
    """The shared replay-safe foreachBatch shape: skip recorded batch
    ids, BUILD on the first non-empty batch, APPEND on every later one
    (handing the batch id down as the merge tag), record the id LAST.

    The build branch is taken ONLY when the index path holds no index
    bytes at all (the ledger marker and ``_ckpt_ref`` don't count — an
    empty first batch legitimately writes the marker before any build).
    An index that has bytes but fails ``is_built()`` is a crashed
    build/append replaying: the applier raises loudly instead of
    letting the builder's ``mode('overwrite')`` silently destroy every
    prior batch's data (the incomplete-index refusal the module
    docstring promises)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(index_path, _BATCH_MARKER)
        last = -1
        if os.path.exists(marker):
            with open(marker) as f:
                last = int(f.read().strip() or -1)
        if batch_id <= last:
            return  # replay of an already-merged batch
        if not batch_df.isEmpty():
            if is_built():
                append(batch_df, str(batch_id))
            else:
                residue = _index_residue(index_path)
                if residue:
                    raise RuntimeError(
                        f"streaming index at {index_path} is INCOMPLETE: "
                        f"index bytes exist ({', '.join(residue[:5])}) but "
                        "the layout's completeness side-car is missing — a "
                        "build or append crashed mid-flight.  Refusing to "
                        "rebuild from one micro-batch (that would silently "
                        "discard every prior batch); remove the index "
                        "directory (or restore a previous generation) and "
                        "restart to rebuild."
                    )
                build(batch_df)
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


def _with_compaction_tick(applier, index_path: str, partition_col: str, every: int):
    """Wrap an applier with the self-paying small-files tick: after
    every ``every``-th batch id is recorded, fragmented partition
    directories compact back to one file each
    (``io.compact_partitioned`` — content-preserving, so stream ≡ batch
    stays bit-identical and a replayed tick is a no-op).  Keyed on the
    batch id, not a counter, so replays after a restart re-tick
    harmlessly instead of drifting.  A tick crash leaves loud
    ``_compact_old_*`` residue that both probes and the next tick
    refuse — never a silently partial layout."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        applier(batch_df, batch_id)
        if (batch_id + 1) % every == 0:
            from mbai_gdb_spark.io import compact_partitioned

            compact_partitioned(
                batch_df.sparkSession, index_path, partition_col
            )

    return apply_batch


_GEN_TAG = "_gen_tag"


def _with_lock_patience(fn, patience: float):
    """io.with_lock_patience, late-imported: an index under streaming
    ingest legitimately sees short-lived foreign writers (a takedown, a
    prune, a manual compaction) — without patience the whole drain dies
    with ConcurrentWriteError the instant one lands between batches and
    must be restarted to self-heal."""
    from mbai_gdb_spark.io import with_lock_patience

    return with_lock_patience(fn, patience)


def _write_gen_tag(gen_path: str, batch_id: int) -> None:
    """Record the micro-batch a generation merged, INSIDE the
    generation tree — so the tag publishes atomically with the pointer
    swap.  Written via tmp + os.replace: a clone carries the previous
    tag as a HARDLINK, and an in-place open('w') would truncate through
    the link into the published generation (the byte-immutability
    invariant tests/test_review_r10.py pins)."""
    tmp = os.path.join(gen_path, _GEN_TAG + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(batch_id))
    os.replace(tmp, os.path.join(gen_path, _GEN_TAG))


def _read_gen_tag(gen_path: str) -> str | None:
    p = os.path.join(gen_path, _GEN_TAG)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return f.read().strip() or None


def generation_index_batch_applier(
    root: str,
    build_fn,
    append_fn,
    keep_generations: int | None = 3,
    lock_patience: float = 0.0,
):
    """The generation-managed foreachBatch shape — the SELF-HEALING
    upgrade of :func:`_ledgered_applier`: every micro-batch merge runs
    inside an unpublished hardlink clone (mbai_gdb_spark.indexgen) and
    publishes atomically, so EVERY crash window degrades to serving the
    last published generation and replays simply retry from it:

    - crash mid-build / mid-append → unpublished partial; the replay
      clones the still-healthy current generation and re-merges (the
      bare applier can only refuse loudly here — this one heals);
    - crash between publish and the ledger-marker write → the replayed
      batch's id equals the CURRENT generation's ``_gen_tag`` (written
      inside the tree, so it published atomically with the pointer) and
      the merge is skipped — exactly-once without relying on layout
      duplicate guards.

    ``build_fn(df, path)`` / ``append_fn(df, path)`` write/merge a bare
    layout at ``path``; probes go through the pointer
    (indexgen.bm25_gen_probe / ivfpq_gen_probe).

    ``keep_generations`` bounds history: after each recorded batch,
    generations older than the newest N (and crashed partials) are
    pruned — without it a long drain leaks one full index tree per
    micro-batch.  Keep it ≥ 2 so an in-flight probe's generation
    outlives the batch that superseded it; None disables pruning.

    ``lock_patience`` (seconds, default 0 = fail fast) lets the drain
    WAIT OUT transiently held writer locks — a takedown, prune, or
    compaction landing between batches — instead of dying with
    ConcurrentWriteError and needing a restart to self-heal (see
    :func:`_with_lock_patience`)."""
    from mbai_gdb_spark import indexgen as G

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(root, _BATCH_MARKER)
        last = -1
        if os.path.exists(marker):
            with open(marker) as f:
                last = int(f.read().strip() or -1)
        if batch_id <= last:
            return  # replay of a ledgered batch
        if not batch_df.isEmpty():
            cur = G.current_generation(root)
            if cur is None:
                # First data (or a crashed BUILD replaying: partials are
                # unpublished and numbering skips them).
                _with_lock_patience(
                    lambda: G.generation_build(
                        root,
                        lambda p: (
                            build_fn(batch_df, p),
                            _write_gen_tag(p, batch_id),
                        ),
                    ),
                    lock_patience,
                )
            elif _read_gen_tag(cur) == str(batch_id):
                pass  # published, marker lost: already merged — skip
            else:
                _with_lock_patience(
                    lambda: G.generation_mutate(
                        root,
                        lambda p: (
                            append_fn(batch_df, p),
                            _write_gen_tag(p, batch_id),
                        ),
                    ),
                    lock_patience,
                )
        os.makedirs(root, exist_ok=True)
        with open(marker, "w") as f:  # LAST: fast-path dedup only
            f.write(str(batch_id))
        if keep_generations and G.current_generation_name(root):
            _with_lock_patience(
                lambda: G.prune_generations(root, keep=keep_generations),
                lock_patience,
            )

    return apply_batch


def _read_man_tag(root: str) -> str | None:
    """The ``_gen_tag`` of the CURRENT manifest, read straight from the
    object pool — no view materialization.  The tag file is written
    INSIDE the staging tree by the mutation, so it ingests as an object
    listed in the manifest and publishes atomically with the pointer
    PUT — the exact property the hardlink backend gets from writing
    ``_gen_tag`` inside the generation before the pointer swap."""
    from mbai_gdb_spark import indexman as M

    cur = M.current_manifest_name(root)
    if cur is None:
        return None
    obj = M.read_manifest(root, cur)["files"].get(_GEN_TAG)
    if obj is None:
        return None
    with open(os.path.join(M._objects_dir(root), obj)) as f:
        return f.read().strip() or None


def manifest_index_batch_applier(
    root: str,
    build_fn,
    append_fn,
    keep_manifests: int | None = 3,
    lock_patience: float = 0.0,
):
    """The object-store twin of :func:`generation_index_batch_applier`:
    every micro-batch merge runs against a staging tree materialized
    from the current MANIFEST (mbai_gdb_spark.indexman), only the
    delta's new bytes ingest as immutable objects, and publishing is
    one pointer PUT — so on a real object store (no hardlinks, no
    atomic directory renames) the streaming story keeps the identical
    self-healing contract:

    - crash mid-build / mid-append → a partial staging tree and maybe
      orphan objects, NO new manifest: the pointer serves the previous
      generation and the replayed batch re-merges (orphans are GC'd by
      ``prune_manifests``);
    - crash between the pointer PUT and the ledger-marker write → the
      replayed batch's id equals the current manifest's ``_gen_tag``
      (an object listed IN that manifest, so it published atomically
      with the PUT) and the merge is skipped — exactly-once without
      layout duplicate guards.

    The tag file is (re)written inside the staging tree via
    tmp + ``os.replace`` — the staged previous tag is a HARDLINK into
    the immutable object pool, and an in-place ``open('w')`` would
    truncate through the link into published bytes (the same invariant
    :func:`_write_gen_tag` defends for hardlink generations).

    ``keep_manifests`` bounds history: after each recorded batch,
    manifests older than the newest N retire and unreferenced pool
    objects are garbage-collected (liveness-gated; see
    ``indexman.prune_manifests``).  Keep it ≥ 2 so an in-flight probe's
    view outlives the batch that superseded it; None disables pruning.

    ``lock_patience`` (seconds, default 0 = fail fast) waits out
    transiently held writer locks exactly as in the generation applier
    (see :func:`_with_lock_patience`).

    Appends run through :func:`indexman.manifest_mutate_cached` with a
    drain-scoped :class:`indexman.MutateWorkspace` (r13 verdict ask
    #4): the materialized staging tree persists between micro-batches
    and each batch re-ingests only its delta — O(delta) link/stat work
    per batch instead of two O(#files) passes.  The workspace is a
    pure cache (staleness → fresh materialize, never wrong bytes); the
    returned callable carries a ``close()`` that drops the tree when
    the drain finishes (``_run_available_now`` calls it), so a
    finished drain's workspace never pins another process's prune
    liveness gates."""
    from mbai_gdb_spark import indexman as M

    ws = M.MutateWorkspace(root)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(root, _BATCH_MARKER)
        last = -1
        if os.path.exists(marker):
            with open(marker) as f:
                last = int(f.read().strip() or -1)
        if batch_id <= last:
            return  # replay of a ledgered batch
        if not batch_df.isEmpty():
            cur = M.current_manifest_name(root)
            if cur is None:
                # First data (or a crashed BUILD replaying: partials
                # never published; object names are never reused).
                _with_lock_patience(
                    lambda: M.manifest_build(
                        root,
                        lambda p: (
                            build_fn(batch_df, p),
                            _write_gen_tag(p, batch_id),
                        ),
                    ),
                    lock_patience,
                )
            elif _read_man_tag(root) == str(batch_id):
                pass  # published, marker lost: already merged — skip
            else:
                _with_lock_patience(
                    lambda: M.manifest_mutate_cached(
                        root,
                        lambda p: (
                            append_fn(batch_df, p),
                            _write_gen_tag(p, batch_id),
                        ),
                        ws,
                    ),
                    lock_patience,
                )
        os.makedirs(root, exist_ok=True)
        with open(marker, "w") as f:  # LAST: fast-path dedup only
            f.write(str(batch_id))
        if keep_manifests and M.current_manifest_name(root):
            _with_lock_patience(
                lambda: M.prune_manifests(root, keep=keep_manifests),
                lock_patience,
            )

    apply_batch.close = ws.close
    return apply_batch


def _with_man_compaction_tick(
    applier,
    root: str,
    partition_col: str,
    every: int,
    lock_patience: float = 0.0,
):
    """The manifest flavor of :func:`_with_gen_compaction_tick`: the
    tick is ``indexman.man_compact``, so compaction publishes as a new
    manifest with NO probe-visible window; its no-op pre-check reads
    the manifest listing (one small JSON), not the filesystem.  The
    compacted manifest REUSES the previous ``_gen_tag`` object (the
    staged tag is an untouched hardlink), so a post-compaction replay
    of the same batch id still skips via the tag.  ``lock_patience``
    covers the tick itself (advice r13): the tick's ``man_compact``
    takes the same writer lock as the batch applier, so a takedown or
    prune landing exactly on a tick would otherwise kill a patient
    drain with ConcurrentWriteError."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        applier(batch_df, batch_id)
        if (batch_id + 1) % every == 0:
            from mbai_gdb_spark import indexman as M

            if M.current_manifest_name(root) is not None:
                _with_lock_patience(
                    lambda: M.man_compact(
                        batch_df.sparkSession, root, partition_col
                    ),
                    lock_patience,
                )

    # forward the wrapped applier's workspace cleanup to the runner
    apply_batch.close = getattr(applier, "close", lambda: None)
    return apply_batch


def run_streaming_bm25_manifests_available_now(
    spark,
    source_dir: str,
    schema,
    root: str,
    n_buckets: int = 64,
    positions: bool = False,
    max_files_per_trigger: int = 1,
    checkpoint: str | None = None,
    compact_every: int | None = None,
    keep_manifests: int | None = 3,
    lock_patience: float = 0.0,
) -> None:
    """The object-store twin of
    :func:`run_streaming_bm25_generations_available_now`: each
    micro-batch publishes a complete manifest generation via one
    pointer PUT; probe with ``indexman.bm25_man_probe``.  Same
    checkpoint-lineage contract, same exactly-once tag mechanism, same
    stream ≡ batch bit-identity (tests/test_streaming_manifests.py)."""
    from mbai_gdb_spark.ops.text import bm25_index_append, bm25_index_persist

    applier = manifest_index_batch_applier(
        root,
        build_fn=lambda df, p: bm25_index_persist(
            df, p, n_buckets=n_buckets, positions=positions
        ),
        append_fn=lambda df, p: bm25_index_append(df, p),
        keep_manifests=keep_manifests,
        lock_patience=lock_patience,
    )
    if compact_every:
        applier = _with_man_compaction_tick(
            applier, root, "bucket", compact_every, lock_patience
        )
    _run_available_now(
        spark, source_dir, schema, root, applier, max_files_per_trigger, checkpoint
    )


def run_streaming_ivfpq_manifests_available_now(
    spark,
    source_dir: str,
    schema,
    root: str,
    centroid_stride: int = 50,
    code_stride: int = 7,
    vectorized: bool = True,
    max_files_per_trigger: int = 1,
    checkpoint: str | None = None,
    compact_every: int | None = None,
    keep_manifests: int | None = 3,
    lock_patience: float = 0.0,
) -> None:
    """Manifest-backed IVF-PQ streaming ingest: the first non-empty
    batch bootstraps the frozen quantizers as manifest 1; every later
    batch publishes a pure-insert manifest.  Probe with
    ``indexman.ivfpq_man_probe``."""
    from mbai_gdb_spark.ops.similarity import ivfpq_append, ivfpq_persist

    applier = manifest_index_batch_applier(
        root,
        build_fn=lambda df, p: ivfpq_persist(
            df,
            p,
            centroid_stride=centroid_stride,
            code_stride=code_stride,
            vectorized=vectorized,
        ),
        append_fn=lambda df, p: ivfpq_append(df, p, vectorized=vectorized),
        keep_manifests=keep_manifests,
        lock_patience=lock_patience,
    )
    if compact_every:
        applier = _with_man_compaction_tick(
            applier, root, "centroid_id", compact_every, lock_patience
        )
    _run_available_now(
        spark, source_dir, schema, root, applier, max_files_per_trigger, checkpoint
    )


def run_streaming_lsh_manifests_available_now(
    spark,
    source_dir: str,
    schema,
    root: str,
    bucketer,
    n_buckets: int = 32,
    max_files_per_trigger: int = 1,
    checkpoint: str | None = None,
    compact_every: int | None = None,
    keep_manifests: int | None = 3,
    lock_patience: float = 0.0,
) -> None:
    """Manifest-backed streaming ingest for the bucketed LSH near-dup
    index; same ``bucketer`` contract as the generation runner.  Probe
    with ``indexman.lsh_man_probe``."""
    from mbai_gdb_spark.ops.dedup import (
        lsh_index_append_bucketed,
        lsh_index_persist_bucketed,
    )

    applier = manifest_index_batch_applier(
        root,
        build_fn=lambda df, p: lsh_index_persist_bucketed(
            bucketer(df), p, n_buckets=n_buckets
        ),
        append_fn=lambda df, p: lsh_index_append_bucketed(bucketer(df), p),
        keep_manifests=keep_manifests,
        lock_patience=lock_patience,
    )
    if compact_every:
        applier = _with_man_compaction_tick(
            applier, root, "pbkt", compact_every, lock_patience
        )
    _run_available_now(
        spark, source_dir, schema, root, applier, max_files_per_trigger, checkpoint
    )


def run_streaming_bm25_generations_available_now(
    spark,
    source_dir: str,
    schema,
    root: str,
    n_buckets: int = 64,
    positions: bool = False,
    max_files_per_trigger: int = 1,
    checkpoint: str | None = None,
    compact_every: int | None = None,
    keep_generations: int | None = 3,
    lock_patience: float = 0.0,
) -> None:
    """The generation-managed twin of
    :func:`run_streaming_bm25_index_available_now`: each micro-batch
    publishes a complete generation, probes
    (indexgen.bm25_gen_probe / bm25_gen_phrase_probe) always see a
    complete index, and a mid-merge crash costs NOTHING but the batch's
    retry — restart the drain and it heals from the last published
    generation.  ``compact_every=N`` runs gen_compact (windowless
    compaction) after every Nth recorded batch; ``keep_generations``
    prunes history so a long drain doesn't leak one tree per batch."""
    from mbai_gdb_spark.ops.text import bm25_index_append, bm25_index_persist

    applier = generation_index_batch_applier(
        root,
        build_fn=lambda df, p: bm25_index_persist(
            df, p, n_buckets=n_buckets, positions=positions
        ),
        # No layout-level tag: _gen_tag is the one replay mechanism.
        append_fn=lambda df, p: bm25_index_append(df, p),
        keep_generations=keep_generations,
        lock_patience=lock_patience,
    )
    if compact_every:
        applier = _with_gen_compaction_tick(
            applier, root, "bucket", compact_every, lock_patience
        )
    _run_available_now(
        spark, source_dir, schema, root, applier, max_files_per_trigger, checkpoint
    )


def run_streaming_ivfpq_generations_available_now(
    spark,
    source_dir: str,
    schema,
    root: str,
    centroid_stride: int = 50,
    code_stride: int = 7,
    vectorized: bool = True,
    max_files_per_trigger: int = 1,
    checkpoint: str | None = None,
    compact_every: int | None = None,
    keep_generations: int | None = 3,
    lock_patience: float = 0.0,
) -> None:
    """Generation-managed IVF-PQ streaming ingest: the first non-empty
    batch bootstraps the frozen quantizers as generation 1; every later
    batch publishes a pure-insert generation.  Crash anywhere = serve
    the previous generation, retry heals — including the
    publish-before-marker window the bare runner can only surface as a
    duplicate-vec_id refusal (the ``_gen_tag`` skip covers it here).
    ``keep_generations`` bounds history exactly as in the BM25 twin."""
    from mbai_gdb_spark.ops.similarity import ivfpq_append, ivfpq_persist

    applier = generation_index_batch_applier(
        root,
        build_fn=lambda df, p: ivfpq_persist(
            df,
            p,
            centroid_stride=centroid_stride,
            code_stride=code_stride,
            vectorized=vectorized,
        ),
        append_fn=lambda df, p: ivfpq_append(df, p, vectorized=vectorized),
        keep_generations=keep_generations,
        lock_patience=lock_patience,
    )
    if compact_every:
        applier = _with_gen_compaction_tick(
            applier, root, "centroid_id", compact_every, lock_patience
        )
    _run_available_now(
        spark, source_dir, schema, root, applier, max_files_per_trigger, checkpoint
    )


def _with_gen_compaction_tick(
    applier,
    root: str,
    partition_col: str,
    every: int,
    lock_patience: float = 0.0,
):
    """The generation flavor of :func:`_with_compaction_tick`: the tick
    is indexgen.gen_compact, so compaction has NO probe-visible window
    and a crashed tick is just an unpublished clone (the next tick
    re-runs it; nothing to refuse).  ``lock_patience`` covers the tick
    itself (advice r13) — same rationale as
    :func:`_with_man_compaction_tick`."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        applier(batch_df, batch_id)
        if (batch_id + 1) % every == 0:
            from mbai_gdb_spark import indexgen as G

            if G.current_generation(root) is not None:
                _with_lock_patience(
                    lambda: G.gen_compact(
                        batch_df.sparkSession, root, partition_col
                    ),
                    lock_patience,
                )

    # forward the wrapped applier's workspace cleanup to the runner
    apply_batch.close = getattr(applier, "close", lambda: None)
    return apply_batch


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
    ref = os.path.join(index_path, _CKPT_REF)
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
    try:
        q = (
            stream.writeStream.foreachBatch(applier)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
    finally:
        # Drop the manifest applier's mutate workspace (if any): a
        # finished drain's tree must not keep pinning other processes'
        # prune liveness gates (live own-pid staging defers GC).
        getattr(applier, "close", lambda: None)()
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
    compact_every: int | None = None,
) -> None:
    """Drain a parquet document feed file-by-file into the persisted
    BM25 index; returns once the feed is exhausted.  Probe the result
    with :func:`mbai_gdb_spark.ops.text.bm25_probe_persisted` — the
    identical serving path the batch build uses.

    ``compact_every=N`` pays the small-files debt down as the stream
    runs: after every Nth batch, fragmented bucket directories merge
    back to one file each (content-preserving — probes and the
    stream ≡ batch guarantee are unaffected; what changes is files
    opened per probed directory, O(appends-since-compaction) → 1).

    Raises if the index was previously driven from a DIFFERENT
    checkpoint: batch ids are per-checkpoint, so the ledger would
    misfire (see the module docstring).  Drive one index from one
    checkpoint lineage; a lost checkpoint means a rebuild."""
    applier = index_batch_applier(index_path, n_buckets)
    if compact_every:
        applier = _with_compaction_tick(
            applier, index_path, "bucket", compact_every
        )
    _run_available_now(
        spark,
        source_dir,
        schema,
        index_path,
        applier,
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
    compact_every: int | None = None,
) -> None:
    """Drain a parquet vector feed file-by-file into the persisted
    residual IVF-PQ index; probe with
    :func:`mbai_gdb_spark.ops.similarity.ivfpq_probe_persisted`.  The
    first file is the bootstrap corpus (it fixes the frozen
    quantizers); the result is bit-identical to
    ``ivfpq_persist(first file) + ivfpq_append(rest)`` in one batch —
    by the append's associativity, across ANY micro-batch split of the
    rest.  Same checkpoint-lineage contract as the BM25 runner;
    ``compact_every`` is the same self-paying small-files tick."""
    applier = vector_index_batch_applier(
        index_path, centroid_stride, code_stride, vectorized
    )
    if compact_every:
        applier = _with_compaction_tick(
            applier, index_path, "centroid_id", compact_every
        )
    _run_available_now(
        spark,
        source_dir,
        schema,
        index_path,
        applier,
        max_files_per_trigger,
        checkpoint,
    )


def run_streaming_lsh_generations_available_now(
    spark,
    source_dir: str,
    schema,
    root: str,
    bucketer,
    n_buckets: int = 32,
    max_files_per_trigger: int = 1,
    checkpoint: str | None = None,
    compact_every: int | None = None,
    keep_generations: int | None = 3,
    lock_patience: float = 0.0,
) -> None:
    """Generation-managed streaming ingest for the bucketed LSH
    near-dup index (the round-11 layout): the first non-empty batch
    publishes generation 1 (pinning the banding scheme in ``_meta``);
    every later batch is a pure O(delta) insert published as a new
    generation.  Crash anywhere = serve the previous generation, retry
    heals — the same ``_gen_tag`` exactly-once contract as the BM25 and
    IVF-PQ twins, including the publish-before-marker window.

    ``bucketer(docs_batch) -> (id, band, bucket)`` maps the streamed
    document batch to its banding (e.g. the minhash pipeline of
    queries_north._doc_lsh_buckets) — kept a parameter because banding
    choices (n_hashes, rows_per_band, tokenization) are corpus policy,
    while this runner owns only the lifecycle.  A batch whose every
    document tokenizes to nothing appends as an empty delta (no-op);
    if the FIRST batch is all-token-less the build refuses loudly
    (an empty build pins no banding scheme — same guard as the bare
    layout).  ``compact_every=N`` runs the windowless gen_compact over
    the ``pbkt`` directories after every Nth recorded batch."""
    from mbai_gdb_spark.ops.dedup import (
        lsh_index_append_bucketed,
        lsh_index_persist_bucketed,
    )

    applier = generation_index_batch_applier(
        root,
        build_fn=lambda df, p: lsh_index_persist_bucketed(
            bucketer(df), p, n_buckets=n_buckets
        ),
        append_fn=lambda df, p: lsh_index_append_bucketed(bucketer(df), p),
        keep_generations=keep_generations,
        lock_patience=lock_patience,
    )
    if compact_every:
        applier = _with_gen_compaction_tick(
            applier, root, "pbkt", compact_every, lock_patience
        )
    _run_available_now(
        spark, source_dir, schema, root, applier, max_files_per_trigger, checkpoint
    )
