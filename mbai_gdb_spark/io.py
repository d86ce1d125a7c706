"""Sources and sinks.

The reference ingests from a REST API and writes to a graph store over
Bolt (reference: src/manager.py:26-52, src/fetcher.py:16-115).  Here the
sources are parquet datasets and the sinks are parquet directories; the
reference's MERGE-by-unique-id write semantics (src/queries/setup.py:1-34)
become :func:`write_insert_if_absent`.

MERGE at 100 TB — the deployment story for the S7 sink
------------------------------------------------------

:func:`merge_upsert` implements upsert over plain parquet via a
staging write + rename-aside swap.  On a POSIX filesystem the two
``os.replace`` calls are each atomic, so a crash leaves either the old
or the new dataset intact — but the pair is NOT atomic together, and
on an object store (S3/GCS) "rename" is copy+delete: concurrent
readers can observe a missing or half-copied prefix during the swap,
and the full-dataset rewrite is O(table) per batch.  The production
equivalent is a table format with transactional metadata:

- Delta Lake / Apache Iceberg ``MERGE INTO target USING batch ON
  key-equality WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`` — same
  semantics as :func:`merge_upsert`, but committed as an atomic
  snapshot (readers see old or new, never between), touching only the
  files whose rows matched, with the same shuffle shape underneath
  (an equi-join of batch against target on the key).
- :func:`write_insert_if_absent` maps to the ``WHEN NOT MATCHED
  INSERT``-only form.

Neither format ships in this container, so the parquet fallback is
what the fixtures exercise (SURVEY §4.3 allows exactly this); the
operator surface, key semantics, and idempotence oracle
(``io_merge_idempotent``) carry over to the lakehouse path unchanged.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from mbai_gdb_spark.ops.lineage import truncate as _ckpt

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns stored as parquet TIMESTAMP(NANOS) — Spark can only read them as
# long nanoseconds (spark.sql.legacy.parquet.nanosAsLong); we convert to
# microsecond TIMESTAMP_NTZ, truncating exactly like DuckDB's parquet
# reader does, so oracle comparisons are bit-identical.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table.  Column pruning / predicate pushdown happen
    downstream via Catalyst — do NOT cache or collect here."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_TS_COLS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(
                col,
                F.timestamp_micros(F.expr(f"`{col}` div 1000")).cast("timestamp_ntz"),
            )
    return df


def read_sidecar_row(path: str) -> dict:
    """One-row metadata side-car (``_meta``, index scalars) read
    DRIVER-SIDE via pyarrow — no Spark job.  A probe previously paid a
    whole scheduled job (scan + collect, ~100-300 ms of the serving
    latency) to fetch a handful of bounded scalars; the side-car is by
    construction a single coalesce(1) parquet of one row, i.e. exactly
    the "bounded artifact like a PQ codebook" class the 100 TB rules
    allow on the driver (r14, guide §7.3 — cut driver round-trips per
    probe).  Returns a plain dict keyed like the Row the Spark read
    produced; pyarrow ignores ``_SUCCESS``/dot files on its own."""
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    row = t.to_pylist()
    if not row:
        raise ValueError(f"empty metadata side-car at {path}")
    return row[0]


def read_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in (names or FIXTURE_TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views for spark.sql use."""
    for n, df in read_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)


class ConcurrentWriteError(RuntimeError):
    """Another writer holds the dataset's merge lock."""


def with_lock_patience(fn, patience: float):
    """Run a mutation, waiting out a TRANSIENTLY held writer lock.

    :func:`_writer_lock` fails FAST by design — correct for two
    uncoordinated writers, but coordinated short-lived contention is
    legitimate: a streaming drain vs an interleaved takedown/prune, or
    a takedown vs the drain's own batch merges.  With ``patience`` > 0
    the loser of the race polls every 50 ms (bounded by ``patience``
    seconds) instead of dying; exclusion is untouched — at no instant
    do two writers mutate.  ``patience <= 0`` is a plain call."""
    if patience <= 0:
        return fn()
    deadline = time.monotonic() + patience
    while True:
        try:
            return fn()
        except ConcurrentWriteError:
            if time.monotonic() >= deadline:
                raise
            time.sleep(0.05)


@contextmanager
def _writer_lock(path: str, stale_after: float | None = 3600.0):
    """Single-writer guard for the read-modify-write sinks.

    The MERGE sinks below read the dataset and then rewrite/append it;
    two interleaved writers would base their merge on the same snapshot
    and one's rows would vanish (lost update).  Protocol: an intent
    marker ``<path>__lock`` created with O_CREAT|O_EXCL — atomic on
    local/POSIX filesystems — holding an OWNERSHIP TOKEN plus pid and
    timestamp.  A second writer fails FAST with
    :class:`ConcurrentWriteError` rather than queueing (batch
    pipelines should serialize at the orchestrator; silent waiting
    hides scheduling bugs).

    A lock older than ``stale_after`` seconds is presumed crashed and
    taken over by atomically RENAMING it aside (exactly one contender
    wins the rename) before creating a fresh lock.  Release verifies
    the token, so a writer that overran ``stale_after`` and lost its
    lock to a takeover cannot delete the new holder's lock on exit —
    size ``stale_after`` above the worst-case merge duration.

    Local-filesystem semantics only: O_EXCL/rename atomicity does not
    hold on some network mounts, and object stores need a lakehouse
    format (Delta/Iceberg MERGE with optimistic commit) — same caveat
    as the rename-aside swap itself.
    """
    import uuid

    lock = path.rstrip("/") + "__lock"
    token = uuid.uuid4().hex
    os.makedirs(os.path.dirname(os.path.abspath(lock)) or ".", exist_ok=True)

    def acquire():
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.write(fd, f"token={token} pid={os.getpid()} ts={time.time()}\n".encode())
        os.close(fd)

    try:
        acquire()
    except FileExistsError:
        try:
            age = time.time() - os.path.getmtime(lock)
        except OSError:
            age = 0.0  # raced with the holder's release — treat as live
        if stale_after is not None and age > stale_after:
            # Atomic takeover: exactly one contender wins the rename.
            try:
                os.replace(lock, lock + f".broken.{token}")
                os.unlink(lock + f".broken.{token}")
            except FileNotFoundError:
                pass  # someone else already took it over / released
            try:
                acquire()
            except FileExistsError:
                raise ConcurrentWriteError(
                    f"dataset {path!r} lock was re-acquired by a "
                    "concurrent writer while breaking a stale lock"
                ) from None
        else:
            raise ConcurrentWriteError(
                f"dataset {path!r} is locked by another writer ({lock}); "
                "serialize writers, or remove the lock file if its holder "
                "crashed less than stale_after ago"
            )
    try:
        yield
    finally:
        # Release ONLY if we still own it (a takeover after overrunning
        # stale_after means the lock now belongs to someone else).
        try:
            with open(lock, "rb") as f:
                owned = f.read().startswith(f"token={token} ".encode())
            if owned:
                os.unlink(lock)
        except (FileNotFoundError, OSError):
            pass


def write_insert_if_absent(
    df: DataFrame, path: str, key_cols: list[str], spark: SparkSession
) -> None:
    """Insert-only upsert: append rows whose key is not already present.

    Re-expresses the reference's idempotent ``MERGE (n {id}) ON CREATE SET``
    writes (e.g. reference src/queries/game.py:86-94) without Delta: an
    anti-join against existing keys, then append.  The anti-join is a
    broadcast when the existing key set is small; at scale prefer a real
    lakehouse MERGE (Delta/Iceberg) — this helper keeps identical semantics.
    Single-writer per dataset, enforced by :func:`_writer_lock` (the
    read-then-append is a lost-update race under two writers).
    """
    with _writer_lock(path):
        batch = df.dropDuplicates(key_cols)
        if _path_has_data(path):
            existing = spark.read.parquet(path).select(*key_cols)
            batch = batch.join(existing, on=key_cols, how="left_anti")
        batch.write.mode("append").parquet(path)


def _path_has_data(path: str) -> bool:
    """True if the dataset dir holds any parquet file — including under
    partition subdirectories (day=.../part-*.parquet)."""
    if not os.path.isdir(path):
        return False
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned (and optionally sorted-within-partition) parquet
    layout — the engine's replacement for the reference's secondary
    range indexes (setup.py:20-33 / SURVEY §4.1): queries filtering on
    the partition key read only matching directories (partition
    pruning), and in-file ordering keeps range predicates on the sort
    key to a few row groups (min/max statistics)."""
    out = df
    if sort_cols:
        out = out.repartition(*[F.col(c) for c in partition_cols]).sortWithinPartitions(
            *partition_cols, *sort_cols
        )
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def compact_partitioned(
    spark: SparkSession,
    path: str,
    partition_col: str,
    max_files: int = 1,
) -> list:
    """Compact the small-files debt incremental ingest leaves behind:
    every append (bm25_index_append, ivfpq_append, streaming
    foreachBatch merges) adds part files to the partition directories
    it touches, and at serving time each probe then opens
    O(appends-since-build) files per probed directory.  This rewrites
    ONLY the fragmented directories (> ``max_files`` parquet parts)
    back to one file each and returns their partition values.

    Safe by construction: compaction is content-PRESERVING per
    directory and directories are independent, so a crash between
    directory swaps leaves a partially compacted but fully CORRECT
    layout.  Each swap itself is non-destructive: the staged
    replacement's existence is checked BEFORE the original is touched
    (a staging miss aborts loudly with the data intact), the original
    is moved aside to a hidden ``_compact_old_*`` name by an atomic
    rename, the replacement renamed in, and only then the aside
    removed — the worst crash window is one rename wide and the prior
    bytes survive under the hidden name for manual recovery.  Staging
    lives inside the tree, underscore-hidden from scans.
    Schema-agnostic across int/plain-string partition values
    (``bucket=`` BM25 postings, ``centroid_id=`` IVF-PQ codes); a
    value whose directory name Spark escapes (``=``, ``%``, ``:``,
    control chars in string keys) fails the staging-miss check and
    aborts without damage rather than being silently mishandled.

    At 100 TB this is the standard segment-merge maintenance tick a
    serving tier schedules off-peak; cost is |fragmented dirs|, never
    the layout."""
    import shutil
    from urllib.parse import unquote

    # Refuse crashed-compaction residue AND in-flight deletes: compacting
    # a half-filtered layout would launder the mixed state into clean-
    # looking single files.
    check_serving_safe(path)
    prefix = f"{partition_col}="
    raw_frag: list[str] = []  # directory-name form (Spark-escaped)
    for nm in sorted(os.listdir(path)):
        if not nm.startswith(prefix):
            continue
        d = os.path.join(path, nm)
        n_parts = sum(1 for f in os.listdir(d) if f.endswith(".parquet"))
        if n_parts > max_files:
            raw_frag.append(nm[len(prefix):])
    if not raw_frag:
        return []
    # Partition VALUES are handled as the strings Spark wrote into the
    # directory names (unescaped for the filter; inference disabled so
    # the read yields those exact strings): no int-coercion guessing, so
    # zero-padded keys ('01'), floats, and Spark-escaped values ('='/'%'
    # → %XX) all round-trip — the staging re-escape reproduces the
    # original directory name exactly, and the staging-miss abort below
    # stays as the no-damage safety net for anything that doesn't.  The
    # data files never store the partition column, so disabling
    # inference for this read changes nothing about the rewritten files.
    values = [unquote(r) for r in raw_frag]
    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prior = spark.conf.get(infer_key, "true")
    staging = os.path.join(path, "_compact_staging")
    try:
        spark.conf.set(infer_key, "false")
        rows = spark.read.parquet(path).filter(
            F.col(partition_col).isin(values)
        )
        # repartition BY the partition column: each value's rows land in
        # one task, so partitionBy emits exactly one file per directory.
        (
            rows.repartition(max(len(values), 1), F.col(partition_col))
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(staging)
        )
    finally:
        spark.conf.set(infer_key, prior)
    for raw in raw_frag:
        src = os.path.join(staging, f"{prefix}{raw}")
        dst = os.path.join(path, f"{prefix}{raw}")
        if not os.path.isdir(src):
            # Never touch the original without a staged replacement in
            # hand — a loud no-damage abort for any staging anomaly.
            raise RuntimeError(
                f"compact_partitioned: staged replacement missing for "
                f"{dst} ({src} not written); aborting with the original "
                "intact"
            )
        aside = os.path.join(path, f"_compact_old_{prefix}{raw}")
        shutil.rmtree(aside, ignore_errors=True)
        if os.path.isdir(dst):
            os.replace(dst, aside)  # atomic: old bytes preserved, hidden
        os.replace(src, dst)  # atomic: replacement in
        shutil.rmtree(aside, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    # Return values in the probe-facing type: ints where the directory
    # name IS an int's canonical form (the two shipped layouts), the
    # unescaped string otherwise ('01' stays '01', never 1).
    out: list = []
    for raw, v in zip(raw_frag, values):
        try:
            iv = int(v)
        except ValueError:
            out.append(v)
        else:
            out.append(iv if str(iv) == v else v)
    return out


DELETE_SENTINEL = "_delete_inflight"


def check_serving_safe(path: str) -> None:
    """The probe-side maintenance gate: raise if the dataset holds
    evidence of a crashed maintenance operation that could make a scan
    silently incomplete — compaction-swap residue
    (:func:`check_compaction_residue`) or an in-flight physical delete
    (the ``_delete_inflight`` sentinel written before the first
    partition-directory swap of a delete and removed after the last:
    between those, some directories are filtered and some are not, so
    serving would mix the two states).  Every persisted-index probe
    calls this before reading the layout.  The sentinel is checked
    FIRST: a crashed delete also leaves move-aside residue, and the
    delete diagnosis is the accurate one."""
    if os.path.exists(os.path.join(path, DELETE_SENTINEL)):
        raise RuntimeError(
            f"dataset at {path} has an IN-FLIGHT physical delete "
            f"({DELETE_SENTINEL} present): a delete crashed between "
            "partition-directory swaps, so some directories are "
            "filtered and some are not.  Rebuild the index — or, "
            "generation-managed, discard the partial generation (the "
            "_current pointer still serves the previous one)."
        )
    check_compaction_residue(path)


def check_compaction_residue(path: str) -> None:
    """Raise if a prior :func:`compact_partitioned` crashed inside its
    one-rename-wide swap window: the partition directory's prior bytes
    then survive only under a hidden ``_compact_old_*`` name — which
    scans SKIP, so a probe would silently return incomplete results.
    Probes and compaction both call this first, turning the silent
    window into a loud refusal with a recovery hint (the original data
    is intact under the hidden name)."""
    if not os.path.isdir(path):
        return
    leftover = sorted(
        n for n in os.listdir(path) if n.startswith("_compact_old_")
    )
    if leftover:
        raise RuntimeError(
            f"dataset at {path} holds crashed-compaction residue "
            f"({', '.join(leftover[:5])}): a compact_partitioned swap "
            "died mid-window and the affected partition directory may "
            "be missing or partial.  The prior bytes are intact under "
            "the _compact_old_* name — rename it back (or re-run "
            "compaction after restoring) before serving."
        )


def _delta_enabled(spark: SparkSession) -> bool:
    """True when THIS session can run Delta Lake: the package imports
    AND the Delta SQL extension is registered on the session (the
    import alone does not prove the jars/extension are wired — a write
    would fail at runtime).  Computed per call: cheap, and sessions
    can be rebuilt mid-process in tests."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    exts = ""
    try:
        exts = spark.conf.get("spark.sql.extensions", "") or ""
    except Exception:
        pass
    return "DeltaSparkSessionExtension" in exts


def _merge_upsert_delta(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    spark: SparkSession,
    allow_schema_evolution: bool,
) -> None:
    """The same upsert contract through Delta's transactional MERGE
    INTO: optimistic concurrency instead of the POSIX writer lock, so
    multi-writer clusters and object stores are safe — the one
    local[32]→cluster delta the parquet backend's own docstring
    names.  Schema evolution maps to Delta's autoMerge (scoped to this
    merge, restored after).

    Both backends honour the SAME matched-row contract: a matched row
    is REPLACED by the batch row, so under evolution a batch MISSING
    columns the table has leaves those columns NULL on its rows.
    Delta's ``whenMatchedUpdateAll`` would instead leave target-only
    columns UNCHANGED for matched keys — so under evolution the batch
    is first WIDENED with a typed NULL for every missing target column
    and only then merged with updateAll/insertAll.  (Widening the
    source, rather than an explicit ``whenMatchedUpdate`` column map,
    keeps schema evolution for batch-only NEW columns on the
    updateAll/insertAll path — the only shape every Delta version
    evolves — and is exactly what the parquet backend's
    ``unionByName(allowMissingColumns=True)`` does.)  The strict
    default fails loudly on ANY batch/table column-set mismatch —
    Delta raises on extra batch columns by itself, but silently
    part-updates on narrow batches, so narrowness is checked here to
    match the parquet backend's strict-``unionByName`` stance."""
    from delta.tables import DeltaTable

    batch = df.dropDuplicates(key_cols)
    if not DeltaTable.isDeltaTable(spark, path):
        if _path_has_data(path):
            # Plain-parquet data already lives here: appending a
            # _delta_log that references only the new files would
            # leave the old rows orphaned-but-present for any future
            # parquet read of the same dir.  Convert explicitly first.
            raise ValueError(
                f"{path} holds non-Delta parquet data; convert it "
                "(CONVERT TO DELTA) or merge with backend='parquet'"
            )
        try:
            # errorifexists: if a concurrent writer wins the race to
            # commit version 0, this create FAILS (Delta's commit
            # protocol is atomic) instead of both writers blind-
            # appending duplicate keys — we then retry as a MERGE.
            writer = batch.write.format("delta").mode("errorifexists")
            if allow_schema_evolution:
                writer = writer.option("mergeSchema", "true")
            writer.save(path)
            return
        except Exception:
            if not DeltaTable.isDeltaTable(spark, path):
                raise  # genuine failure, not a lost create race
            # fall through to the MERGE path against the winner's table
    target = DeltaTable.forPath(spark, path)
    target_fields = {f.name: f for f in target.toDF().schema.fields}
    src_cols = batch.columns
    missing = [c for c in target_fields if c not in src_cols]
    if missing:
        if not allow_schema_evolution:
            # Delta's MERGE would silently leave these columns untouched
            # on matched rows; the parquet backend's strict unionByName
            # raises.
            raise ValueError(
                f"batch is missing table columns {missing}; pass "
                "allow_schema_evolution=True to merge (missing columns "
                "become NULL on the batch's rows) or widen the batch"
            )
        # Whole-row-replace contract: widen the batch with typed NULLs
        # so updateAll NULLs the target-only columns on matched rows
        # (and inserts carry them explicitly).
        for c in missing:
            batch = batch.withColumn(
                c, F.lit(None).cast(target_fields[c].dataType)
            )
    conf_key = "spark.databricks.delta.schema.autoMerge.enabled"
    prev = None
    try:
        prev = spark.conf.get(conf_key, None)
    except Exception:
        pass
    try:
        if allow_schema_evolution:
            spark.conf.set(conf_key, "true")
        cond = " AND ".join(f"t.`{c}` <=> s.`{c}`" for c in key_cols)
        (
            target.alias("t")
            .merge(batch.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
    finally:
        if allow_schema_evolution:
            if prev is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prev)


def merge_upsert(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    spark: SparkSession,
    allow_schema_evolution: bool = False,
    backend: str = "auto",
) -> None:
    """Full upsert (update-if-exists, insert-if-absent) — the WHEN
    MATCHED UPDATE counterpart of :func:`write_insert_if_absent`
    (reference only ever needs ON CREATE; this closes the sink
    surface).

    ``backend`` selects the storage engine:

    - ``'parquet'`` — plain parquet + rename-aside swap under the
      single-writer POSIX lock (:func:`_writer_lock`): crash-safe and
      correct on a local filesystem, but two concurrent merges would
      each rebuild from the same snapshot and the loser's batch would
      vanish, which is why the lock exists.
    - ``'delta'`` — Delta Lake ``MERGE INTO`` (requires delta-spark +
      the session extension; raises otherwise): transactional
      optimistic commit, multi-writer and object-store safe — the
      backend to run on a real cluster.
    - ``'auto'`` (default) — ``'delta'`` when this session can run it
      (:func:`_delta_enabled`) and the target is empty or already a
      Delta table; otherwise ``'parquet'``.  An existing parquet
      dataset is never silently reinterpreted.

    ``allow_schema_evolution=True`` admits batches that ADD columns
    (Delta's mergeSchema/autoMerge): existing rows carry NULL for the
    new columns, and a batch MISSING columns the table has keeps those
    columns NULL on its rows.  Off by default — silent schema drift is
    usually a bug, and the strict path fails loudly on any mismatch."""
    if backend not in ("auto", "parquet", "delta"):
        raise ValueError("backend must be auto, parquet or delta")
    is_delta_dir = os.path.isdir(os.path.join(path, "_delta_log"))
    if backend == "delta" or (
        backend == "auto"
        and _delta_enabled(spark)
        and (not _path_has_data(path) or is_delta_dir)
    ):
        _merge_upsert_delta(df, path, key_cols, spark, allow_schema_evolution)
        return
    if is_delta_dir:
        # The parquet path must NEVER touch a Delta table: reading it
        # as plain parquet resurrects superseded (unvacuumed) file
        # versions and the rename-aside rewrite would destroy
        # _delta_log consistency.  Reaching here means the session
        # cannot run Delta (or backend='parquet' was forced) — fail
        # loudly rather than corrupt.
        raise RuntimeError(
            f"{path} is a Delta table but this session cannot run Delta "
            "(missing delta-spark or the session extension); merge from "
            "a Delta-enabled session"
        )
    with _writer_lock(path):
        batch = df.dropDuplicates(key_cols)
        if _path_has_data(path):
            existing = spark.read.parquet(path)
            keep = existing.join(batch.select(*key_cols), key_cols, "left_anti")
            merged = keep.unionByName(
                batch, allowMissingColumns=allow_schema_evolution
            )
            # Write to a staging dir (cannot overwrite files being read),
            # then swap via rename-aside: the old dataset is moved out of
            # the way before the staging dir takes its place, so a crash at
            # any point leaves either the old or the new data recoverable
            # on disk (a rmtree-then-rename window would lose everything).
            # Local-filesystem semantics only — on an object store / HDFS
            # use a lakehouse format's MERGE INTO instead.
            staging = path.rstrip("/") + "__staging"
            merged.write.mode("overwrite").parquet(staging)
            import shutil

            old = path.rstrip("/") + "__old"
            if os.path.exists(old):
                shutil.rmtree(old)
            os.replace(path, old)
            os.replace(staging, path)
            shutil.rmtree(old)
        else:
            batch.write.mode("append").parquet(path)


def incremental_rollup(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    part_col: str,
    key_cols: list[str],
    measures: dict[str, tuple[str, "Column"]],
) -> None:
    """Continuous-aggregate maintenance: merge a new fact batch into a
    persisted rollup, touching ONLY the partitions the batch lands in.

    ``measures`` maps output column -> (merge_kind, batch_agg_column)
    with merge_kind in {"sum", "min", "max"} — the MERGEABLE aggregate
    algebra (counts merge as sums), which is what makes partial
    per-batch aggregation + partition-scoped re-merge equal to a full
    recompute; AVG-style measures must be carried as (sum, count)
    pairs and finalized at read.

    Scale shape — the reason this exists: at 100 TB the rollup spans
    years of partitions but a batch touches one or two, so (1) the
    batch is pre-aggregated FIRST (map-side shrink to rollup grain),
    (2) affected partition VALUES are collected (bounded by the batch's
    partition span — the bounded-scalar pattern), (3) existing rows are
    read with an ``isin`` filter on the partition column — static
    partition pruning, untouched partitions are never read — and
    (4) the merged result is written with dynamic partitionOverwrite,
    replacing only those directories.  The lakehouse equivalent is
    ``MERGE INTO`` on a partitioned Delta/Iceberg table.

    Single-writer per rollup dataset (:func:`_writer_lock`): two
    concurrent merges into the same partition would each read the same
    pre-merge rows and the second overwrite would drop the first batch.
    """
    with _writer_lock(path):
        _incremental_rollup_locked(spark, path, batch, part_col, key_cols, measures)


def _incremental_rollup_locked(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    part_col: str,
    key_cols: list[str],
    measures: dict[str, tuple[str, "Column"]],
) -> None:
    partial = batch.groupBy(part_col, *key_cols).agg(
        *[expr.alias(name) for name, (_, expr) in measures.items()]
    )
    # Materialize the rollup-grain partial ONCE (r14, guide §2.4): it
    # is read twice — the affected-partition collect and the merge
    # write — and without the cut each consumer re-scanned and
    # re-aggregated the full fact batch (profiled: two identical
    # single-split fact scans per merge).  The partial is bounded by
    # rollup grain × the batch's partition span, the same bounded
    # class the affected-values collect already relies on.
    partial = _ckpt(partial)
    merge_fns = {"sum": F.sum, "min": F.min, "max": F.max}
    if _path_has_data(path):
        affected = [
            r[0] for r in partial.select(part_col).distinct().collect()
        ]
        existing = spark.read.parquet(path).filter(
            F.col(part_col).isin(affected)
        )
        merged = (
            existing.unionByName(partial)
            .groupBy(part_col, *key_cols)
            .agg(
                *[
                    merge_fns[kind](F.col(name)).alias(name)
                    for name, (kind, _) in measures.items()
                ]
            )
        )
        # Materialize BEFORE the overwrite: the merged plan reads the
        # same path it is about to replace, and a lazy self-overwrite
        # silently drops the existing rows (same trap merge_upsert's
        # staging dir guards against).  The checkpoint is rollup-grain
        # rows for the affected partitions only — bounded.
        merged = merged.transform(_ckpt)
        # r15 (guide §2.6): the checkpointed merge result landed in ONE
        # task, which then wrote every affected partition directory
        # serially (profiled: three ~0.47 s single-task write stages
        # per lifecycle at sf0.1).  Hash-repartitioning by the
        # partition column spreads the dirs across tasks — one writer
        # per partition value, same one-file-per-dir layout — with the
        # task count bounded by |affected| (known, bounded) and the
        # machine's parallelism: scale-adaptive, never a local
        # constant.
        n_writers = max(
            1, min(spark.sparkContext.defaultParallelism, len(affected))
        )
        merged = merged.repartition(n_writers, part_col)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").partitionBy(part_col).parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    else:
        # Bootstrap write: same parallel-writer shape (the partial is
        # already checkpointed; |partitions| is not collected on this
        # branch, so bound by parallelism alone — empty tasks are free).
        partial.repartition(
            spark.sparkContext.defaultParallelism, part_col
        ).write.mode("overwrite").partitionBy(part_col).parquet(path)


def compact_dataset(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
    sort_cols: list[str] | None = None,
) -> tuple[int, int]:
    """Small-files compaction: rewrite a parquet dataset into
    ``ceil(n / target_rows_per_file)`` files (optionally re-sorted so
    footer min/max stats tighten), swapping via the same rename-aside
    protocol as merge_upsert.  Returns (files_before, files_after).

    The 100 TB reason this exists: streaming sinks and incremental
    merges accrete small files, and at scan time each file costs a
    task + footer read + row-group seek — a 10⁶-file dataset can spend
    more time scheduling than reading.  Periodic compaction (Delta
    OPTIMIZE / Iceberg rewrite_data_files) restores scan efficiency;
    this is that operation for plain parquet layouts.
    """
    import math
    import shutil

    df = spark.read.parquet(path)
    n = df.count()
    files_before = sum(
        1
        for _root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(n / target_rows_per_file))
    out = df.repartition(n_files)
    if sort_cols:
        out = out.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    staging = path.rstrip("/") + "__staging"
    out.write.mode("overwrite").parquet(staging)
    old = path.rstrip("/") + "__old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.replace(path, old)
    os.replace(staging, path)
    shutil.rmtree(old)
    files_after = sum(
        1
        for _root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    return files_before, files_after


# ---------------------------------------------------------------------------
# Text-format sources: CSV and JSONL with EXPLICIT schemas
# ---------------------------------------------------------------------------


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV source with an explicit schema and quarantine semantics.

    At scale the two non-negotiables are (1) NEVER ``inferSchema`` — it
    is a full extra pass over the data and makes the schema a function
    of the sample — and (2) never let one malformed line kill a
    multi-hour job: PERMISSIVE mode routes bad lines to
    ``_corrupt_record`` so the pipeline can count/quarantine them
    (same one-broken-file-cannot-kill-a-stage contract as
    ops.multimodal's decoders).
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """JSON-lines source with an explicit schema (same rules as
    :func:`read_csv`: no inference pass, malformed lines quarantined in
    ``_corrupt_record`` instead of failing the stage)."""
    full = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) split of a PERMISSIVE read: clean rows with
    the corrupt-record column dropped, bad rows as full rows (parsed
    NULLs + the raw line) for reprocessing.  The bad side keeps every
    column on purpose: Spark refuses queries that reference ONLY the
    internal corrupt-record column of a raw text read
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the
    raw line alone is rarely enough to triage anyway."""
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return good, bad


def _changelog_winners(
    changelog: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str,
    delete_op: str,
) -> DataFrame:
    """Per-key winning row: latest by ``seq_col``, delete beating an
    upsert at equal sequence — the arbitration core shared by
    :func:`changelog_snapshot` and :func:`merge_changelog`.

    Producers are expected to emit at most one op per (key, seq); when
    two NON-delete ops nevertheless share a sequence, a stable hash of
    the remaining HASHABLE value columns breaks the tie, so the winner
    is a pure function of the log's CONTENTS — never of partition
    layout or arrival order — and the order-independence guarantee
    survives even malformed duplicate sequences.  Caveat: map-typed
    columns cannot feed the hash (xxhash64 rejects MAP), so a payload
    consisting ONLY of map columns keeps the pre-hash behavior — the
    duplicate-sequence winner is then arbitrary; emit unique
    sequences (or any hashable column) to retain full determinism."""
    from pyspark.sql import Window as W

    op_rank = F.when(F.col(op_col) == delete_op, 0).otherwise(1)

    def _hashable(dt: T.DataType) -> bool:
        # xxhash64 rejects MAP-typed inputs at any nesting depth
        # (DATATYPE_MISMATCH.HASH_MAP_TYPE) — skip such columns so
        # changelogs carrying map payloads keep working; the tie-break
        # then covers the remaining columns (or is absent, restoring
        # the pre-tie-break behavior for all-map payloads).
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _hashable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_hashable(f.dataType) for f in dt.fields)
        return True

    value_cols = [
        f.name
        for f in changelog.schema.fields
        if f.name not in key_cols
        and f.name not in (seq_col, op_col)
        and _hashable(f.dataType)
    ]
    content_tiebreak = (
        [F.xxhash64(*[F.col(c) for c in value_cols]).asc()] if value_cols else []
    )
    w = W.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
        F.col(seq_col).desc(), op_rank.asc(), *content_tiebreak
    )
    return (
        changelog.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def changelog_snapshot(
    changelog: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """CDC changelog → current-state snapshot: the LATEST operation per
    key wins (ordered by ``seq_col``; at equal sequence a delete beats
    an upsert — the conservative tie), and keys whose latest op is the
    delete marker vanish.  This is the Debezium/Delta-CDF "apply
    changes" semantics as one window: a per-key top-1 by
    (seq desc, delete-first), then a filter — one shuffle on the key,
    no self-joins, mergeable across any partitioning of the log.

    Output: the changelog's columns minus nothing — callers project.
    """
    return _changelog_winners(
        changelog, key_cols, seq_col, op_col, delete_op
    ).filter(F.col(op_col) != delete_op)


def merge_changelog(
    spark: SparkSession,
    path: str,
    changelog: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    allow_schema_evolution: bool = False,
) -> None:
    """Apply a CDC batch to a persisted parquet table with FULL
    order-independence: the SEQUENCE arbitrates, not arrival order.
    Base rows compete with their STORED winning sequence, and deletes
    persist as TOMBSTONES in an underscore-hidden ``_tombstones``
    side-car inside the layout (invisible to table readers), so a
    replayed or late batch carrying older entries — including an old
    insert for a since-deleted key — changes nothing.  Batch-by-batch
    application therefore equals the full-log snapshot in ANY order
    (pinned in tests).  The result replaces the dataset through the
    same staging + rename-aside swap as :func:`merge_upsert`, under
    the single-writer lock; tombstones ride inside the staging dir so
    the swap stays atomic-per-rename.  A pre-existing table WITHOUT
    the sequence column falls back to a floor below the batch (its
    rows lose to any changelog entry) — ``seq_col`` is exempt from the
    strict added-columns check precisely so this fallback works
    without ``allow_schema_evolution``; the merged table then carries
    the sequence column going forward.
    """
    with _writer_lock(path):
        # Arbitration uses the sequence column's OWN type (any orderable
        # type works; casting to long would truncate timestamps and
        # NULL-out strings, silently diverging from changelog_snapshot).
        log = changelog.withColumn("__arb__", F.col(seq_col))
        log_cols = log.columns
        if _path_has_data(path):
            existing = spark.read.parquet(path)
            missing = [
                c
                for c in existing.columns
                if c not in changelog.columns and c != op_col
            ]
            added = [
                c
                for c in changelog.columns
                # seq_col is exempt: it is part of the changelog
                # PROTOCOL, not producer data — its absence in the base
                # is the documented NULL-arbitration fallback below,
                # which must stay reachable in strict mode.
                if c not in existing.columns
                and c not in (op_col, "__arb__", seq_col)
            ]
            if missing and not allow_schema_evolution:
                # Silently projecting the base onto the batch's columns
                # would DROP these permanently — fail loudly, matching
                # merge_upsert's strict default.
                raise ValueError(
                    f"changelog batch is missing table columns {missing}; "
                    "align schemas or pass allow_schema_evolution=True"
                )
            if added and not allow_schema_evolution:
                # Symmetric strictness: a batch must not silently evolve
                # the persisted schema either (typo'd producer columns
                # would otherwise commit forever).
                raise ValueError(
                    f"changelog batch adds new columns {added}; "
                    "align schemas or pass allow_schema_evolution=True"
                )
            if missing:
                # Evolution: table-only columns ride along, NULL on
                # changelog rows (strict mode never reaches here).
                for c in missing:
                    log = log.withColumn(c, F.lit(None).cast(existing.schema[c].dataType))
                log_cols = log.columns
            if seq_col in existing.columns:
                arb = F.col(seq_col)
            else:
                # Pre-existing table without the sequence column: NULL
                # arbitration — desc ordering puts NULLs last, so base
                # rows lose to ANY changelog entry for their key.
                arb = F.lit(None).cast(changelog.schema[seq_col].dataType)
            # Project base/tombstones onto the LOG's columns (which by
            # now include any table-only evolution columns) so nothing
            # the table carries is dropped.
            data_cols = [c for c in log_cols if c not in (op_col, "__arb__")]
            base = existing.select(
                *[
                    (F.col(c) if c in existing.columns else F.lit(None)).alias(c)
                    for c in data_cols
                ],
            ).withColumn(op_col, F.lit("I")).withColumn("__arb__", arb)
            log = log.unionByName(base.select(*log_cols))
            tomb_path = path.rstrip("/") + "/_tombstones"
            if _path_has_data(tomb_path):
                tombs = spark.read.parquet(tomb_path)
                trows = (
                    tombs.select(
                        *[
                            (F.col(c) if c in tombs.columns else F.lit(None)).alias(c)
                            for c in data_cols
                        ],
                    )
                    .withColumn(op_col, F.lit(delete_op))
                    .withColumn("__arb__", F.col(seq_col))
                )
                log = log.unionByName(trows.select(*log_cols))
        winners = _changelog_winners(log, key_cols, "__arb__", op_col, delete_op)
        winners = winners.transform(_ckpt)  # reads the path it will replace
        snap = winners.filter(F.col(op_col) != delete_op).drop(op_col, "__arb__")
        new_tombs = winners.filter(F.col(op_col) == delete_op).select(
            *key_cols, seq_col
        )
        staging = path.rstrip("/") + "__staging"
        snap.write.mode("overwrite").parquet(staging)
        new_tombs.write.mode("overwrite").parquet(staging + "/_tombstones")
        import shutil

        old = path.rstrip("/") + "__old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(path):
            os.replace(path, old)
            os.replace(staging, path)
            shutil.rmtree(old)
        else:
            os.replace(staging, path)


def vacuum_dataset(path: str, break_stale_lock_after: float | None = 3600.0) -> dict:
    """Recover/clean crash leftovers around a merge-sink dataset.

    The rename-aside swap can die between its two renames, leaving the
    dataset dir MISSING and ``__old`` holding the only copy — vacuum
    RESTORES it (``restored_old`` in the result) rather than deleting
    the last copy.  Otherwise it removes the ``__staging`` dir (an
    interrupted write — never the source of truth), the ``__old`` dir
    (a completed swap whose cleanup died), and — only when older than
    ``break_stale_lock_after`` seconds — an abandoned ``__lock``
    marker.  Safe by construction: the live dataset directory is never
    touched, and a LIVE lock (younger than the threshold) is left
    alone because its holder may be mid-swap."""
    import shutil

    removed = {
        "staging": False,
        "old": False,
        "lock": False,
        "restored_old": False,
        "skipped_live_lock": False,
    }
    base = path.rstrip("/")
    had_lock = os.path.exists(base + "__lock")
    try:
        # Clean UNDER the writer lock: a point-in-time lock check would
        # leave a window where a writer acquires just after the check
        # and vacuum deletes its in-flight staging dir.  Acquiring (and
        # auto-breaking a stale lock via the takeover protocol) makes
        # the cleanup mutually exclusive with any writer.
        with _writer_lock(path, stale_after=break_stale_lock_after):
            removed["lock"] = had_lock  # a pre-existing lock was stale
            old = base + "__old"
            if os.path.isdir(old) and not _path_has_data(base):
                # Interrupted swap: __old is the only copy — restore it.
                if os.path.isdir(base):
                    shutil.rmtree(base)  # empty torso from a partial recreate
                os.replace(old, base)
                removed["restored_old"] = True
            for suffix, key in (("__staging", "staging"), ("__old", "old")):
                p = base + suffix
                if os.path.isdir(p):
                    shutil.rmtree(p)
                    removed[key] = True
    except ConcurrentWriteError:
        removed["skipped_live_lock"] = True
    return removed
