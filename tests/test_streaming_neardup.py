"""Streaming MinHash-LSH near-dup detection: hits match the batch
banding semantics, canonical is first-seen across micro-batches, and
re-deliveries add no state."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, ids_texts):
    return spark.createDataFrame(ids_texts, "doc_id long, text string")


def _corpus_rows(n_unique=20, n_dupes=10):
    """Unique docs 0..n_unique-1 (30 distinct tokens each); docs
    100+i are exact text copies of docs 0..n_dupes-1."""
    rows = []
    for i in range(n_unique):
        toks = [f"w{(i * 131 + k * 17) % 10_000}_{i}" for k in range(30)]
        rows.append((i, " ".join(toks)))
    for i in range(n_dupes):
        rows.append((100 + i, rows[i][1]))
    return rows


def test_neardup_stream_flags_cross_batch_duplicates(spark, tmp_path):
    from mbai_gdb_spark.streaming.dedup import neardup_stream

    rows = _corpus_rows()
    src = str(tmp_path / "docs")
    # Batch 1: the unique corpus.  Batch 2: the duplicates.  Separate
    # files + maxFilesPerTrigger=1 force separate micro-batches.
    _docs(spark, rows[:20]).coalesce(1).write.mode("append").parquet(src)
    _docs(spark, rows[20:]).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = neardup_stream(stream)
    sink = str(tmp_path / "hits")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    hits = spark.read.parquet(sink)

    flagged = {
        r["doc_id"]: r["canonical_doc_id"]
        for r in hits.select("doc_id", "canonical_doc_id").distinct().collect()
    }
    # Every duplicate doc is flagged against its batch-1 original (an
    # exact copy shares every band, so ANY band fires); no unique doc
    # is flagged (30 distinct tokens -> band collisions improbable).
    for i in range(10):
        assert flagged.get(100 + i) == i, (100 + i, flagged.get(100 + i))
    assert set(flagged) == {100 + i for i in range(10)}


def test_neardup_stream_redelivery_emits_no_hits(spark, tmp_path):
    from mbai_gdb_spark.streaming.dedup import neardup_stream

    rows = _corpus_rows(n_unique=5, n_dupes=0)
    src = str(tmp_path / "docs")
    _docs(spark, rows).coalesce(1).write.mode("append").parquet(src)
    _docs(spark, rows).coalesce(1).write.mode("append").parquet(src)  # replay

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    sink = str(tmp_path / "hits")
    q = (
        neardup_stream(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    hits = spark.read.parquet(sink)
    # A re-delivered doc_id IS its bucket's canonical — not a near-dup.
    # Exactly-once on identical ids is dedup_stream's job; this operator
    # must stay silent (and grow no state) on replays.
    assert hits.count() == 0
