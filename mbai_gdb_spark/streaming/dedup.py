"""Streaming deduplication: exactly-once event streams from
at-least-once sources.

Ingest pipelines re-deliver (producer retries, replayed offsets);
training-data streams need each logical event once.  Structured
Streaming's ``dropDuplicatesWithinWatermark`` keeps a per-key state
entry only until the watermark passes the event time, so state is
bounded by (arrival rate × watermark) instead of growing with the
stream — the shape that survives an unbounded 100 TB/day feed, unlike
plain ``dropDuplicates`` whose state never ages out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop re-deliveries of the same ``key_cols`` arriving within the
    watermark horizon.  Event time is cast to TIMESTAMP (watermarks
    reject NTZ; session tz is UTC so the cast preserves the value)."""
    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    return events.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(key_cols)


NEARDUP_HIT_SCHEMA = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("bucket", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("canonical_doc_id", T.LongType()),
    ]
)

_NEARDUP_STATE_SCHEMA = T.StructType([T.StructField("canonical", T.LongType())])


def _update_bucket(key, pdfs, state: "GroupState"):
    """Per-(band, bucket) state = the canonical member (first-seen; ties
    within a micro-batch break to the smallest id).  Every later arrival
    in the bucket emits a hit row against that canonical."""
    import pandas as pd

    canonical = state.get[0] if state.exists else None
    hit_docs: list[int] = []
    for pdf in pdfs:
        for doc_id in sorted(int(x) for x in pdf["doc_id"]):
            if canonical is None:
                canonical = doc_id
            elif doc_id != canonical:
                hit_docs.append(doc_id)
    state.update((canonical,))
    if hit_docs:
        yield pd.DataFrame(
            {
                "band": key[0],
                "bucket": key[1],
                "doc_id": hit_docs,
                "canonical_doc_id": canonical,
            }
        )


def neardup_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Streaming NEAR-duplicate detection — the MinHash-LSH flagship in
    live form: each arriving document computes its MAP-ONLY array
    signature (ops.dedup.minhash_signature_array — no shuffle before the
    state store), explodes to its LSH band buckets, and each
    (band, bucket) group keeps ONE long of state: the canonical
    (first-seen, ties → smallest id) member.  Later arrivals in an
    occupied bucket emit (band, bucket, doc_id, canonical_doc_id) hit
    rows — a doc surfacing in ANY band is a near-dup candidate, same
    semantics as the batch `dedup_minhash_lsh` banding.

    State is one long per OCCUPIED bucket — bounded by corpus
    distinctness, not stream length (re-deliveries and near-dups add no
    state).  For feeds where old buckets should age out, wrap the group
    key's event time with a watermark + timeout; the corpus-dedup use
    case intentionally keeps buckets forever.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from mbai_gdb_spark.ops.dedup import (
        char_poly_id,
        lsh_buckets_from_signature,
        minhash_signature_array,
    )
    from mbai_gdb_spark.ops.text import tokens

    with_sig = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.array_distinct(tokens(text_col)).alias("__toks__"),
        )
        .filter(F.size("__toks__") > 0)
        .select(
            "doc_id",
            minhash_signature_array(
                F.transform(F.col("__toks__"), lambda t: char_poly_id(t)),
                n_hashes=n_hashes,
            ).alias("signature"),
        )
    )
    buckets = lsh_buckets_from_signature(
        with_sig, "doc_id", "signature", rows_per_band
    )
    return buckets.groupBy("band", "bucket").applyInPandasWithState(
        _update_bucket,
        NEARDUP_HIT_SCHEMA,
        _NEARDUP_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
