"""Hot-LSH-bucket handling: oversized buckets must be capped OUT of the
quadratic pair join but surface as bounded CLUSTER rows, so every
duplicate doc is still accounted for in curation output."""

from __future__ import annotations

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.dedup import (
    char_poly_id,
    hot_bucket_clusters,
    hot_bucket_membership,
    lsh_buckets_from_signature,
    minhash_signature_array,
    pairs_from_buckets,
)
from mbai_gdb_spark.ops.text import tokens

CAP = 10
N_DUP = 40  # one boilerplate text repeated N_DUP times


def _buckets(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    with_sig = df.select(
        "doc_id",
        minhash_signature_array(
            F.transform(F.array_distinct(tokens("text")), lambda t: char_poly_id(t)),
            n_hashes=16,
        ).alias("signature"),
    )
    return lsh_buckets_from_signature(with_sig, "doc_id", "signature", 4)


def _degenerate_docs():
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    docs = [(i, boiler) for i in range(N_DUP)]
    docs += [(100 + i, f"unique document number {i} with its own distinct words xyz{i}")
             for i in range(5)]
    return docs


def test_identical_corpus_pairs_bounded_clusters_complete(spark):
    buckets = _buckets(spark, _degenerate_docs())

    # Pair join with the cap: the 40-doc boilerplate bucket (> CAP) is
    # excluded, so pair count stays far below the 40*39/2 = 780 blowup.
    pairs = pairs_from_buckets(buckets, "doc_id", max_bucket_size=CAP).collect()
    assert len(pairs) < N_DUP  # bounded: no quadratic cluster output
    boiler_ids = set(range(N_DUP))
    assert not any(r.id_a in boiler_ids and r.id_b in boiler_ids for r in pairs)

    # ...but EVERY boilerplate doc appears in the cluster membership.
    member = hot_bucket_membership(buckets, "doc_id", max_bucket_size=CAP)
    covered = {r.doc_id for r in member.collect()}
    assert covered == boiler_ids

    # One cluster row per hot (band, bucket): 4 bands, full count,
    # bounded sample, representative = min id.
    clusters = hot_bucket_clusters(
        buckets, "doc_id", max_bucket_size=CAP, sample_size=8
    ).collect()
    assert len(clusters) == 4
    for c in clusters:
        assert c.member_count == N_DUP
        assert c.cluster_rep == 0
        assert list(c.member_sample) == list(range(8))


def test_no_hot_buckets_means_empty_cluster_frame(spark):
    docs = [(i, f"entirely distinct content {i} alpha beta gamma delta{i}")
            for i in range(12)]
    buckets = _buckets(spark, docs)
    assert hot_bucket_clusters(buckets, max_bucket_size=CAP).count() == 0
    assert hot_bucket_membership(buckets, max_bucket_size=CAP).count() == 0


def test_uncapped_pairs_match_capped_plus_hot_membership(spark):
    """Accounting identity: capped pairs + hot membership together cover
    every doc that the uncapped pair join would touch."""
    buckets = _buckets(spark, _degenerate_docs())
    uncapped = pairs_from_buckets(buckets, "doc_id")
    touched_uncapped = {
        r.v
        for r in uncapped.select(F.explode(F.array("id_a", "id_b")).alias("v")).collect()
    }
    capped = pairs_from_buckets(buckets, "doc_id", max_bucket_size=CAP)
    touched_capped = {
        r.v
        for r in capped.select(F.explode(F.array("id_a", "id_b")).alias("v")).collect()
    }
    hot = {r.doc_id for r in hot_bucket_membership(buckets, "doc_id", CAP).collect()}
    assert touched_uncapped <= (touched_capped | hot)
