"""Scale-shape guarantees for the dedup/similarity north-star operators.

Round-2 hardening (VERDICT items 3-5): no corpus×corpus cross join in
any declared dedup query, bounded LSH candidate generation under a
degenerate (all-identical) corpus, and a token dictionary that matches
global dense_rank WITHOUT a single-partition global sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.dedup import (
    hashed_token_ids,
    lsh_candidate_pairs,
    minhash_signatures,
    token_dictionary,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_token_dictionary_matches_dense_rank(spark):
    vocab = ["zebra", "apple", "ant", "a", "Zoo", "banana", "b", "ba", "!", "~x"]
    rows = [(t,) for t in vocab for _ in range(2)]  # duplicates collapse
    toks = spark.createDataFrame(rows, "token string")
    got = {r["token"]: r["tok_id"] for r in token_dictionary(toks).collect()}
    expected = {t: i + 1 for i, t in enumerate(sorted(set(vocab)))}
    assert got == expected


def test_token_dictionary_plan_has_no_single_partition_sort(spark):
    toks = spark.createDataFrame([(t,) for t in ("aa", "ab", "zz")], "token string")
    plan = _plan(token_dictionary(toks))
    assert "SinglePartition" not in plan
    assert "Window" in plan  # per-bucket rank window, partitioned by __bkt__


def test_lsh_hot_bucket_cap_bounds_degenerate_corpus(spark):
    # 60 identical documents: every band collides, so uncapped banding
    # emits the full quadratic 60*59/2 pair set; the cap drops the hot
    # buckets entirely (such clusters belong to exact dedup).
    n = 60
    doc_tokens = spark.createDataFrame(
        [(i, t) for i in range(n) for t in (11, 23, 37, 53)],
        "doc_id long, tok_id long",
    )
    sigs = minhash_signatures(doc_tokens, "doc_id", "tok_id", n_hashes=8)
    uncapped = lsh_candidate_pairs(sigs, "doc_id", rows_per_band=4)
    capped = lsh_candidate_pairs(sigs, "doc_id", rows_per_band=4, max_bucket_size=10)
    assert uncapped.count() == n * (n - 1) // 2
    assert capped.count() == 0


def test_lsh_cap_keeps_small_buckets(spark):
    # Two near-dup pairs with disjoint vocab + unique-background docs:
    # the cap must not disturb small buckets.
    rows = []
    for i, toks in ((0, [1, 2, 3, 4]), (1, [1, 2, 3, 4]),
                    (2, [9, 10, 11, 12]), (3, [9, 10, 11, 12])):
        rows += [(i, t) for t in toks]
    for i in range(4, 20):  # background: unique token sets
        rows += [(i, 1000 + 10 * i + j) for j in range(4)]
    doc_tokens = spark.createDataFrame(rows, "doc_id long, tok_id long")
    sigs = minhash_signatures(doc_tokens, "doc_id", "tok_id", n_hashes=8)
    capped = lsh_candidate_pairs(sigs, "doc_id", rows_per_band=4, max_bucket_size=5)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert {(0, 1), (2, 3)} <= got


def test_declared_dedup_sim_queries_never_cross_join(spark):
    """No declared dedup/similarity query may plan a cartesian product
    or a partitionless single-partition window over the corpus."""
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in (
        "dedup_embedding_cosine",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "dedup_minhash_clusters",
        "sim_lsh_neighbors",
        "text_fingerprint",
        "text_repetition",
        "sketch_kmv_distinct",
        "sample_stratified_documents",
        "decontam_eval_overlap",
        "pack_sequences",
        "curate_corpus",
    ):
        plan = _plan(qs[name](spark, "/root/testdata/sf0.001"))
        assert "CartesianProduct" not in plan, name
        assert "SinglePartition" not in plan, name


def test_hashed_token_ids_stable_and_bounded(spark):
    toks = spark.createDataFrame([("alpha",), ("beta",)], "token string")
    a = {r["token"]: r["tok_id"] for r in hashed_token_ids(toks).collect()}
    b = {r["token"]: r["tok_id"] for r in hashed_token_ids(toks).collect()}
    assert a == b
    assert all(0 <= v < 2_147_483_647 for v in a.values())


def test_char_poly_ids_match_duckdb(spark):
    import duckdb

    from mbai_gdb_spark.ops.dedup import char_poly_token_ids

    toks = ["the", "a", "Zürich", "hello-world", "", "x1", "naïve"]
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    got = {r["token"]: r["tok_id"] for r in char_poly_token_ids(df).collect()}
    sql = """
    SELECT tok, list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(tok, ''), c -> ascii(c))),
             (a, x) -> (a * 31 + x) % 2147483647) AS tok_id
    FROM (SELECT UNNEST(?) AS tok)
    """
    want = {r[0]: r[1] for r in duckdb.connect().execute(sql, [toks]).fetchall()}
    assert got == want


def test_salted_join_rejects_right_flavors(spark):
    import pytest

    from mbai_gdb_spark.ops.skew import salted_join

    a = spark.createDataFrame([(1, "x")], "k long, v string")
    b = spark.createDataFrame([(1, "y")], "k long, w string")
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError):
            salted_join(a, b, ["k"], n_salts=4, how=how)
    # supported flavor sanity: inner result matches plain join
    got = sorted(map(tuple, salted_join(a, b, ["k"], n_salts=4).collect()))
    want = sorted(map(tuple, a.join(b, ["k"]).collect()))
    assert got == want


def test_multi_table_lsh_recall_on_planted_near_dups(spark):
    """Single-table LSH misses even cos-0.99 pairs ~70% of the time at
    k=8; the multi-table scheme (any-of-L tables) must recover planted
    near-duplicates with high recall while keeping the candidate set
    far below all-pairs."""
    import random

    from mbai_gdb_spark.ops.similarity import lsh_candidate_neighbors

    rng = random.Random(7)
    dims, n_base = 32, 40
    rows, planted, vid = [], [], 0
    for _ in range(n_base):
        v = [rng.gauss(0, 1) for _ in range(dims)]
        rows.append((vid, v))
        dup = [x + rng.gauss(0, 0.05) for x in v]  # cosine ~0.999
        rows.append((vid + 1, dup))
        planted.append((vid, vid + 1))
        vid += 2
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = lsh_candidate_neighbors(df, n_planes=8, min_cosine=0.9)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    recall = len(set(planted) & got) / len(planted)
    assert recall >= 0.9, f"recall {recall}"
    # candidate generation stayed sub-quadratic: deduped candidate pairs
    # (pre-threshold) bounded well below the 80*79/2 all-pairs count
    all_cands = lsh_candidate_neighbors(df, n_planes=8).count()
    assert all_cands < (vid * (vid - 1) // 2) * 0.5


def test_char_poly_ids_match_duckdb_randomized(spark):
    """Randomized cross-engine agreement: 200 random unicode-ish tokens
    hash identically in Spark and DuckDB (one batch, fixed seed)."""
    import random

    import duckdb

    from mbai_gdb_spark.ops.dedup import char_poly_token_ids

    rng = random.Random(123)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        "-_.,!?äöüßéèñç中日한"
    )
    toks = list({
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(200)
    })
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    got = {r["token"]: r["tok_id"] for r in char_poly_token_ids(df).collect()}
    sql = """
    SELECT tok, list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(tok, ''), c -> ascii(c))),
             (a, x) -> (a * 31 + x) % 2147483647) AS tok_id
    FROM (SELECT UNNEST(?) AS tok)
    """
    want = {r[0]: r[1] for r in duckdb.connect().execute(sql, [toks]).fetchall()}
    assert got == want


def test_minhash_array_signature_matches_long_format(spark):
    """The map-only fold signature must be value-identical to the
    explode+groupBy formulation (same hash family, same minima)."""
    from pyspark.sql import functions as F

    from mbai_gdb_spark.ops.dedup import (
        char_poly_id,
        char_poly_token_ids,
        minhash_signature_array,
        minhash_signatures,
    )
    from mbai_gdb_spark.ops.text import tokens

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} delta epsilon tok{i % 7}") for i in range(40)],
        "doc_id long, text string",
    )
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    ds = char_poly_token_ids(toks, "token").select("doc_id", "tok_id").distinct()
    long_sig = {
        (r.doc_id, r.hash_idx): r.minhash
        for r in minhash_signatures(ds, "doc_id", "tok_id", n_hashes=16).collect()
    }
    arr = {
        r.doc_id: r.sig
        for r in docs.select(
            "doc_id",
            minhash_signature_array(
                F.transform(F.array_distinct(tokens("text")), lambda t: char_poly_id(t)),
                n_hashes=16,
            ).alias("sig"),
        ).collect()
    }
    for (doc, idx), v in long_sig.items():
        assert arr[doc][idx] == v
    assert len(arr) == 40


def test_plane_literal_matches_symbolic_formula(spark):
    # The literal plane matrix (Python ints) must be bit-identical to
    # the Column formula the SQL oracles mirror.
    from pyspark.sql import functions as F

    from mbai_gdb_spark.ops.similarity import _plane_component, _plane_value

    rows = spark.range(4096).select(
        F.col("id"),
        _plane_component(F.expr("id div 64"), F.col("id") % 64).alias("c"),
    ).collect()
    for r in rows:
        assert r["c"] == _plane_value(r["id"]), r["id"]


def test_lsh_buckets_near_uniform(spark):
    # Regression for the correlated-plane defect: affine-LCG planes
    # clumped 16-bit buckets into periodic patterns (hot buckets with
    # >25% of the corpus).  With xorshift mixing, 2000 pseudo-random
    # vectors over 2^16 buckets must spread out.
    from pyspark.sql import functions as F

    from mbai_gdb_spark.ops.similarity import lsh_table_signatures

    vecs = spark.range(2000).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                ((F.abs(F.xxhash64(F.col("id"), F.lit(d))) % 1000) / 1000.0 - 0.5)
                .cast("float")
                for d in range(16)
            ]
        ).alias("embedding"),
    )
    sig = lsh_table_signatures(vecs, "embedding", n_planes=16, n_tables=2)
    hot = (
        sig.groupBy("lsh_table", "lsh_bucket")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert hot <= 20, hot  # uniform expectation ~1; correlated planes gave 500+


def test_lsh_signature_rejects_overlong_vectors(spark):
    import pytest
    from pyspark.sql import functions as F

    from mbai_gdb_spark.ops.similarity import lsh_table_signatures

    vecs = spark.range(3).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(0.1)] * 70).alias("embedding"),
    )
    with pytest.raises(Exception, match="plane_dim"):
        lsh_table_signatures(vecs, "embedding").select("lsh_bucket").collect()
