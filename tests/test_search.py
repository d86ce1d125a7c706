"""Tests for the inverted-index top-k keyword search
(ops.text.search_topk_invdf)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.text import search_topk_invdf


def _run(spark, docs_rows, query_rows, k=10):
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    qs = spark.createDataFrame(query_rows, "query_id string, qtext string")
    return search_topk_invdf(docs, qs, k=k)


def test_search_rare_term_outranks_common(spark):
    # "zebra" appears in one doc of four (idf 4M), "the" in all (idf 1M).
    rows = _run(
        spark,
        [
            (1, "the zebra"),
            (2, "the the the"),
            (3, "the cat"),
            (4, "the dog"),
        ],
        [("q", "the zebra")],
    ).collect()
    got = [(r.rank, r.doc_id, r.score) for r in sorted(rows, key=lambda r: r.rank)]
    # doc1: 1*1M (the) + 1*4M (zebra) = 5M; doc2: 3*1M; docs 3,4: 1M each.
    assert got == [(1, 1, 5_000_000), (2, 2, 3_000_000), (3, 3, 1_000_000), (4, 4, 1_000_000)]


def test_search_tie_breaks_by_doc_id(spark):
    rows = _run(
        spark,
        [(9, "apple pie"), (3, "apple tart"), (7, "banana split")],
        [("q", "apple")],
        k=1,
    ).collect()
    assert len(rows) == 1 and rows[0].doc_id == 3 and rows[0].rank == 1


def test_search_k_bounds_output(spark):
    docs = [(i, "common filler") for i in range(20)]
    rows = _run(spark, docs, [("q", "common")], k=5).collect()
    assert len(rows) == 5
    assert sorted(r.rank for r in rows) == [1, 2, 3, 4, 5]
    assert sorted(r.doc_id for r in rows) == [0, 1, 2, 3, 4]  # tie-break


def test_search_multi_query_isolated(spark):
    rows = _run(
        spark,
        [(1, "alpha alpha"), (2, "beta beta"), (3, "alpha beta")],
        [("qa", "alpha"), ("qb", "beta")],
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.doc_id)
    assert set(by_q["qa"]) == {1, 3} and set(by_q["qb"]) == {2, 3}


def test_search_duplicate_query_terms_count_once(spark):
    once = _run(spark, [(1, "apple"), (2, "pear")], [("q", "apple")]).collect()
    twice = _run(spark, [(1, "apple"), (2, "pear")], [("q", "apple apple")]).collect()
    assert [(r.doc_id, r.score) for r in once] == [(r.doc_id, r.score) for r in twice]


def test_search_query_terms_broadcast(spark):
    df = _run(spark, [(1, "a b c")], [("q", "a")])
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------------------------------
# mlm_mask (deterministic MLM masking plan)
# --------------------------------------------------------------------------


def _mask(spark, rows, **kw):
    from mbai_gdb_spark.ops.text import mlm_mask

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return mlm_mask(docs, **kw)


def test_mlm_mask_deterministic_and_in_range(spark):
    rows = [(i, " ".join(f"tok{j}" for j in range(40))) for i in range(50)]
    a = _mask(spark, rows).collect()
    b = _mask(spark, rows).collect()
    key = lambda r: (r.doc_id, r.pos)
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    n_tokens = 50 * 40
    # ~15% selection with slack
    assert 0.10 * n_tokens < len(a) < 0.20 * n_tokens
    for r in a:
        assert 1 <= r.pos <= 40
        assert r.token == f"tok{r.pos - 1}"


def test_mlm_mask_action_semantics(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(30))) for i in range(100)]
    out = _mask(spark, rows).collect()
    by_action = {}
    for r in out:
        by_action.setdefault(r.action, []).append(r)
    # 80/10/10 split within slack
    n = len(out)
    assert 0.7 < len(by_action["mask"]) / n < 0.9
    for r in by_action["mask"]:
        assert r.out_token == "[MASK]"
    for r in by_action["keep"]:
        assert r.out_token == r.token
    for r in by_action["random"]:
        # replacement is drawn from the same document's vocabulary
        assert r.out_token.startswith("w")


def test_mlm_mask_empty_and_single_token_docs(spark):
    out = _mask(spark, [(1, ""), (2, "   "), (3, "solo")]).collect()
    for r in out:
        assert r.doc_id == 3 and r.token == "solo"


# --------------------------------------------------------------------------
# bpe_train vs pure-Python reference
# --------------------------------------------------------------------------


def test_bpe_train_matches_reference(spark):
    from collections import Counter

    from mbai_gdb_spark.ops.text import bpe_train, bpe_train_reference

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest wide",
        "low newer wide lowest",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    freqs = Counter(w for t in texts for w in t.split())
    expected = bpe_train_reference(dict(freqs), n_merges=10)
    got = bpe_train(docs, n_merges=10)
    assert got == expected
    # sanity: first merges reflect the common suffixes/prefixes
    assert len(got) == 10 and all(c >= 1 for _, _, c in got)


def test_bpe_train_overlapping_runs(spark):
    from mbai_gdb_spark.ops.text import bpe_train, bpe_train_reference

    # 'aaaa' stresses greedy non-overlapping merges of (a, a) then (aa, aa).
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aa baab")], "doc_id long, text string"
    )
    expected = bpe_train_reference({"aaaa": 2, "aa": 1, "baab": 1}, n_merges=4)
    assert bpe_train(docs, n_merges=4) == expected


def test_bpe_merge_fold_semantics(spark):
    from pyspark.sql import functions as F

    from mbai_gdb_spark.ops.text import _merge_pair_in

    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["b", "a", "b", "a"],), (["x"],)],
        "syms array<string>",
    )
    out = [r.m for r in df.select(_merge_pair_in(F.col("syms"), "a", "a").alias("m")).collect()]
    assert out[0] == ["aa", "a"]      # leftmost-first, non-overlapping
    assert out[1] == ["b", "a", "b", "a"]
    assert out[2] == ["x"]


# ---------------------------------------------------------------------------
# BM25 (round 8): integer-exact Okapi ranking, ops.text.bm25_topk
# ---------------------------------------------------------------------------


def _bm25_ref(doc_rows, query_rows, k=10, scale=10**6):
    """Pure-Python reference of the documented integer formula."""
    toks = {d: t.split() for d, t in doc_rows}
    n = len(doc_rows)
    dl = {d: len(ts) for d, ts in toks.items()}
    total = sum(dl.values()) or 1
    postings: dict[str, dict[int, int]] = {}
    for d, ts in toks.items():
        for t in ts:
            postings.setdefault(t, {}).setdefault(d, 0)
            postings[t][d] += 1
    out = {}
    for qid, qtext in query_rows:
        scores: dict[int, int] = {}
        for t in set(qtext.split()):
            docs_t = postings.get(t, {})
            df = len(docs_t)
            if not df:
                continue
            idf = ((2 * n - 2 * df + 1) * scale) // (2 * df + 1)
            for d, tf in docs_t.items():
                norm = (9 * dl[d] * n) // total
                scores[d] = scores.get(d, 0) + (idf * 22 * tf) // (
                    10 * tf + 3 + norm
                )
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]
    return out


def _run_bm25(spark, doc_rows, query_rows, k=10):
    from mbai_gdb_spark.ops.text import bm25_topk

    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    qs = spark.createDataFrame(query_rows, "query_id string, qtext string")
    return bm25_topk(docs, qs, k=k)


def test_bm25_matches_integer_reference(spark):
    doc_rows = [
        (1, "the zebra sleeps"),
        (2, "the the the the cat naps on the mat all day long today"),
        (3, "zebra zebra zebra zebra zebra zebra"),
        (4, "a quiet dog"),
    ]
    query_rows = [("q1", "the zebra"), ("q2", "dog"), ("q3", "unicorn dog")]
    got: dict[str, list] = {}
    for r in _run_bm25(spark, doc_rows, query_rows).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    for qid in got:
        got[qid].sort()
    expected = _bm25_ref(doc_rows, query_rows)
    assert got == {q: v for q, v in expected.items() if v}
    # q3: 'unicorn' matches nothing; 'dog' still scores doc 4.
    assert [d for _, d, _ in got["q3"]] == [4]


def test_bm25_length_normalization_prefers_shorter_doc(spark):
    # Same tf for the query term; the shorter document must outrank the
    # longer one — the behavior tf-idf (search_topk_invdf) cannot give.
    from mbai_gdb_spark.ops.text import search_topk_invdf

    doc_rows = [
        (1, "needle haystack"),
        (2, "needle " + " ".join(f"w{i}" for i in range(40))),
    ]
    query_rows = [("q", "needle")]
    rows = sorted(_run_bm25(spark, doc_rows, query_rows).collect(), key=lambda r: r.rank)
    assert [r.doc_id for r in rows] == [1, 2]
    assert rows[0].score > rows[1].score
    # tf-idf scores the two docs identically (tf=1, same idf).
    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    qs = spark.createDataFrame(query_rows, "query_id string, qtext string")
    ti = {r.doc_id: r.score for r in search_topk_invdf(docs, qs).collect()}
    assert ti[1] == ti[2]


def test_bm25_tf_saturates(spark):
    # k1 saturation: 8x the term count must yield far less than 8x the
    # score (monotone but concave in tf).
    doc_rows = [
        (1, "term filler filler filler filler filler filler filler"),
        (2, " ".join(["term"] * 8)),
    ]
    rows = {r.doc_id: r.score for r in _run_bm25(spark, doc_rows, [("q", "term")]).collect()}
    assert rows[2] > rows[1]              # more occurrences still wins
    assert rows[2] < 4 * rows[1]          # but saturates well below linear


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
_doc_text = st.lists(_word, min_size=1, max_size=12).map(" ".join)
_corpus = st.lists(_doc_text, min_size=1, max_size=8).map(
    lambda texts: [(i, t) for i, t in enumerate(texts)]
)
_query = st.lists(_word, min_size=1, max_size=3).map(" ".join)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(_corpus, _query)
def test_bm25_property_matches_reference(spark, doc_rows, qtext):
    got: dict[str, list] = {}
    for r in _run_bm25(spark, doc_rows, [("q", qtext)]).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    for v in got.values():
        v.sort()
    expected = {k: v for k, v in _bm25_ref(doc_rows, [("q", qtext)]).items() if v}
    assert got == expected


# ---------------------------------------------------------------------------
# RRF fusion (round 8): ops.text.rrf_fuse
# ---------------------------------------------------------------------------


def _rrf(rank, k_rrf=60, scale=10**6):
    return scale // (k_rrf + rank)


def test_rrf_fuse_exact_scores_and_order(spark):
    from mbai_gdb_spark.ops.text import rrf_fuse

    ddl = "query_id long, doc_id long, rank int"
    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], ddl
    )
    emb = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (1, 10, 3)], ddl
    )
    got = {
        r.doc_id: (r.rank, r.rrf_score)
        for r in rrf_fuse([lex, emb]).collect()
    }
    exp_scores = {
        10: _rrf(1) + _rrf(3),  # 16393 + 15873 = 32266
        11: _rrf(2) + _rrf(1),  # 16129 + 16393 = 32522
        12: _rrf(3),            # 15873
        13: _rrf(2),            # 16129
    }
    order = sorted(exp_scores.items(), key=lambda kv: (-kv[1], kv[0]))
    expected = {d: (i + 1, s) for i, (d, s) in enumerate(order)}
    assert got == expected
    # doc 11 (present high in both lists) must beat doc 10.
    assert got[11][0] == 1 and got[10][0] == 2


def test_rrf_fuse_tie_breaks_by_doc_id_and_k_bounds(spark):
    from mbai_gdb_spark.ops.text import rrf_fuse

    ddl = "query_id long, doc_id long, rank int"
    # Two docs with identical single-list ranks in separate queries;
    # within query 1, docs 5 and 9 tie exactly -> doc 5 first.
    lex = spark.createDataFrame([(1, 9, 1), (1, 5, 1), (2, 7, 1)], ddl)
    rows = rrf_fuse([lex], k=1).collect()
    got = {r.query_id: (r.doc_id, r.rank) for r in rows}
    assert got == {1: (5, 1), 2: (7, 1)}


# ---------------------------------------------------------------------------
# Persisted BM25 inverted index (round 8): partition-pruned probes
# ---------------------------------------------------------------------------


_PERSIST_DOC_ROWS = [
    (1, "the zebra sleeps by the river"),
    (2, "the the the cat naps on the mat"),
    (3, "zebra zebra zebra stripes"),
    (4, "a quiet dog watches the zebra"),
    (5, "rain on tin roofs all night"),
]


def _persist_fixture(spark, tmp_path, n_buckets=16):
    from mbai_gdb_spark.ops.text import bm25_index_persist

    docs = spark.createDataFrame(_PERSIST_DOC_ROWS, "doc_id long, text string")
    path = str(tmp_path / "bm25_idx")
    bm25_index_persist(docs, path, n_buckets=n_buckets)
    return docs, path


def test_persisted_probe_matches_in_memory_bm25(spark, tmp_path):
    from mbai_gdb_spark.ops.text import bm25_probe_persisted, bm25_topk

    docs, path = _persist_fixture(spark, tmp_path)
    qs = spark.createDataFrame(
        [("q1", "the zebra"), ("q2", "rain dog")], "query_id string, qtext string"
    )
    want = sorted(map(tuple, bm25_topk(docs, qs, k=10).collect()))
    got = sorted(map(tuple, bm25_probe_persisted(spark, path, qs, k=10).collect()))
    assert got == want and len(got) > 0  # bit-identical scores AND ranks


import pytest as _pytest


@_pytest.mark.parametrize("n_buckets", [16, 256])
def test_persisted_probe_prunes_unprobed_buckets(spark, tmp_path, n_buckets):
    """Physical pruning proof at BOTH the small bucket count the
    registry query uses and a larger one (256) — guarding against a
    future regression where a grown bucket count stops the
    PartitionFilters literal list from staying bounded by the distinct
    query terms and degrades to a full scan."""
    import shutil
    from pathlib import Path

    from mbai_gdb_spark.ops.text import bm25_probe_persisted

    _, path = _persist_fixture(spark, tmp_path, n_buckets=n_buckets)
    qs = spark.createDataFrame([("q", "zebra")], "query_id string, qtext string")

    got_df = bm25_probe_persisted(spark, path, qs, k=10)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    before = sorted(map(tuple, got_df.collect()))
    assert before, "zebra must match documents"

    # Physical proof: deleting every UNPROBED bucket directory changes
    # nothing — those directories are never read.  The probed set is
    # bounded by the distinct query terms (here: 1), independent of
    # n_buckets.
    from mbai_gdb_spark.ops.text import _term_bucket
    from pyspark.sql import functions as F

    probed = {
        r.b
        for r in spark.createDataFrame([("zebra",)], "term string")
        .select(_term_bucket(F.col("term"), n_buckets).alias("b"))
        .collect()
    }
    assert len(probed) == 1
    removed = 0
    for d in Path(path).glob("bucket=*"):
        if int(d.name.split("=")[1]) not in probed:
            shutil.rmtree(d)
            removed += 1
    assert removed > 0, "fixture must create unprobed buckets"
    after = sorted(
        map(tuple, bm25_probe_persisted(spark, path, qs, k=10).collect())
    )
    assert after == before


# ---------------------------------------------------------------------------
# Incremental index maintenance (round 9): bm25_index_append
# ---------------------------------------------------------------------------

_APPEND_DELTA_ROWS = [
    (6, "zebra crossing painted overnight"),
    (7, "dogs and cats share the rain"),
    (8, "quiet night by the river"),
]

_APPEND_QUERIES = [
    ("q1", "the zebra"),
    ("q2", "rain dog"),
    ("q3", "quiet night river"),
]


def test_bm25_append_equals_rebuild(spark, tmp_path):
    """The exactness contract: probe results over build(half)+append(
    rest) are BIT-IDENTICAL to a from-scratch build over the union —
    scores included — and so are the index ROWS themselves."""
    from mbai_gdb_spark.ops.text import (
        bm25_index_append,
        bm25_index_persist,
        bm25_probe_persisted,
    )

    base = spark.createDataFrame(_PERSIST_DOC_ROWS, "doc_id long, text string")
    delta = spark.createDataFrame(_APPEND_DELTA_ROWS, "doc_id long, text string")
    inc_path = str(tmp_path / "inc_idx")
    full_path = str(tmp_path / "full_idx")
    bm25_index_persist(base, inc_path, n_buckets=16)
    bm25_index_append(delta, inc_path)
    bm25_index_persist(base.unionByName(delta), full_path, n_buckets=16)

    qs = spark.createDataFrame(_APPEND_QUERIES, "query_id string, qtext string")
    inc = sorted(map(tuple, bm25_probe_persisted(spark, inc_path, qs, k=10).collect()))
    full = sorted(
        map(tuple, bm25_probe_persisted(spark, full_path, qs, k=10).collect())
    )
    assert inc == full and len(inc) > 0

    cols = ["term", "doc_id", "tf", "dl", "bucket"]
    inc_rows = sorted(map(tuple, spark.read.parquet(inc_path).select(cols).collect()))
    full_rows = sorted(
        map(tuple, spark.read.parquet(full_path).select(cols).collect())
    )
    assert inc_rows == full_rows

    m_inc = spark.read.parquet(inc_path + "/_meta").first()
    m_full = spark.read.parquet(full_path + "/_meta").first()
    assert (m_inc["n_docs"], m_inc["total_toks"]) == (
        m_full["n_docs"],
        m_full["total_toks"],
    )


_split_corpus = st.tuples(
    st.lists(_doc_text, min_size=2, max_size=8),
    st.integers(min_value=1, max_value=7),
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_split_corpus, _query)
def test_bm25_append_property_equals_rebuild(spark, corpus_split, qtext):
    """Random corpora, random split point: probing build(prefix) +
    append(suffix) is bit-identical to probing a from-scratch build of
    the whole corpus."""
    import shutil
    import tempfile

    from mbai_gdb_spark.ops.text import (
        bm25_index_append,
        bm25_index_persist,
        bm25_probe_persisted,
    )

    texts, cut = corpus_split
    cut = min(cut, len(texts) - 1)
    rows = [(i, t) for i, t in enumerate(texts)]
    base = spark.createDataFrame(rows[:cut], "doc_id long, text string")
    delta = spark.createDataFrame(rows[cut:], "doc_id long, text string")
    qs = spark.createDataFrame([("q", qtext)], "query_id string, qtext string")
    work = tempfile.mkdtemp(prefix="bm25_append_prop_")
    try:
        inc, full = work + "/inc", work + "/full"
        bm25_index_persist(base, inc, n_buckets=8)
        bm25_index_append(delta, inc)
        bm25_index_persist(base.unionByName(delta), full, n_buckets=8)
        got = sorted(map(tuple, bm25_probe_persisted(spark, inc, qs).collect()))
        want = sorted(map(tuple, bm25_probe_persisted(spark, full, qs).collect()))
        assert got == want
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_bm25_append_never_rewrites_existing_files(spark, tmp_path):
    """Pure INSERT: every pre-append parquet file survives the append
    byte-identical (same path, size, mtime) — the layout stores no
    derived corpus statistics in the rows (df is recomputed at probe
    time), so nothing needs rewriting.  This is the incremental cost
    model: O(delta), never the index."""
    import os
    from pathlib import Path

    from mbai_gdb_spark.ops.text import bm25_index_append

    docs, path = _persist_fixture(spark, tmp_path, n_buckets=16)
    delta = spark.createDataFrame(
        [(9, "zebra zebra again")], "doc_id long, text string"
    )

    def snapshot():
        out = {}
        for d in Path(path).glob("bucket=*"):
            for f in d.rglob("*"):
                if f.is_file():
                    st = os.stat(f)
                    out[str(f)] = (st.st_size, st.st_mtime_ns)
        return out

    before = snapshot()
    assert before
    bm25_index_append(delta, path)
    after = snapshot()
    assert set(before) <= set(after)          # old files all still there...
    for k in before:
        assert after[k] == before[k]          # ...and untouched
    assert len(after) > len(before)           # new files landed


def test_bm25_append_rejects_duplicate_doc_ids(spark, tmp_path):
    from mbai_gdb_spark.ops.text import bm25_index_append

    _, path = _persist_fixture(spark, tmp_path)
    dup = spark.createDataFrame(
        [(3, "zebra returns with new stripes")], "doc_id long, text string"
    )
    with _pytest.raises(ValueError, match="already in the index"):
        bm25_index_append(dup, path)


def test_bm25_append_empty_delta_is_noop(spark, tmp_path):
    from mbai_gdb_spark.ops.text import bm25_index_append, bm25_probe_persisted

    _, path = _persist_fixture(spark, tmp_path)
    qs = spark.createDataFrame([("q", "zebra")], "query_id string, qtext string")
    before = sorted(map(tuple, bm25_probe_persisted(spark, path, qs).collect()))
    m_before = spark.read.parquet(path + "/_meta").first()
    empty = spark.createDataFrame([], "doc_id long, text string")
    bm25_index_append(empty, path)
    after = sorted(map(tuple, bm25_probe_persisted(spark, path, qs).collect()))
    m_after = spark.read.parquet(path + "/_meta").first()
    assert after == before
    assert (m_after["n_docs"], m_after["total_toks"]) == (
        m_before["n_docs"],
        m_before["total_toks"],
    )


def test_bm25_append_empty_text_docs_update_meta_only(spark, tmp_path):
    """Docs whose texts tokenize to nothing still count toward N (the
    rebuild would count them), but touch zero buckets."""
    from mbai_gdb_spark.ops.text import bm25_index_append

    _, path = _persist_fixture(spark, tmp_path)
    m_before = spark.read.parquet(path + "/_meta").first()
    blank = spark.createDataFrame([(21, ""), (22, "   ")], "doc_id long, text string")
    bm25_index_append(blank, path)
    m_after = spark.read.parquet(path + "/_meta").first()
    assert m_after["n_docs"] == m_before["n_docs"] + 2
    assert m_after["total_toks"] == m_before["total_toks"]


# ---------------------------------------------------------------------------
# Exact-phrase BM25 retrieval (round 9): ops.text.phrase_bm25_topk
# ---------------------------------------------------------------------------


def _phrase(spark, doc_rows, query_rows, k=10):
    from mbai_gdb_spark.ops.text import phrase_bm25_topk

    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    qs = spark.createDataFrame(query_rows, "query_id string, qtext string")
    return phrase_bm25_topk(docs, qs, k=k)


def test_phrase_requires_consecutive_run(spark):
    rows = _phrase(
        spark,
        [
            (1, "sort merge join wins"),          # phrase present
            (2, "merge sort join wins"),          # both terms, wrong order
            (3, "sort the merge join"),           # both terms, gap
            (4, "sort merge sort merge"),         # present twice
        ],
        [("q", "sort merge")],
    ).collect()
    got = {r.doc_id for r in rows}
    assert got == {1, 4}


def test_phrase_repeated_term_needs_true_run(spark):
    rows = _phrase(
        spark,
        [
            (1, "batch batch batch now"),         # true triple run
            (2, "batch x batch y batch"),         # 3 occurrences, no run
            (3, "a batch batch end"),             # only a double
        ],
        [("q", "batch batch batch")],
    ).collect()
    assert {r.doc_id for r in rows} == {1}


def test_phrase_at_boundaries_and_single_token(spark):
    rows = _phrase(
        spark,
        [
            (1, "alpha beta tail"),                # at start
            (2, "head alpha beta"),                # at end
            (3, "alpha beta"),                     # whole doc
            (4, "beta alpha"),                     # reversed
        ],
        [("q", "alpha beta"), ("s", "beta")],
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, set()).add(r.doc_id)
    assert by_q["q"] == {1, 2, 3}
    # A single-token "phrase" degrades to ordinary term search.
    assert by_q["s"] == {1, 2, 3, 4}


def test_phrase_scores_match_bm25_on_matched_docs(spark):
    """Scores ARE the plain BM25 scores of the phrase's terms — a doc
    matched by the phrase carries exactly the score bm25_topk assigns
    it, so the two rankers agree wherever both return a doc."""
    from mbai_gdb_spark.ops.text import bm25_topk

    doc_rows = [
        (1, "sort merge join wins today"),
        (2, "merge sort join wins"),
        (3, "sort merge sort merge"),
        (4, "nothing relevant here"),
    ]
    qs = [("q", "sort merge")]
    phrase_scores = {
        r.doc_id: r.score for r in _phrase(spark, doc_rows, qs).collect()
    }
    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    qdf = spark.createDataFrame(qs, "query_id string, qtext string")
    bm = {r.doc_id: r.score for r in bm25_topk(docs, qdf, k=10).collect()}
    assert set(phrase_scores) == {1, 3}
    for d, s in phrase_scores.items():
        assert s == bm[d]


def test_phrase_k_bound_and_deterministic_ties(spark):
    doc_rows = [(i, "key order fixed") for i in range(1, 8)]
    rows = _phrase(spark, doc_rows, [("q", "key order")], k=3).collect()
    assert [(r.rank, r.doc_id) for r in sorted(rows)] == [
        (1, 1), (2, 2), (3, 3)  # equal scores -> doc_id ascending
    ]
