"""Round-15 regressions for the r14 ADVICE findings.

1. ``pipeline.lineups._reconstruct`` tolerates NaN/None period,
   action_id and player_id on substitution rows (skipped, mirroring the
   pre-r14 pandas masks/groupby that silently dropped them — the int()
   casts used to crash the whole task), and a None sub_type under a
   duplicated action_id no longer raises TypeError from the tuple sort
   (the sort key is now the (period, elapsed, action_id) prefix only).
2. ``ops.text._py_query_plan`` falls back to the Spark expressions
   (returns None) on a duplicated query id (the dict used to collapse
   duplicates to the LAST row's tokens where Spark unions terms) and on
   a NULL query id (sorted() over mixed None/non-None (qid, term)
   tuples used to raise TypeError).
3. Bit-equality property tests for the driver-side tokenizer/hash twins
   (``_py_tokens``/``_py_char_poly``) against the Spark
   explode/distinct path over mixed ASCII strings, plus a non-ASCII
   case exercising the fallback branch.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.text import (
    _py_char_poly,
    _py_query_plan,
    _py_tokens,
    tokens,
)
from mbai_gdb_spark.pipeline.lineups import _reconstruct

# ---------------------------------------------------------------------------
# 1. lineup kernel: NaN/None sub fields skipped, None sub_type sortable
# ---------------------------------------------------------------------------


def _kernel_pdf(rows):
    cols = [
        "kind", "player_id", "period", "elapsed", "action_id", "sub_type",
        "time",
    ]
    return pd.DataFrame(rows, columns=cols)


def _base_rows():
    rows = [("starter", float(p), 1.0, math.nan, math.nan, None, None)
            for p in (1, 2, 3, 4, 5)]
    rows.append(("period", math.nan, 1.0, math.nan, math.nan, None, None))
    return rows


def test_lineup_kernel_skips_nan_sub_fields():
    rows = _base_rows()
    # A clean mid-period sub pair, plus sub rows with NaN period /
    # action_id / player_id that MUST be ignored, not crash the task.
    rows += [
        ("sub", 1.0, 1.0, 100.0, 7.0, "out", None),
        ("sub", 6.0, 1.0, 100.0, 8.0, "in", None),
        ("sub", 2.0, math.nan, 200.0, 9.0, "out", None),   # NaN period
        ("sub", 3.0, 1.0, 200.0, math.nan, "out", None),   # NaN action_id
        ("sub", math.nan, 1.0, 200.0, 10.0, "out", None),  # NaN player_id
    ]
    out = _reconstruct((1.0, 10.0), _kernel_pdf(rows))
    # Starters stint + ONE clean change; the NaN rows changed nothing.
    assert out["lineup_id"].tolist() == ["1_2_3_4_5", "2_3_4_5_6"]


def test_lineup_kernel_none_sub_type_with_duplicate_action_id():
    rows = _base_rows()
    # Duplicate (period, elapsed, action_id) keys with a None sub_type:
    # the old bare tuple sort compared sub_type on the tie → TypeError.
    rows += [
        ("sub", 1.0, 1.0, 100.0, 7.0, None, None),
        ("sub", 6.0, 1.0, 100.0, 7.0, "in", None),
    ]
    out = _reconstruct((1.0, 10.0), _kernel_pdf(rows))
    # None sub_type falls into the "in" branch (only "out" removes) —
    # the point here is no crash and a deterministic result.
    assert out["lineup_id"].tolist()[0] == "1_2_3_4_5"


def test_lineup_kernel_object_none_columns():
    # Object-dtype None (not float NaN) in the same fields — the Arrow
    # → pandas conversion can yield either representation.
    rows = _base_rows()
    rows += [
        ("sub", None, 1.0, 50.0, 3.0, "out", None),
        ("sub", 2.0, None, 50.0, 4.0, "out", None),
        ("sub", 2.0, 1.0, 50.0, None, "out", None),
    ]
    pdf = _kernel_pdf(rows).astype(
        {"player_id": object, "period": object, "action_id": object}
    )
    out = _reconstruct((1.0, 10.0), pdf)
    assert out["lineup_id"].tolist() == ["1_2_3_4_5"]


# ---------------------------------------------------------------------------
# 2. _py_query_plan corner cases → Spark fallback
# ---------------------------------------------------------------------------


def test_py_query_plan_duplicate_qid_falls_back():
    rows = [
        {"query_id": 1, "qtext": "alpha beta"},
        {"query_id": 1, "qtext": "gamma"},
    ]
    assert _py_query_plan(rows, "query_id", "qtext") is None


def test_py_query_plan_null_qid_falls_back():
    rows = [
        {"query_id": None, "qtext": "alpha"},
        {"query_id": 2, "qtext": "beta"},
    ]
    assert _py_query_plan(rows, "query_id", "qtext") is None


def test_py_query_plan_non_ascii_falls_back():
    rows = [{"query_id": 1, "qtext": "café au lait"}]
    assert _py_query_plan(rows, "query_id", "qtext") is None


def test_py_query_plan_happy_path():
    rows = [
        {"query_id": 1, "qtext": "  alpha\tbeta  "},
        {"query_id": 2, "qtext": None},
        {"query_id": 3, "qtext": ""},
    ]
    plan = _py_query_plan(rows, "query_id", "qtext")
    assert plan == {1: ["alpha", "beta"], 2: [], 3: []}


# ---------------------------------------------------------------------------
# 3. driver-twin bit-equality vs the Spark expressions
# ---------------------------------------------------------------------------

ASCII_CASES = [
    "plain words here",
    "  leading and trailing  ",
    "tab\tseparated\ttokens",
    "newline\nsplit\nrows",
    "mixed \t\n\x0b\f\r whitespace",
    "single",
    "",
    " ",
    "\t\t",
    "punctuation, kept! as-is? (yes)",
    "digits 123 456seven",
    "UPPER lower MiXeD",
    "a  b   c    d",
    "trailing\t",
    "\nleading",
    "x" * 300,
    "many " * 50,
]


@pytest.mark.usefixtures("spark")
def test_py_tokens_matches_spark_tokens(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ASCII_CASES)], "id int, text string"
    )
    got = {
        r["id"]: r["toks"]
        for r in df.select(
            "id", F.filter(tokens("text"), lambda x: x != F.lit("")).alias("toks")
        ).collect()
    }
    for i, s in enumerate(ASCII_CASES):
        assert got[i] == _py_tokens(s), f"case {i!r}: {s!r}"


@pytest.mark.usefixtures("spark")
def test_py_query_plan_matches_spark_explode_distinct(spark):
    from mbai_gdb_spark.ops.dedup import char_poly_id

    rows = [(i, s) for i, s in enumerate(ASCII_CASES)] + [(99, None)]
    df = spark.createDataFrame(rows, "query_id int, qtext string")
    spark_pairs = {
        (r["query_id"], r["term"])
        for r in df.select(
            "query_id", F.explode(tokens("qtext")).alias("term")
        )
        .filter(F.col("term") != "")
        .distinct()
        .collect()
    }
    spark_hashes = {
        r["term"]: r["h"]
        for r in df.select(F.explode(tokens("qtext")).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
        .select("term", char_poly_id(F.col("term")).alias("h"))
        .collect()
    }
    plan = _py_query_plan(
        [r.asDict() for r in df.collect()], "query_id", "qtext"
    )
    assert plan is not None
    py_pairs = {(qid, t) for qid, toks in plan.items() for t in toks}
    assert py_pairs == spark_pairs
    for t, h in spark_hashes.items():
        assert _py_char_poly(t) == h, f"hash mismatch for {t!r}"


@pytest.mark.usefixtures("spark")
def test_non_ascii_query_uses_spark_fallback_end_to_end(spark, tmp_path):
    """The fallback branch serves a non-ASCII query correctly: probe a
    tiny persisted index with one ASCII and one non-ASCII query and
    check both against the in-memory scorer (bit-identical contract)."""
    from mbai_gdb_spark.ops.text import (
        bm25_index_persist,
        bm25_probe_persisted,
        bm25_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "café beans roast"),
            (2, "beans and rice"),
            (3, "espresso café"),
            (4, "plain water"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(10, "beans"), (20, "café espresso")], "query_id long, qtext string"
    )
    path = str(tmp_path / "bm25_nonascii")
    bm25_index_persist(docs, path, n_buckets=4)
    got = sorted(
        (r["query_id"], r["doc_id"], r["score"], r["rank"])
        for r in bm25_probe_persisted(spark, path, queries, k=3).collect()
    )
    want = sorted(
        (r["query_id"], r["doc_id"], r["score"], r["rank"])
        for r in bm25_topk(docs, queries, k=3).collect()
    )
    assert got == want
