"""ANALYZE-style table stats and the declarative constraint checker."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mbai_gdb_spark.ops.stats import check_constraints, table_stats


def _df(spark):
    rows = [
        (1, "a", 10.0, "NEW"),
        (2, "b", 20.0, "OLD"),
        (2, None, -5.0, "NEW"),      # dup key, null name, below range
        (4, "d", 999.0, "WEIRD"),    # above range, bad status
        (None, "e", 50.0, "OLD"),    # null key
    ]
    return spark.createDataFrame(rows, "k long, name string, v double, status string")


def test_table_stats_exact(spark):
    st = {r.col_name: r for r in table_stats(_df(spark)).collect()}
    assert set(st) == {"k", "name", "v", "status"}
    assert all(r.n_rows == 5 for r in st.values())
    assert st["k"].n_nonnull == 4 and st["k"].n_distinct == 3
    assert st["name"].n_nonnull == 4 and st["name"].n_distinct == 4
    assert st["k"].min_repr == "1" and st["k"].max_repr == "4"
    assert st["v"].min_repr == "-5.0" and st["v"].max_repr == "999.0"
    assert st["status"].n_distinct == 3


def test_table_stats_approx_close(spark):
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).alias("mod")
    )
    st = {r.col_name: r for r in table_stats(df, approx=True).collect()}
    assert abs(st["mod"].n_distinct - 97) <= 10  # HLL++ default rsd ~2.3%
    assert abs(st["id"].n_distinct - 10_000) <= 500


def test_check_constraints_counts(spark):
    df = _df(spark)
    ref = spark.createDataFrame([(1,), (2,), (5,)], "rk long")
    out = {
        r.rule_name: r.n_violations
        for r in check_constraints(
            df,
            [
                {"name": "k_not_null", "kind": "not_null", "col": "k"},
                {"name": "k_unique", "kind": "unique", "cols": ["k"]},
                {"name": "v_range", "kind": "range", "col": "v", "min": 0.0, "max": 100.0},
                {"name": "status_ok", "kind": "accepted", "col": "status",
                 "values": ["NEW", "OLD"]},
                {"name": "k_fk", "kind": "foreign_key", "col": "k",
                 "ref": ref, "ref_col": "rk"},
            ],
        ).collect()
    }
    assert out == {
        "k_not_null": 1,
        "k_unique": 1,   # key 2 appears twice → one extra row
        "v_range": 2,    # -5 and 999
        "status_ok": 1,  # WEIRD
        "k_fk": 1,       # k=4 not in {1,2,5}; nulls don't count
    }


def test_check_constraints_clean_table_is_all_zero(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k long, s string")
    out = check_constraints(
        df,
        [
            {"name": "nn", "kind": "not_null", "col": "k"},
            {"name": "uq", "kind": "unique", "cols": ["k"]},
        ],
    ).collect()
    assert all(r.n_violations == 0 for r in out)


def test_check_constraints_rejects_unknown_kind(spark):
    with pytest.raises(ValueError):
        check_constraints(
            spark.range(1), [{"name": "x", "kind": "nope"}]
        )


def test_k_anonymity_rule(spark):
    rows = [
        ("02139", 1980, "F"),
        ("02139", 1980, "F"),
        ("02139", 1980, "F"),   # trio: safe at k=3
        ("94110", 1990, "M"),
        ("94110", 1990, "M"),   # pair: 2 violations at k=3
        ("60614", 1975, "X"),   # singleton: 1 violation
    ]
    df = spark.createDataFrame(rows, "zip string, birth_year int, gender string")
    out = {
        r.rule_name: r.n_violations
        for r in check_constraints(
            df,
            [
                {"name": "k3", "kind": "k_anonymity",
                 "cols": ["zip", "birth_year", "gender"], "k": 3},
                {"name": "k1", "kind": "k_anonymity",
                 "cols": ["zip", "birth_year", "gender"], "k": 1},
            ],
        ).collect()
    }
    assert out == {"k3": 3, "k1": 0}


def test_normalize_documents_nfc_and_casefold(spark):
    from mbai_gdb_spark.ops.text import normalize_documents

    df = spark.createDataFrame(
        [
            (1, "café"),        # e + combining acute → é
            (2, "STRASSE ß"),   # ß casefolds to ss
            (3, "ﬁne"),          # fi ligature: NFC keeps, NFKC splits
            (4, None),
        ],
        "id long, text string",
    )
    nfc = {r.id: r.text for r in normalize_documents(df).collect()}
    assert nfc[1] == "café" and len(nfc[1]) == 4
    assert nfc[3] == "ﬁne"  # canonical form preserves ligatures
    assert nfc[4] is None
    nfkc = {
        r.id: r.text
        for r in normalize_documents(df, form="NFKC", casefold=True).collect()
    }
    assert nfkc[3] == "fine"  # compatibility form splits the ligature
    assert nfkc[2] == "strasse ss"
    # out_col keeps the original
    both = normalize_documents(df, out_col="norm").collect()
    assert {r.id: (r.text, r.norm) for r in both}[1] == ("café", "café")
    import pytest

    with pytest.raises(ValueError):
        normalize_documents(df, form="NFX")
