"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query on sf0.001 (smoke check).
``queries()`` — every implemented operator from SURVEY.md §2 plus the
training-data-pipeline extensions, as (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — matching DuckDB SQL per query for the t2 gate.

Implementation lives in ``mbai_gdb_spark``; this module is a thin facade.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import mbai_gdb_spark.queries_nba  # noqa: F401  (registers NBA-domain parity queries)
import mbai_gdb_spark.queries_north  # noqa: F401  (registers north-star queries)
import mbai_gdb_spark.queries_tpch  # noqa: F401  (registers TPC-H completion queries)
from mbai_gdb_spark.queries import ORACLES, QUERIES

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sessionized purchase attribution over the events stream —
    gaps-and-islands sessionization, point-in-interval join, and windowed
    aggregation in one pipeline (SURVEY.md §7.2's signature operators)."""
    return QUERIES["flagship_session_attribution"](spark, _SMOKE_SF_DIR)


# The evaluation driver records correctness rows for (at most) the
# first 50 entries of queries() in iteration order; the registry holds
# 149 oracle-bearing queries, so the 50-slot window ROTATES each
# round until every query has a driver CORRECTNESS row in some round's
# file. Overflow queries keep full oracles and are re-verified locally
# every round by tools/check_parity.py over the ENTIRE registry.
# Queries ADDED in round 7 (j13_bloom_smj_revenue, ...) are r8
# rotation candidates; they are check_parity-certified locally until
# their driver slot comes up.
#
# Round-7 head (exactly 50): the flagship anchor; the 4 round-6-late
# additions that have never had a driver row; then every remaining
# query whose latest driver row is r01/r02 (q18_large_orders is the
# lone r01; 44 are r02-latest). ROTATION COMPLETE: after the r7
# driver run, all 148 pre-r7 registry queries hold a green driver
# CORRECTNESS row from r04 or later (distribution after r7: 50xr07,
# 50xr06, 48xr05). Future rounds only need to certify queries added
# or changed since (r7 additions listed above); the full registry is
# still re-verified locally every round by tools/check_parity.py.
_HEAD_R7 = [
    # standing anchor
    "flagship_session_attribution",
    # round-6-late additions, never driver-checked (4)
    "export_safetensors_manifest",
    "cdc_apply_changelog",
    "text_unicode_profile",
    "dedup_exact_normalized",
    # backfills whose latest driver row is r01/r02 (45)
    "a5_nation_customer_rollup",
    "a7_distinct_segments",
    "j1_region_revenue",
    "j5_local_supplier_revenue",
    "j6_customer_order_counts",
    "j8_customers_without_orders",
    "j9_customers_with_urgent_orders",
    "w10_latest_event_per_user",
    "o3_top10_customers_by_revenue",
    "j7_asof_click_to_view",
    "j3_purchases_in_sessions",
    "u1_union_trading_nations",
    "f_string_part_features",
    "f_datetime_orders",
    "f_json_event_props",
    "j10_motif_customer_supplier_nation",
    "graph_bfs_trade_hops",
    "f_array_ops",
    "a10_rollup_revenue",
    "a11_quantity_percentiles",
    "tpch_scalar_suite",
    "q18_large_orders",
    "nba_score_chain",
    "nba_action_next_chain",
    "nba_rebound_attribution",
    "nba_season_next_game",
    "nba_player_dimension",
    "nba_export_edge_index",
    "nba_possessions",
    "nba_team_graph",
    "text_profile",
    "text_fingerprint",
    "dedup_exact_documents",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "sim_lsh_neighbors",
    "mm_binary_metadata",
    "dedup_embedding_cosine",
    "text_bpe_token_count",
    "text_repetition",
    "sketch_kmv_distinct",
    "sample_stratified_documents",
    "decontam_eval_overlap",
    "pack_sequences",
    "text_top_ngrams",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    head = {k: QUERIES[k] for k in _HEAD_R7 if k in QUERIES}
    tail = {k: v for k, v in QUERIES.items() if k not in head}
    return {**head, **tail}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
