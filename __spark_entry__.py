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
# 166 oracle-bearing queries, so the 50-slot window ROTATES each
# round until every query has a driver CORRECTNESS row in some round's
# file. Overflow queries keep full oracles and are re-verified locally
# every round by tools/check_parity.py over the ENTIRE registry.
# ROTATION COMPLETE since r7 (distribution post-r12: 50xr12, 49xr11,
# 49xr10, 17xr09). From here, heads lead with new/changed queries and
# then refresh the OLDEST certification tier.
#
# Round-13 head (exactly 50): the flagship anchor; the ONE new r13
# query — `search_bm25_stream_manifest` (Structured Streaming ingest
# published through the object-store MANIFEST backend, stream ≡ batch
# ≡ rebuild — the r12 verdict's #2 ask); then the COMPLETE r09 tier
# (the 17 queries whose latest driver row is r09 — exactly the set the
# r12 manifest comment and tools/rotation_status.py named, the r12
# verdict's #1 ask); then 31 freshness refreshes drawn alphabetically
# from the 49 queries at the r10 tier (the 18 left at their green r10
# rows for the r14 head: nba_score_chain, nba_season_next_game,
# nba_team_graph, o3_top10_customers_by_revenue, pack_sequences,
# q18_large_orders, sample_stratified_documents, search_bm25_deleted,
# search_phrase_persisted, sim_ivfpq_deleted_top5, sim_lsh_neighbors,
# text_bpe_encode, text_chunk_windows, text_clf_score, text_dup_spans,
# w12_hourly_time_buckets, w18_ohlc_bars, w19_time_weighted_value —
# plus the late-r10 sim_ivf_deleted_top5 at its r11 row).
_HEAD_R13 = [
    # standing anchor
    "flagship_session_attribution",
    # never driver-checked: the r13 addition
    "search_bm25_stream_manifest",
    # the oldest certification tier (r09) — all seventeen
    "q22_dormant_capital",
    "q2_min_cost_supplier",
    "q3_unshipped_revenue",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_profit",
    "sample_negatives",
    "sample_weighted_docs",
    "search_bm25_appended",
    "search_phrase_bm25",
    "sim_cosine_top5",
    "sim_ivfpq_appended_top5",
    "sim_ivfpq_residual_top5",
    "sim_ivfpq_top5",
    "sketch_hll_distinct",
    "text_bigram_surprise",
    "text_bpe_merges",
    # freshness refreshes: latest driver row r10 (31 of 49, alphabetical)
    "a10_rollup_revenue",
    "a11_quantity_percentiles",
    "a5_nation_customer_rollup",
    "a7_distinct_segments",
    "cdc_apply_changelog",
    "decontam_eval_overlap",
    "dedup_embedding_cosine",
    "dedup_exact_documents",
    "dedup_exact_normalized",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "export_safetensors_manifest",
    "f_array_ops",
    "f_datetime_orders",
    "f_json_event_props",
    "f_string_part_features",
    "graph_bfs_trade_hops",
    "j10_motif_customer_supplier_nation",
    "j1_region_revenue",
    "j3_purchases_in_sessions",
    "j5_local_supplier_revenue",
    "j6_customer_order_counts",
    "j7_asof_click_to_view",
    "j8_customers_without_orders",
    "j9_customers_with_urgent_orders",
    "mm_binary_metadata",
    "nba_action_next_chain",
    "nba_export_edge_index",
    "nba_player_dimension",
    "nba_possessions",
    "nba_rebound_attribution",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    head = {k: QUERIES[k] for k in _HEAD_R13 if k in QUERIES}
    tail = {k: v for k, v in QUERIES.items() if k not in head}
    return {**head, **tail}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
