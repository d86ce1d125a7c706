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
# 158 oracle-bearing queries, so the 50-slot window ROTATES each
# round until every query has a driver CORRECTNESS row in some round's
# file. Overflow queries keep full oracles and are re-verified locally
# every round by tools/check_parity.py over the ENTIRE registry.
# ROTATION COMPLETE since r7; after r9 EVERY registry query held a
# driver row (distribution post-r9: 50xr09, 49xr08, 49xr07, 7xr06).
# From here, heads lead with new/changed queries and then refresh the
# OLDEST certification tier.
#
# Round-10 head (exactly 50): the flagship anchor; the three new r10
# queries (`search_bm25_deleted` + `sim_ivfpq_deleted_top5` — the full
# generation-managed build→append→delete→pointer-probe lifecycle for
# both index layouts — and `search_phrase_persisted`, phrase retrieval
# served from the positional index; never driver-certified); the SEVEN
# queries whose latest driver row is r06, the oldest tier (exactly the
# candidates tools/rotation_status.py named at round start:
# `w12_hourly_time_buckets`, `text_dup_spans`, `text_clf_score`,
# `text_bpe_encode`, `text_chunk_windows`, `w18_ohlc_bars`,
# `w19_time_weighted_value`); then 39 freshness refreshes drawn
# alphabetically from the 49 queries at the r07 tier (the 10 left at
# their green r07 rows for the r11 head: `sketch_kmv_distinct`,
# `text_bpe_token_count`, `text_fingerprint`, `text_profile`,
# `text_repetition`, `text_top_ngrams`, `text_unicode_profile`,
# `tpch_scalar_suite`, `u1_union_trading_nations`,
# `w10_latest_event_per_user`).
_HEAD_R10 = [
    # standing anchor
    "flagship_session_attribution",
    # never driver-checked: the r10 additions
    "search_bm25_deleted",
    "sim_ivfpq_deleted_top5",
    "search_phrase_persisted",
    # the oldest certification tier (r06) — all seven
    "text_bpe_encode",
    "text_chunk_windows",
    "text_clf_score",
    "text_dup_spans",
    "w12_hourly_time_buckets",
    "w18_ohlc_bars",
    "w19_time_weighted_value",
    # freshness refreshes: latest driver row r07 (39 of 49)
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
    "nba_score_chain",
    "nba_season_next_game",
    "nba_team_graph",
    "o3_top10_customers_by_revenue",
    "pack_sequences",
    "q18_large_orders",
    "sample_stratified_documents",
    "sim_lsh_neighbors",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    head = {k: QUERIES[k] for k in _HEAD_R10 if k in QUERIES}
    tail = {k: v for k, v in QUERIES.items() if k not in head}
    return {**head, **tail}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
