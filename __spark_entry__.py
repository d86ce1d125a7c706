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
# 138 oracle-bearing queries (123 at the r5 rotation cut + 15 round-5
# additions: dedup_semantic, sketch_hll_distinct, text_bpe_encode,
# io_zorder_profile, sim_ivfpq_top5, text_chunk_windows,
# io_incremental_rollup, w18_ohlc_bars, w19_time_weighted_value,
# mm_decode_gif, mm_gif_frame_sample, mm_resize_roundtrip,
# text_bigram_surprise, sample_weighted_docs, a17_month_over_month —
# all r6 rotation candidates), so the 50-slot window ROTATES each round
# until every query has a driver CORRECTNESS row in some round's file.
# Overflow queries keep full oracles and are re-verified locally every
# round by tools/check_parity.py over the ENTIRE registry.
#
# Round-5 head (exactly 50): the flagship anchor; all 28 queries with
# no driver row in CORRECTNESS_r01–r03 (the 25 round-4 tail additions
# plus graph_pagerank_trade / sketch_cms_token_freq /
# w14_cohort_weekly_retention, which were in the r4 head but whose
# CORRECTNESS_r04.json never landed in the repo — re-listed so the
# certification cannot be lost); q12_late_shipment_priority (r03 row
# was hash-red from an oracle HUGEINT cast, fixed in r4 — values were
# already identical); and 20 backfills whose latest driver row is r03.
# The remaining 28 r03-latest queries rotate into the r6 head.
_HEAD_R5 = [
    # standing anchor
    "flagship_session_attribution",
    # red row in r03 (oracle cast fixed in round 4)
    "q12_late_shipment_priority",
    # in the r4 head but no CORRECTNESS_r04.json delivered
    "graph_pagerank_trade",
    "sketch_cms_token_freq",
    "w14_cohort_weekly_retention",
    # round-4 tail additions, never driver-checked (25)
    "sim_matmul_top5",
    "shuffle_shards",
    "emb_random_projection",
    "sketch_decimal_quantiles",
    "decontam_bloom",
    "graph_triangle_count",
    "search_tfidf_topk",
    "sketch_heavy_hitters",
    "text_mlm_mask",
    "w15_gap_fill",
    "w16_rolling_7d",
    "emb_pq_codes",
    "sim_pq_adc_top5",
    "a12_cube_revenue",
    "a13_pivot_order_matrix",
    "u2_set_ops_customers",
    "a14_corr_qty_price",
    "text_quality_tiers",
    "w17_scd2_user_value",
    "text_bpe_merges",
    "sample_negatives",
    "dedup_typo_pairs",
    "graph_kcore_profile",
    "a15_mode_order_priority",
    "a16_revenue_share",
    # backfills whose latest driver row is r03 (20)
    "a1_pricing_summary",
    "a4_conditional_event_sums",
    "j3_lineitem_ship_window",
    "w1_next_event_chain",
    "w5_sessionize_events",
    "w8_running_total_reset",
    "w7_priority_ordered_chain",
    "a2_order_span_per_customer",
    "nba_lineup_plus_minus",
    "nba_player_stints",
    "sim_ivf_top5",
    "dedup_minhash_clusters",
    "j12_concurrent_sessions",
    "w13_ranking_family",
    "funnel_view_click_purchase",
    "io_merge_idempotent",
    "dedup_minhash_lsh",
    "curate_corpus",
    "mm_decode_image",
    "mm_decode_audio",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    head = {k: QUERIES[k] for k in _HEAD_R5 if k in QUERIES}
    tail = {k: v for k, v in QUERIES.items() if k not in head}
    return {**head, **tail}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
