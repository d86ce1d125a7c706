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
# 155 oracle-bearing queries, so the 50-slot window ROTATES each
# round until every query has a driver CORRECTNESS row in some round's
# file. Overflow queries keep full oracles and are re-verified locally
# every round by tools/check_parity.py over the ENTIRE registry.
# ROTATION COMPLETE since r7; after r8 EVERY registry query held a
# driver row (distribution post-r8: 50xr08, 49xr07, 49xr06, 4xr05).
# From here, heads lead with new/changed queries and then refresh the
# OLDEST certification tier.
#
# Round-9 head (exactly 50): the flagship anchor; the three new r9
# queries (`search_bm25_appended` + `sim_ivfpq_appended_top5`, the
# incremental-index twins, and `search_phrase_bm25` — never
# driver-certified); the four queries
# whose latest driver row is r05, the oldest tier (`text_bpe_merges`,
# `sample_negatives`, `dedup_typo_pairs`, `q12_late_shipment_priority`
# — exactly the candidates tools/rotation_status.py names); then 42
# freshness refreshes drawn alphabetically from the 49 queries at the
# r06 tier (the 7 left at their green r06 rows for the r10 head:
# `text_bpe_encode`, `text_chunk_windows`, `text_clf_score`,
# `text_dup_spans`, `w12_hourly_time_buckets`, `w18_ohlc_bars`,
# `w19_time_weighted_value`).
_HEAD_R9 = [
    # standing anchor
    "flagship_session_attribution",
    # never driver-checked: the r9 additions
    "search_bm25_appended",
    "sim_ivfpq_appended_top5",
    "search_phrase_bm25",
    # the oldest certification tier (r05)
    "text_bpe_merges",
    "sample_negatives",
    "dedup_typo_pairs",
    "q12_late_shipment_priority",
    # freshness refreshes: latest driver row r06 (42 of 49)
    "a12_pivot_event_counts",
    "a13_order_count_distribution",
    "a17_month_over_month",
    "dedup_lsh_hot_clusters",
    "dedup_semantic",
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
    "q15_top_supplier",
    "q16_part_supplier_variety",
    "q17_below_avg_quantity",
    "q19_bracketed_revenue",
    "q20_excess_suppliers",
    "q21_sole_problem_supplier",
    "q22_dormant_capital",
    "q2_min_cost_supplier",
    "q3_unshipped_revenue",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_profit",
    "sample_weighted_docs",
    "sim_cosine_top5",
    "sim_ivfpq_residual_top5",
    "sim_ivfpq_top5",
    "sketch_hll_distinct",
    "text_bigram_surprise",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    head = {k: QUERIES[k] for k in _HEAD_R9 if k in QUERIES}
    tail = {k: v for k, v in QUERIES.items() if k not in head}
    return {**head, **tail}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
