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
# 138+ oracle-bearing queries, so the 50-slot window ROTATES each
# round until every query has a driver CORRECTNESS row in some round's
# file. Overflow queries keep full oracles and are re-verified locally
# every round by tools/check_parity.py over the ENTIRE registry.
#
# Round-6 head (exactly 50): the flagship anchor; the 15 round-5
# additions that have never had a driver row (judge-verified locally
# in the r5 verdict, listed first so certification closes this round);
# the 28 queries whose latest driver row is r03; and 6 of the round-6
# additions. Overflow r6 additions (export_safetensors_manifest, plus
# any landed after) are r7 rotation candidates alongside the r01/r02
# backfill tail (q18_large_orders is r01-latest; ~40 r02-latest) —
# all are check_parity-verified locally every round.
_HEAD_R6 = [
    # standing anchor
    "flagship_session_attribution",
    # round-5 additions, never driver-checked (15)
    "dedup_semantic",
    "sketch_hll_distinct",
    "text_bpe_encode",
    "io_zorder_profile",
    "sim_ivfpq_top5",
    "text_chunk_windows",
    "io_incremental_rollup",
    "w18_ohlc_bars",
    "w19_time_weighted_value",
    "mm_decode_gif",
    "mm_gif_frame_sample",
    "mm_resize_roundtrip",
    "sample_weighted_docs",
    "text_bigram_surprise",
    "a17_month_over_month",
    # backfills whose latest driver row is r03 (28)
    "a13_order_count_distribution",
    "q7_nation_trade_volume",
    "w12_hourly_time_buckets",
    "a12_pivot_event_counts",
    "q19_bracketed_revenue",
    "q17_below_avg_quantity",
    "q21_sole_problem_supplier",
    "q22_dormant_capital",
    "q3_unshipped_revenue",
    "q10_returned_revenue",
    "nba_period_chain",
    "nba_cross_period_next",
    "nba_score_next_chain",
    "sim_cosine_top5",
    "emb_quantize_int8",
    "text_dup_spans",
    "mix_source_weights",
    "emb_class_centroids",
    "emb_centroid_classify",
    "text_clf_score",
    "dedup_lsh_hot_clusters",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q15_top_supplier",
    "q16_part_supplier_variety",
    "q20_excess_suppliers",
    # round-6 additions, never driver-checked
    "sim_ivfpq_residual_top5",
    "mm_decode_jpeg",
    "mm_decode_jpeg_progressive",
    "j13_bloom_pruned_revenue",
    "io_table_stats",
    "dq_orders_constraints",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    head = {k: QUERIES[k] for k in _HEAD_R6 if k in QUERIES}
    tail = {k: v for k, v in QUERIES.items() if k not in head}
    return {**head, **tail}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
