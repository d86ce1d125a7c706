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
# 94 oracle-bearing queries, so the 50-slot window ROTATES each round
# until every query has a driver CORRECTNESS row in some round's file.
#
# Round-3 head (exactly 50) = the 32 queries with no driver row in
# r01/r02 (incl. this round's new rows: W2/W6/W9 chains, MERGE sink,
# image decode, hot-bucket clusters, the 8 TPC-H completions) + the 12
# queries last driver-checked in r01 + 6 standing anchors (flagship /
# kernel-golden / dedup-clustering rows re-certified every round).
# Overflow queries keep full oracles and are re-verified locally every
# round by tools/check_parity.py over the ENTIRE registry.
_HEAD_R3 = [
    # standing anchors
    "flagship_session_attribution",
    "a1_pricing_summary",
    "nba_lineup_plus_minus",
    "nba_player_stints",
    "dedup_minhash_clusters",
    "sim_ivf_top5",
    # never driver-checked before round 3
    "q19_bracketed_revenue",
    "q17_below_avg_quantity",
    "q21_sole_problem_supplier",
    "q22_dormant_capital",
    "j12_concurrent_sessions",
    "w13_ranking_family",
    "q3_unshipped_revenue",
    "q10_returned_revenue",
    "funnel_view_click_purchase",
    "io_merge_idempotent",
    "nba_period_chain",
    "nba_cross_period_next",
    "nba_score_next_chain",
    "dedup_minhash_lsh",
    "sim_cosine_top5",
    "curate_corpus",
    "emb_quantize_int8",
    "text_dup_spans",
    "mix_source_weights",
    "emb_class_centroids",
    "emb_centroid_classify",
    "text_clf_score",
    "mm_decode_image",
    "dedup_lsh_hot_clusters",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q12_late_shipment_priority",
    "q15_top_supplier",
    "q16_part_supplier_variety",
    "q20_excess_suppliers",
    # last driver-checked in round 1 — re-certified this round
    "a4_conditional_event_sums",
    "j3_lineitem_ship_window",
    "w1_next_event_chain",
    "w5_sessionize_events",
    "w8_running_total_reset",
    "w7_priority_ordered_chain",
    "a2_order_span_per_customer",
    "a13_order_count_distribution",
    "q7_nation_trade_volume",
    "w12_hourly_time_buckets",
    "a12_pivot_event_counts",
    # new in round 3 after the head was sized; q18_large_orders already
    # has its r01 row, so the audio-decode row takes its slot
    "mm_decode_audio",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    head = {k: QUERIES[k] for k in _HEAD_R3 if k in QUERIES}
    tail = {k: v for k, v in QUERIES.items() if k not in head}
    return {**head, **tail}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
