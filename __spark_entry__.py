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
# 163 oracle-bearing queries, so the 50-slot window ROTATES each
# round until every query has a driver CORRECTNESS row in some round's
# file. Overflow queries keep full oracles and are re-verified locally
# every round by tools/check_parity.py over the ENTIRE registry.
# ROTATION COMPLETE since r7; after r10 every pre-r10 registry query
# held a driver row no older than r07 (distribution post-r10: 50xr10,
# 49xr09, 49xr08, 10xr07, plus the late-r10 sim_ivf_deleted_top5 not
# yet certified). From here, heads lead with new/changed queries and
# then refresh the OLDEST certification tier.
#
# Round-11 head (exactly 50): the flagship anchor; the FIVE
# never-driver-certified queries — `sim_ivf_deleted_top5` (the plain-IVF
# generation-managed build→append→delete→pointer-probe lifecycle, added
# late in r10's window) and the four r11 additions (`dedup_lsh_deleted`,
# the bucketed-LSH index lifecycle; `search_bm25_updated`,
# `sim_ivf_updated_top5`, `sim_ivfpq_updated_top5`, the FUSED update
# ops — delete+append as one mutation, one published generation); then
# the complete r07 tier (the 10 queries whose latest driver row is r07,
# exactly the candidates tools/rotation_status.py named at round
# start); then 34 freshness refreshes drawn alphabetically from the 49
# queries at the r08 tier (the 15 left at their green r08 rows for the
# r12 head: `sketch_cms_token_freq`, `sketch_decimal_quantiles`,
# `sketch_heavy_hitters`, `text_mlm_mask`, `text_quality_tiers`,
# `u2_set_ops_customers`, `w13_ranking_family`,
# `w14_cohort_weekly_retention`, `w15_gap_fill`, `w16_rolling_7d`,
# `w17_scd2_user_value`, `w1_next_event_chain`, `w5_sessionize_events`,
# `w7_priority_ordered_chain`, `w8_running_total_reset`).
_HEAD_R11 = [
    # standing anchor
    "flagship_session_attribution",
    # never driver-checked: late-r10 + the r11 additions
    "sim_ivf_deleted_top5",
    "dedup_lsh_deleted",
    "search_bm25_updated",
    "sim_ivf_updated_top5",
    "sim_ivfpq_updated_top5",
    # the oldest certification tier (r07) — all ten
    "sketch_kmv_distinct",
    "text_bpe_token_count",
    "text_fingerprint",
    "text_profile",
    "text_repetition",
    "text_top_ngrams",
    "text_unicode_profile",
    "tpch_scalar_suite",
    "u1_union_trading_nations",
    "w10_latest_event_per_user",
    # freshness refreshes: latest driver row r08 (34 of 49, alphabetical)
    "a12_cube_revenue",
    "a13_pivot_order_matrix",
    "a14_corr_qty_price",
    "a15_mode_order_priority",
    "a16_revenue_share",
    "a1_pricing_summary",
    "a2_order_span_per_customer",
    "a4_conditional_event_sums",
    "curate_corpus",
    "decontam_bloom",
    "dedup_minhash_clusters",
    "dedup_minhash_lsh",
    "emb_pq_codes",
    "emb_random_projection",
    "funnel_view_click_purchase",
    "graph_kcore_profile",
    "graph_pagerank_trade",
    "graph_triangle_count",
    "io_merge_idempotent",
    "j12_concurrent_sessions",
    "j13_bloom_smj_revenue",
    "j3_lineitem_ship_window",
    "mm_decode_audio",
    "mm_decode_image",
    "nba_lineup_plus_minus",
    "nba_player_stints",
    "search_bm25_persisted",
    "search_bm25_topk",
    "search_hybrid_rrf",
    "search_tfidf_topk",
    "shuffle_shards",
    "sim_ivf_top5",
    "sim_matmul_top5",
    "sim_pq_adc_top5",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    head = {k: QUERIES[k] for k in _HEAD_R11 if k in QUERIES}
    tail = {k: v for k, v in QUERIES.items() if k not in head}
    return {**head, **tail}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
