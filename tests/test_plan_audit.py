"""Full-registry physical-plan audit: every declared query's plan is
built (not executed) and checked for the scale anti-patterns — a
CartesianProduct anywhere, or BroadcastNestedLoopJoin / SinglePartition
outside the explicit allowlists.  This is the regression net behind the
"no declared query would cross-product or single-thread at 100 TB"
claim; the allowlists name the deliberate exceptions and why."""

from __future__ import annotations

import mbai_gdb_spark.queries_nba  # noqa: F401
import mbai_gdb_spark.queries_north  # noqa: F401
import mbai_gdb_spark.queries_tpch  # noqa: F401
from mbai_gdb_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# Broadcast nested-loop joins that are the point of the query: a tiny
# broadcast side scored against every corpus row.
BNLJ_OK = {
    "sim_cosine_top5",  # brute-force baseline: query batch broadcast
    "search_hybrid_rrf",  # its cosine leg is the same broadcast query batch
    "sim_ivf_top5",  # stride centroids broadcast for assignment/probes
    "dedup_semantic",  # same stride-centroid broadcast assignment (SemDeDup)
    "sim_ivfpq_top5",  # stride centroids broadcast for assignment/probes
    "sim_ivfpq_residual_top5",  # same centroid broadcast, residual encoding
    # (sim_ivfpq_appended_top5 needs no entry: its probe-list crossJoin
    # sits behind the lineage truncation, so the audited plan is the
    # pruned-scan ADC pipeline only)
    "emb_centroid_classify",  # k class centroids broadcast
    "q22_dormant_capital",  # 1-row scalar subquery broadcast
    "q11_important_parts",  # 1-row grand-total broadcast for the value cut
    # r14: in-memory BM25 folds the N/T corpus normalizers in as a
    # 1-row broadcast frame derived from the postings subtree (one
    # tokenize pass, no plan-construction action) — same 1-row scalar
    # broadcast shape as q22/q11.
    "search_bm25_topk",
    "search_phrase_bm25",
}

# Single-partition exchanges that are scalar FINAL aggregates over
# already-reduced inputs (the only shape where one partition is right).
SINGLEPART_OK = {
    "tpch_scalar_suite",
    "q17_below_avg_quantity",
    "q19_bracketed_revenue",
    "q22_dormant_capital",
    "mix_source_weights",  # normalizers fold over the #sources-row count table
    "q11_important_parts",  # grand-total scalar over per-part partials
    "q15_top_supplier",  # scalar MAX over the per-supplier revenue table
    "a16_revenue_share",  # global-share window over the 25-row nation rollup
    "io_table_stats",  # ANALYZE: one whole-table agg row, map-side partials
    "dq_orders_constraints",  # per-rule scalar violation counts, map-side partials
    # r14: the in-memory BM25 paths fold the N/T corpus normalizers in
    # as a 1-row broadcast frame derived from the postings subtree
    # (ONE tokenize pass, no plan-construction action) — the scalar
    # final agg over map-side partials is that frame's build.
    "search_bm25_topk",
    "search_phrase_bm25",
    "search_hybrid_rrf",
}


def test_no_declared_query_plans_a_scale_antipattern(spark):
    violations = []
    for name, fn in QUERIES.items():
        plan = (
            fn(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        if "CartesianProduct" in plan:
            violations.append((name, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            violations.append((name, "BroadcastNestedLoopJoin"))
        if "SinglePartition" in plan and name not in SINGLEPART_OK:
            violations.append((name, "SinglePartition"))
    assert not violations, violations


def test_allowlists_stay_minimal(spark):
    # If a query is rewritten so its exception disappears, the allowlist
    # entry must be removed — stale allowlists hide real regressions.
    for name in BNLJ_OK:
        plan = QUERIES[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan, f"{name} no longer needs BNLJ_OK"
    for name in SINGLEPART_OK:
        plan = QUERIES[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" in plan, f"{name} no longer needs SINGLEPART_OK"
