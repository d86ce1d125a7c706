"""Physical-plan property tests: the scale guarantees the engine relies
on must survive refactors — pushdown reaching the scans, dims broadcast,
window pipelines on a single shuffle, top-k without a global sort."""

from __future__ import annotations

import mbai_gdb_spark.queries_north  # noqa: F401
from mbai_gdb_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "j7_asof_click_to_view")
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]" in plan


def test_column_pruning_reaches_scan(spark):
    plan = _plan(spark, "a1_pricing_summary")
    # only the 5 needed lineitem columns are read (no shipdate, keys, ...)
    assert "ReadSchema" in plan
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_shipdate" not in read and "l_orderkey" not in read


def test_dims_are_broadcast(spark):
    plan = _plan(spark, "j1_region_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # at fixture scale everything broadcasts


def test_window_pipeline_single_shuffle(spark):
    plan = _plan(spark, "w8_running_total_reset")
    # both window sums share the user_id partitioning: exactly one Exchange
    n_exchange = sum(
        1
        for l in plan.splitlines()
        if l.strip().startswith("(") and "Exchange" in l and "Reused" not in l
    )
    assert n_exchange == 1, plan


def test_topk_avoids_global_sort(spark):
    plan = _plan(spark, "o3_top10_customers_by_revenue")
    assert "TakeOrderedAndProject" in plan


def test_w11_kernel_fanout_is_pinned_against_aqe_coalescing(spark):
    """The kernel's input exchange must be a user-specified repartition
    (REPARTITION_BY_NUM) on the group keys: AQE sizes partitions by
    shuffle bytes and is blind to Python compute cost, so an
    ENSURE_REQUIREMENTS exchange here gets coalesced to ~1 partition
    and the ~12 ms/group kernel runs serially (measured 42.6 s vs 5.5 s
    at 2000 games).  Locks the fix in pipeline/lineups.py."""
    from mbai_gdb_spark.pipeline.fixtures import fixture_frames
    from mbai_gdb_spark.pipeline.lineups import lineup_change_events

    pbp, st = fixture_frames(spark, game_id=1001, home_team=10, away_team=20, n_ot=0)
    ev = lineup_change_events(pbp, st)
    ev.write.format("noop").mode("overwrite").save()
    plan = ev._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan, plan


def test_hive_partition_pruning(spark, tmp_path):
    from pyspark.sql import functions as F

    """Writing a table hive-partitioned by a filter column and reading
    with an equality predicate must prune at the PARTITION level
    (PartitionFilters in the scan, not a post-scan Filter) — the layout
    that turns a 100 TB scan into a single-directory read."""
    from mbai_gdb_spark.io import read_table

    base = str(tmp_path / "events_by_type")
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    ev.write.partitionBy("event_type").parquet(base)

    df = spark.read.parquet(base).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert df.count() == ev.filter(F.col("event_type") == "click").count()
