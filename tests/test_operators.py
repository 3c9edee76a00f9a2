"""Per-operator property tests on the fixtures (SURVEY.md §5.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from tests.conftest import SF_SMOKE


def test_semi_plus_anti_partition_customers(spark, queries):
    c = load(spark, SF_SMOKE, "customer").count()
    anti = queries["q_join_anti"](spark, SF_SMOKE).count()
    o = load(spark, SF_SMOKE, "orders").select("o_custkey").distinct().count()
    # customers with ≥1 order + customers with none == all customers
    assert o + anti == c


def test_window_sums_partition_global_sum(spark, queries):
    tumb = queries["q_window_tumbling"](spark, SF_SMOKE)
    total = tumb.agg(F.sum("n_events")).collect()[0][0]
    assert total == load(spark, SF_SMOKE, "events").count()


def test_sliding_windows_count_events_four_times(spark, queries):
    slid = queries["q_window_sliding"](spark, SF_SMOKE)
    total = slid.agg(F.sum("n_events")).collect()[0][0]
    # 1h window / 15min slide → every event in exactly 4 windows
    assert total == 4 * load(spark, SF_SMOKE, "events").count()


def test_topk_per_group_bounded(spark, queries):
    df = queries["q_topk_per_group"](spark, SF_SMOKE)
    mx = df.groupBy("o_custkey").count().agg(F.max("count")).collect()[0][0]
    assert mx <= 3


def test_dedup_first_event_unique_and_minimal(spark, queries):
    df = queries["q_dedup_first_event"](spark, SF_SMOKE)
    n = df.count()
    assert df.select("user_id", "event_type").distinct().count() == n
    keys = (load(spark, SF_SMOKE, "events")
            .select("user_id", "event_type").distinct().count())
    assert n == keys


def test_approx_distinct_within_tolerance(spark, queries):
    approx = {r["event_type"]: r["approx_users"]
              for r in queries["q_approx_distinct"](spark, SF_SMOKE).collect()}
    exact = {r["event_type"]: r["n_users"]
             for r in queries["q_count_distinct"](spark, SF_SMOKE).collect()}
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(1, 0.05 * v), k


def test_union_all_preserves_bag_counts(spark, queries):
    ev = load(spark, SF_SMOKE, "events")
    n = queries["q_union_all"](spark, SF_SMOKE).count()
    clicks = ev.filter(F.col("event_type") == "click").count()
    views = ev.filter(F.col("event_type") == "view").count()
    assert n == clicks + views


def test_asof_join_covers_events_after_first_version(spark, queries):
    df = queries["q_asof_join"](spark, SF_SMOKE)
    # one row per event that has a governing rule version; never more
    assert df.select("event_id").distinct().count() == df.count()


def test_broadcast_rule_join_plan_uses_broadcast(spark, queries):
    plan = (queries["q_broadcast_rule_join"](spark, SF_SMOKE)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_star_join_broadcasts_all_dims(spark, queries):
    plan = (queries["q_star_join"](spark, SF_SMOKE)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("BroadcastHashJoin") >= 3


def test_scan_parquet_pushdown(spark, queries):
    plan = (queries["q_scan_parquet"](spark, SF_SMOKE)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [IsNotNull(o_totalprice), "
    "GreaterThan(o_totalprice,400000.0)]" in plan or "PushedFilters" in plan
    # projection pruned to the 3 selected columns
    assert "o_orderdate" not in plan.split("ReadSchema")[1][:200]
