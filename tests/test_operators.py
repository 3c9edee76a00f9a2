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


# --- olap_ext (pivot / sampling / quantiles / fuzzy / subqueries) -----------


def test_pivot_row_sums_match_daily_counts(spark, queries):
    """Pivoted per-type counts must re-sum to the plain daily counts."""
    piv = queries["q_pivot"](spark, SF_SMOKE)
    total_from_pivot = piv.select(
        (F.col("n_click") + F.col("n_error") + F.col("n_purchase")
         + F.col("n_signup") + F.col("n_view")).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert total_from_pivot == load(spark, SF_SMOKE, "events").count()


def test_deterministic_sample_stable_and_sized(spark, queries):
    """Hash sampling: identical output across runs; rate ≈ 0x1a/0x100."""
    a = {r["o_orderkey"]
         for r in queries["q_sample_deterministic"](spark, SF_SMOKE).collect()}
    b = {r["o_orderkey"]
        for r in queries["q_sample_deterministic"](spark, SF_SMOKE).collect()}
    assert a == b
    n = load(spark, SF_SMOKE, "orders").count()
    assert 0.06 * n < len(a) < 0.15 * n, (len(a), n)


def test_stratified_sample_rebalances_views(spark, queries):
    s = queries["q_stratified_sample"](spark, SF_SMOKE)
    rates = {
        r["event_type"]: r["n"]
        for r in s.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    base = {
        r["event_type"]: r["n"]
        for r in load(spark, SF_SMOKE, "events")
        .groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    view_rate = rates.get("view", 0) / base["view"]
    click_rate = rates["click"] / base["click"]
    assert view_rate < 0.12 and click_rate > 0.6, (view_rate, click_rate)


def test_native_sample_rows_bounded(spark):
    """Spark's native seed-dependent sampler (rows-only; not oracle-able)."""
    o = load(spark, SF_SMOKE, "orders")
    n = o.count()
    s = o.sample(fraction=0.1, seed=42).count()
    assert s == o.sample(fraction=0.1, seed=42).count()  # seed-stable
    assert 0.05 * n < s < 0.2 * n


def test_quantiles_ordered(spark, queries):
    for r in queries["q_quantiles"](spark, SF_SMOKE).collect():
        assert r["p25"] <= r["p50"] <= r["p75"] <= r["p99"]


def test_exists_correlated_equals_semi_join(spark, queries):
    """Catalyst's decorrelated EXISTS ≡ the explicit left-semi formulation."""
    sql_keys = {r["s_suppkey"]
                for r in queries["q_exists_correlated"](spark, SF_SMOKE).collect()}
    li = load(spark, SF_SMOKE, "lineitem").filter(F.col("l_quantity") > 49)
    sup = load(spark, SF_SMOKE, "supplier")
    df_keys = {r["s_suppkey"]
               for r in sup.join(li, sup.s_suppkey == li.l_suppkey,
                                 "left_semi").collect()}
    assert sql_keys == df_keys


def test_approx_quantiles_within_tolerance(spark, queries):
    """Sketch quantiles track the exact ones within 1% relative error."""
    exact = {r["l_returnflag"]: (r["p25"], r["p50"], r["p75"])
             for r in queries["q_quantiles"](spark, SF_SMOKE).collect()}
    approx = {r["l_returnflag"]:
              (r["approx_p25"], r["approx_p50"], r["approx_p75"])
              for r in queries["q_approx_quantiles"](spark, SF_SMOKE).collect()}
    for k, (p25, p50, p75) in exact.items():
        for want, got in zip((p25, p50, p75), approx[k]):
            assert abs(got - want) / want < 0.01, (k, want, got)
