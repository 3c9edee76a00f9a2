"""Property tests for the extended-aggregate and behavioral operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from tests.conftest import SF_SMOKE


def test_grouping_sets_levels_sum_consistently(spark, queries):
    df = queries["q_grouping_sets"](spark, SF_SMOKE).collect()
    total = [r for r in df if r["g_rf"] == 1 and r["g_ls"] == 1]
    per_rf = [r for r in df if r["g_rf"] == 0 and r["g_ls"] == 1]
    per_both = [r for r in df if r["g_rf"] == 0 and r["g_ls"] == 0]
    assert len(total) == 1
    assert total[0]["n"] == sum(r["n"] for r in per_rf)
    assert total[0]["n"] == sum(r["n"] for r in per_both)
    assert total[0]["n"] == load(spark, SF_SMOKE, "lineitem").count()


def test_minmax_by_names_carry_extreme_balances(spark, queries):
    rows = queries["q_minmax_by"](spark, SF_SMOKE)
    cust = load(spark, SF_SMOKE, "customer")
    joined = (
        rows.join(cust, rows.poorest == cust.c_name)
        .where(F.round(cust.c_acctbal, 2) != rows.min_bal)
    )
    assert joined.count() == 0
    assert rows.filter(F.col("min_bal") > F.col("max_bal")).count() == 0


def test_string_agg_counts_match_group_sizes(spark, queries):
    rows = queries["q_string_agg"](spark, SF_SMOKE).collect()
    for r in rows:
        ids = r["doc_ids"].split(",")
        assert len(ids) == r["n_docs"]
        assert ids == sorted(ids)  # ordered aggregation, zero-padded


def test_count_if_bool_bounds(spark, queries):
    for r in queries["q_count_if_bool"](spark, SF_SMOKE).collect():
        assert 0 <= r["n_high"] <= r["n"]
        # fixture values are uniform in [0, 1000): all non-negative
        assert r["all_nonneg"] is True


def test_histogram_partitions_all_events(spark, queries):
    df = queries["q_histogram"](spark, SF_SMOKE)
    assert df.agg(F.sum("n")).collect()[0][0] == \
        load(spark, SF_SMOKE, "events").count()
    # bucket boundaries contain their min/max
    bad = df.filter(
        (F.col("lo") < F.col("bucket") * 100)
        | (F.col("hi") >= (F.col("bucket") + 1) * 100)
    )
    assert bad.count() == 0


def test_hll_sketch_within_tolerance_of_exact(spark, queries):
    approx = {r["event_type"]: r["approx_users"]
              for r in queries["q_hll_sketch"](spark, SF_SMOKE).collect()}
    exact = (
        load(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    )
    for r in exact:
        assert abs(approx[r["event_type"]] - r["n"]) <= max(2, 0.05 * r["n"])


def test_funnel_stages_shrink_monotonically(spark, queries):
    r = queries["q_funnel"](spark, SF_SMOKE).collect()[0]
    assert r["n_view"] >= r["n_click"] >= r["n_purchase"] >= 0
    n_viewers = (
        load(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == "view")
        .select("user_id").distinct().count()
    )
    assert r["n_view"] == n_viewers


def test_retention_bounded_by_cohort_size(spark, queries):
    for r in queries["q_retention"](spark, SF_SMOKE).collect():
        assert r["ret_d1"] <= r["n_users"]
        assert r["ret_d7"] <= r["n_users"]
    # every user belongs to exactly one cohort
    df = queries["q_retention"](spark, SF_SMOKE)
    total = df.agg(F.sum("n_users")).collect()[0][0]
    users = load(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    assert total == users


def test_cume_dist_ranges_and_quartiles(spark, queries):
    df = queries["q_cume_dist"](spark, SF_SMOKE)
    assert df.filter((F.col("pr_ppm") < 0) | (F.col("pr_ppm") > 1000000)).count() == 0
    assert df.filter((F.col("cd_ppm") <= 0) | (F.col("cd_ppm") > 1000000)).count() == 0
    assert df.filter((F.col("quartile") < 1) | (F.col("quartile") > 4)).count() == 0
    # quartiles within a nation differ by at most 1 in size
    sizes = (df.groupBy("c_nationkey", "quartile").count()
             .groupBy("c_nationkey")
             .agg((F.max("count") - F.min("count")).alias("spread")))
    assert sizes.filter(F.col("spread") > 1).count() == 0


def test_last_ignore_nulls_carry_forward_semantics(spark, queries):
    df = queries["q_last_ignore_nulls"](spark, SF_SMOKE)
    ev = load(spark, SF_SMOKE, "events")
    # users with no purchases have all-NULL carry-forward
    no_purchase = (
        ev.groupBy("user_id")
        .agg(F.count_if(F.col("event_type") == "purchase").alias("np"))
        .filter(F.col("np") == 0)
    )
    leaked = (df.join(no_purchase, "user_id")
              .filter(F.col("last_purchase_value").isNotNull()))
    assert leaked.count() == 0
    # purchase rows carry their own value
    own = (
        df.join(ev.filter(F.col("event_type") == "purchase"),
                ["event_id", "user_id"])
        .filter(F.round(F.col("value"), 2) != F.col("last_purchase_value"))
    )
    assert own.count() == 0


def test_hll_sketches_merge_exactly_like_direct(spark):
    """The 100 TB rollup property, pinned: per-day sketches folded with
    hll_union_agg give the IDENTICAL estimate as sketching the whole
    corpus directly (the sketch algorithm is deterministic — merge is
    lossless with the same lgK)."""
    from flink_tutorial_broadcast_spark.io import load
    ev = load(spark, SF_SMOKE, "events")
    direct = {r.event_type: r.est for r in (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(12))).cast("long").alias("est"))
        .collect())}
    merged = {r.event_type: r.est for r in (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(
            F.hll_union_agg("sk")).cast("long").alias("est"))
        .collect())}
    assert merged == direct
