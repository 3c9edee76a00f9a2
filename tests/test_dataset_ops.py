"""Property tests for the dataset-construction operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from tests.conftest import SF_SMOKE


def test_dataset_split_partitions_the_corpus(spark, queries):
    out = queries["q_dataset_split"](spark, SF_SMOKE).collect()
    n_docs = load(spark, SF_SMOKE, "documents").count()
    assert sum(r.n for r in out) == n_docs
    splits = {r.split for r in out}
    assert splits <= {"train", "val", "test"}
    n_train = sum(r.n for r in out if r.split == "train")
    # md5 prefix < 'cc' ≈ 204/256 ≈ 80% — loose band for small sf
    assert 0.6 * n_docs < n_train < 0.95 * n_docs


def test_dataset_split_is_deterministic(spark, queries):
    a = sorted(map(tuple, queries["q_dataset_split"](spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, queries["q_dataset_split"](spark, SF_SMOKE).collect()))
    assert a == b


def test_snapshot_diff_counts_match_simulation(spark, queries):
    out = {r.change_type: r for r in
           queries["q_snapshot_diff"](spark, SF_SMOKE).collect()}
    base = load(spark, SF_SMOKE, "customer")
    n_del = base.filter(F.col("c_custkey") % 13 == 0).count()
    n_ins = base.filter(F.col("c_custkey") % 17 == 0).count()
    n_upd = base.filter(
        (F.col("c_custkey") % 13 != 0) & (F.col("c_custkey") % 10 == 0)
    ).count()
    assert out["delete"].n == n_del
    assert out["insert"].n == n_ins
    assert out["update"].n == n_upd
    # every update adds exactly +100
    assert abs(out["update"].bal_delta - 100.0 * n_upd) < 1e-6


def test_winsorize_tightens_the_mean_spread(spark, queries):
    rows = queries["q_winsorize"](spark, SF_SMOKE).collect()
    for r in rows:
        assert r.p05 <= r.p95
        # winsorized mean lies within the clamp band
        assert r.p05 - 0.01 <= r.avg_wins <= r.p95 + 0.01


def test_negative_sampling_three_valid_parts_per_anchor(spark, queries):
    out = queries["q_negative_sampling"](spark, SF_SMOKE)
    n_anchors = (
        load(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == "purchase").count()
    )
    assert out.count() == 3 * n_anchors
    # the k=3 guarantee is PER ANCHOR, not just in aggregate: the hash must
    # land in p_partkey's 1-based domain for every (anchor, rank) pair
    per_anchor = out.groupBy("event_id").count()
    assert per_anchor.filter(F.col("count") != 3).count() == 0
    assert per_anchor.count() == n_anchors
    # all sampled keys are real catalog parts (inner join already enforces
    # this; assert the rank domain too)
    ranks = {r.neg_rank for r in out.select("neg_rank").distinct().collect()}
    assert ranks == {0, 1, 2}


def test_class_upsample_balances_minority_langs(spark, queries):
    rows = queries["q_class_upsample"](spark, SF_SMOKE).collect()
    max_orig = max(r.n_orig for r in rows)
    for r in rows:
        assert r.n_upsampled == r.n_orig * r.rep
        assert r.rep >= 1
        # replicated class never overshoots 2× the majority
        assert r.n_upsampled <= 2 * max_orig


def test_pii_redact_strips_every_email(spark, queries):
    out = queries["q_pii_redact"](spark, SF_SMOKE)
    assert out.filter(F.col("redacted").contains("@")).count() == 0
    assert out.filter(F.col("redacted").contains("<EMAIL>")).count() \
        == out.count()
    assert out.filter(F.col("domain") != "example.com").count() == 0


def test_bucketed_range_join_equals_naive_interval_join(spark, queries):
    # two independent plans, same semantics: bucketed equi-join rewrite
    # must reproduce the naive theta join pair-for-pair
    naive = (
        queries["q_interval_join"](spark, SF_SMOKE)
        .groupBy("user_id").agg(F.count("*").alias("n_pairs"))
    )
    bucketed = queries["q_range_join_bucketed"](spark, SF_SMOKE)
    assert naive.exceptAll(bucketed).count() == 0
    assert bucketed.exceptAll(naive).count() == 0


def test_windowed_distinct_dominates_daily_distinct(spark, queries):
    out = {r.day: r.n_users for r in
           queries["q_windowed_distinct"](spark, SF_SMOKE).collect()}
    daily = {
        r.day: r.n for r in (
            load(spark, SF_SMOKE, "events")
            .groupBy(F.to_date("ts").cast("timestamp").alias("day"))
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        )
    }
    assert set(daily) == set(out)
    for day, n in daily.items():
        # a 7-day trailing window can only see MORE distinct users
        assert out[day] >= n


def test_resample_interp_brackets_between_neighbors(spark, queries):
    out = queries["q_resample_interp"](spark, SF_SMOKE)
    ev = load(spark, SF_SMOKE, "events")
    lo, hi = ev.agg(F.min("value"), F.max("value")).first()
    # linear interpolation can never escape the observed value range
    bad = out.filter(
        (F.col("interp_value") < lo - 0.001)
        | (F.col("interp_value") > hi + 0.001)
    ).count()
    assert bad == 0
    # grid timestamps are 12h-aligned
    misaligned = out.filter(
        F.unix_micros("grid_ts") % 43_200_000_000 != 0
    ).count()
    assert misaligned == 0


def test_embed_quantile_norm_rank_space(spark, queries):
    rows = queries["q_embed_quantile_norm"](spark, SF_SMOKE).collect()
    assert all(0.0 <= r.avg_rank <= 1.0 for r in rows)
    dims = {r.dim for r in rows}
    assert dims == set(range(8))


def test_agg_pushdown_join_matches_naive_plan(spark, queries):
    pushed = queries["q_agg_pushdown_join"](spark, SF_SMOKE)
    li = load(spark, SF_SMOKE, "lineitem")
    s = load(spark, SF_SMOKE, "supplier")
    n = load(spark, SF_SMOKE, "nation")
    naive = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )
    j = pushed.alias("p").join(naive.alias("v"), "nation")
    assert j.count() == pushed.count() == naive.count()
    # float tolerance: regrouped summation order differs
    bad = j.filter(
        (F.abs(F.col("p.revenue") - F.col("v.revenue")) > 0.01)
        | (F.col("p.n_items") != F.col("v.n_items"))
    ).count()
    assert bad == 0
    # the whole point: the lineitem aggregate sits BELOW the joins
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_explode_outer_preserves_non_english_docs(spark, queries):
    out = queries["q_explode_outer"](spark, SF_SMOKE)
    docs = load(spark, SF_SMOKE, "documents")
    n_other = docs.filter(F.col("lang") != "en").count()
    assert out.filter(F.col("tok").isNull()).count() == n_other
    assert out.select("doc_id").distinct().count() == docs.count()


def test_range_join_bucketed_plan_has_no_nested_loop(spark, queries):
    df = queries["q_range_join_bucketed"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rolling_median_is_bounded_by_window_extremes(spark, queries):
    out = queries["q_rolling_median"](spark, SF_SMOKE)
    ev = load(spark, SF_SMOKE, "events")
    lo, hi = ev.agg(F.min("value"), F.max("value")).first()
    assert out.filter(
        (F.col("med5") < lo - 1e-9) | (F.col("med5") > hi + 1e-9)
    ).count() == 0
    assert out.count() == ev.count()


def test_autocorr_in_valid_range(spark, queries):
    rows = queries["q_autocorr"](spark, SF_SMOKE).collect()
    assert rows, "expected users with >=10 consecutive pairs"
    assert all(r.ac1 is None or -1.0001 <= r.ac1 <= 1.0001 for r in rows)


def test_array_setops_identities(spark, queries):
    rows = queries["q_array_setops"](spark, SF_SMOKE).collect()
    for r in rows:
        # |A∪B| = |A| + |B| - |A∩B| rearranged: union >= max side
        assert r.n_union >= r.n_inter
        assert r.n_except >= 0
        # |A| = except + inter, and union = |A| + |B| - inter >= |A|
        assert r.n_union >= r.n_except + r.n_inter


def test_regexp_extract_all_counts(spark, queries):
    out = queries["q_regexp_extract_all"](spark, SF_SMOKE)
    # first_long is empty iff no match
    assert out.filter(
        (F.col("n_long") == 0) & (F.col("first_long") != "")
    ).count() == 0
    assert out.filter(
        (F.col("n_long") > 0) & (F.length("first_long") < 6)
    ).count() == 0


def test_nested_struct_scan_prunes_to_read_leaves(spark, queries):
    df = queries["q_nested_struct"](spark, SF_SMOKE)
    ev = load(spark, SF_SMOKE, "events")  # noqa: F841 (keep import used)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the round-trip read must prune to the projected nested leaves:
    # money.odate and cust.geo.nation_key are never read back
    scan = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scan, plan
    assert "odate" not in scan[0]
    assert "nation_key" not in scan[0]


def test_attribution_click_precedes_purchase(spark, queries):
    out = queries["q_attribution"](spark, SF_SMOKE)
    ev = load(spark, SF_SMOKE, "events")
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    # exactly one attribution row per purchase (NULL = organic)
    assert out.count() == n_purch
    assert out.select("purchase_id").distinct().count() == n_purch
    # attributed click really is a click of the same user, ≤24h before
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("c_ts"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts"),
    )
    j = (
        out.filter(F.col("click_id").isNotNull())
        .join(clicks, "click_id").join(purch, "purchase_id")
    )
    assert j.filter(
        (F.col("cu") != F.col("user_id"))
        | (F.col("c_ts") > F.col("p_ts"))
        | (F.col("c_ts") < F.col("p_ts") - F.expr("INTERVAL 1 DAY"))
    ).count() == 0


def test_rfm_quintiles_are_balanced(spark, queries):
    rows = queries["q_rfm"](spark, SF_SMOKE).collect()
    n = len(rows)
    for col in ("r_q", "f_q", "m_q"):
        counts = {}
        for r in rows:
            v = getattr(r, col)
            assert 1 <= v <= 5
            counts[v] = counts.get(v, 0) + 1
        # ntile balance: bucket sizes differ by at most 1
        assert max(counts.values()) - min(counts.values()) <= 1
        assert sum(counts.values()) == n


def test_kmeans_quantized_partitions_corpus_deterministically(spark, queries):
    out = queries["q_kmeans_quantized"](spark, SF_SMOKE)
    rows = out.collect()
    n_vecs = load(spark, SF_SMOKE, "embeddings").count()
    assert sum(r.n_members for r in rows) == n_vecs
    assert len(rows) <= 8
    assert all(0 <= r.cluster < 8 for r in rows)
    again = queries["q_kmeans_quantized"](spark, SF_SMOKE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_mad_outliers_bounded_fraction(spark, queries):
    rows = queries["q_mad_outliers"](spark, SF_SMOKE).collect()
    for r in rows:
        assert r.mad >= 0
        # >3 MAD outliers are by construction a small minority
        assert r.n_outliers <= 0.3 * r.n


def test_text_normalize_is_clean(spark, queries):
    out = queries["q_text_normalize"](spark, SF_SMOKE)
    assert out.filter(F.col("norm_text").rlike("[^a-z0-9 ]")).count() == 0
    assert out.filter(F.col("norm_text").contains("  ")).count() == 0
    assert out.filter(
        F.length("norm_text") != F.col("n_chars_norm")
    ).count() == 0


def test_split_leakage_consistent_with_dedup(spark, queries):
    r = queries["q_split_leakage"](spark, SF_SMOKE).first()
    docs = load(spark, SF_SMOKE, "documents")
    n_texts = docs.select("text").distinct().count()
    assert r.n_distinct_texts == n_texts
    assert 0 <= r.n_leaked_fps <= n_texts
    assert r.n_leaked_docs >= 2 * r.n_leaked_fps or r.n_leaked_fps == 0


def test_cdc_apply_round_trips_with_diff(spark, queries):
    applied = queries["q_cdc_apply"](spark, SF_SMOKE)
    base = load(spark, SF_SMOKE, "customer")
    k = F.col("c_custkey")
    n_base = base.count()
    n_del = base.filter(k % 13 == 0).count()
    n_ins = base.filter(k % 17 == 0).count()
    assert applied.count() == n_base - n_del + n_ins
    # deletes really gone, inserts really present
    assert applied.filter((k % 13 == 0) & (k < 10000000)).count() == 0
    assert applied.filter(k >= 10000000).count() == n_ins
    # updates really applied (+100 on surviving %10 keys)
    upd = (
        applied.filter((k % 10 == 0) & (k % 13 != 0) & (k < 10000000))
        .join(base.select(k.alias("c_custkey"),
                          F.col("c_acctbal").alias("old_bal")), "c_custkey")
    )
    assert upd.filter(
        F.abs(F.col("c_acctbal") - F.col("old_bal") - 100.0) > 0.011
    ).count() == 0


def test_dpp_dynamic_filter_reaches_fact_scan(spark, queries):
    df = queries["q_join_dpp"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the result only contains the three dim days
    days = {r.event_date for r in df.collect()}
    assert days <= {"2024-01-03", "2024-01-10", "2024-01-17"}


def test_analyze_table_feeds_cbo_statistics(spark):
    # CBO surface: ANALYZE TABLE writes catalog stats that the optimizer
    # reads back into plan cost estimates (rowCount in plan stats)
    import shutil
    from urllib.parse import urlparse

    spark.sql("DROP TABLE IF EXISTS nation_stats")
    # a crashed run can leave the location behind without a catalog entry,
    # and CREATE refuses to reuse it — clear the orphan explicitly
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/nation_stats", ignore_errors=True)
    load(spark, SF_SMOKE, "nation").write.saveAsTable("nation_stats")
    spark.sql(
        "ANALYZE TABLE nation_stats COMPUTE STATISTICS FOR ALL COLUMNS")
    n = load(spark, SF_SMOKE, "nation").count()
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        stats = (
            spark.table("nation_stats")
            ._jdf.queryExecution().optimizedPlan().stats()
        )
        # plan-level rowCount comes from the ANALYZE'd catalog stats and
        # is only exposed with CBO on
        assert stats.rowCount().isDefined()
        assert int(str(stats.rowCount().get())) == n
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.sql("DROP TABLE IF EXISTS nation_stats")


def test_zipf_slope_is_negative(spark, queries):
    rows = queries["q_zipf_fit"](spark, SF_SMOKE).collect()
    assert {r.lang for r in rows} == {"en", "de", "es", "fr", "zh"}
    # frequency must fall with rank: slope strictly negative everywhere
    assert all(r.zipf_slope < 0 for r in rows)


def test_share_of_total_sums_to_one_million_per_region(spark, queries):
    rows = queries["q_share_of_total"](spark, SF_SMOKE).collect()
    by_region = {}
    for r in rows:
        by_region.setdefault(r.region_key, []).append(r.share_ppm)
    for region, shares in by_region.items():
        # FLOOR'd ppm shares: total in (1e6 - parts, 1e6]
        assert 1_000_000 - len(shares) < sum(shares) <= 1_000_000


def test_time_to_convert_nonnegative_and_bounded(spark, queries):
    rows = queries["q_time_to_convert"](spark, SF_SMOKE).collect()
    month_us = 31 * 24 * 3600 * 1_000_000
    for r in rows:
        assert 0 <= r.convert_us <= month_us  # fixture spans one month


def test_growth_mom_first_month_null(spark, queries):
    rows = sorted(queries["q_growth_mom"](spark, SF_SMOKE).collect(),
                  key=lambda r: r.month)
    assert rows[0].growth_bps is None
    assert all(r.growth_bps is not None for r in rows[1:])


def test_knn_filtered_respects_label_constraint(spark, queries):
    out = queries["q_knn_filtered"](spark, SF_SMOKE)
    emb = load(spark, SF_SMOKE, "embeddings").select("vec_id", "label")
    probes = emb.withColumnRenamed("vec_id", "p_id") \
                .withColumnRenamed("label", "p_label")
    j = (
        out.join(probes, "p_id")
        .join(emb, "vec_id")
    )
    # every neighbor shares its probe's label, and k<=5 per probe
    assert j.filter(F.col("label") != F.col("p_label")).count() == 0
    per_probe = out.groupBy("p_id").count().collect()
    assert all(r["count"] <= 5 for r in per_probe)


def test_snm_pairs_are_adjacent_and_close(spark, queries):
    out = queries["q_dedup_snm"](spark, SF_SMOKE)
    assert out.filter(F.col("dist") > 3).count() == 0
    # SNM with w=2 emits at most 2 pairs per left record
    per_left = out.groupBy("key_a").count().collect()
    assert all(r["count"] <= 2 for r in per_left)


def test_open_orders_sweep_line_conserves(spark, queries):
    rows = sorted(queries["q_open_orders"](spark, SF_SMOKE).collect(),
                  key=lambda r: r.day)
    # net deltas over all days sum to zero (every order opens and closes)
    assert sum(r.net for r in rows) == 0
    # running count is never negative and ends at zero
    assert all(r.n_open >= 0 for r in rows)
    assert rows[-1].n_open == 0


def test_proration_sums_exactly_to_order_cents(spark, queries):
    out = queries["q_allocate_proration"](spark, SF_SMOKE)
    o = load(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    sums = out.groupBy("l_orderkey").agg(
        F.sum("alloc_cents").alias("total_alloc"))
    j = sums.join(o, "l_orderkey")
    # the invariant: allocations reconstruct the order total EXACTLY
    assert j.filter(F.col("total_alloc") != F.col("cents")).count() == 0
    assert out.filter(F.col("alloc_cents") < 0).count() == 0


def test_benford_low_digits_dominate(spark, queries):
    rows = {r.digit: r for r in queries["q_benford"](spark, SF_SMOKE).collect()}
    total_ppm = sum(r.share_ppm for r in rows.values())
    assert 1_000_000 - 9 < total_ppm <= 1_000_000
    assert set(rows) <= set("123456789")


def test_seasonality_covers_full_grid(spark, queries):
    rows = queries["q_seasonality"](spark, SF_SMOKE).collect()
    assert all(1 <= r.dow <= 7 for r in rows)
    assert all(0 <= r.hod <= 23 for r in rows)
    n_events = load(spark, SF_SMOKE, "events").count()
    assert sum(r.n for r in rows) == n_events


def test_weighted_median_splits_weight_mass(spark, queries):
    out = {r.l_returnflag: r for r in
           queries["q_weighted_median"](spark, SF_SMOKE).collect()}
    li = load(spark, SF_SMOKE, "lineitem")
    for flag, r in out.items():
        below = li.filter(
            (F.col("l_returnflag") == flag)
            & (F.col("l_extendedprice") <= r.weighted_median + 0.011)
        ).agg(F.sum(F.col("l_quantity").cast("long"))).first()[0]
        # at least half the weight sits at or below the weighted median
        assert 2 * below >= r.total_weight


def test_pareto_abc_class_shares(spark, queries):
    rows = {r.abc_class: r for r in
            queries["q_pareto_abc"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"A", "B", "C"}
    total = sum(r.class_cents for r in rows.values())
    # threshold semantics: A stops at 70% of cumulative revenue and A+B
    # at 90%, each within one part's revenue of the boundary (the last
    # part before the cut may stop short of it)
    a = rows["A"].class_cents
    ab = a + rows["B"].class_cents
    assert a <= 0.70 * total
    assert ab <= 0.90 * total
    assert ab + rows["C"].class_cents == total
    # note: fixture revenue is near-uniform, so no 80/20 skew to assert


def test_audience_overlap_jaccard_bounds(spark, queries):
    rows = queries["q_audience_overlap"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.type_a < r.type_b
        assert 0 < r.n_both <= min(r.n_a, r.n_b)
        assert 0 <= r.jaccard_ppm <= 1_000_000


def test_revenue_bridge_conserves_delta(spark, queries):
    rows = queries["q_revenue_bridge"](spark, SF_SMOKE).collect()
    ev = load(spark, SF_SMOKE, "orders")
    m = ev.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
          .alias("cents")).collect()
    by_month = {r.month: r.cents for r in m}
    months = sorted(by_month)
    m1, m0 = months[-1], months[-2]
    want = by_month[m1] - by_month.get(m0, 0)
    # the bridge must decompose the month-over-month change exactly
    assert sum(r.delta_cents for r in rows) == want


def test_text_pipeline_e2e_consistent_with_stages(spark, queries):
    out = queries["q_text_pipeline_e2e"](spark, SF_SMOKE).collect()
    docs = load(spark, SF_SMOKE, "documents")
    n_docs = docs.count()
    # survivors + dropped duplicates account for every document
    total = sum(r.n_docs + r.n_dropped_dups for r in out)
    assert total == n_docs
    assert all(r.n_dropped_dups >= 0 for r in out)
    assert {r.split for r in out} <= {"train", "val", "test"}


def test_stickiness_ratio_bounds(spark, queries):
    rows = queries["q_stickiness"](spark, SF_SMOKE).collect()
    for r in rows:
        assert r.dau <= r.mau
        assert 0 < r.stickiness_ppm <= 1_000_000


def test_percentile_disc_values_are_actual_data_points(spark, queries):
    rows = queries["q_percentile_disc"](spark, SF_SMOKE).collect()
    ev = load(spark, SF_SMOKE, "events")
    for r in rows:
        for v in (r.p50_disc, r.p90_disc):
            assert ev.filter(
                (F.col("event_type") == r.event_type)
                & (F.round("value", 2) == v)
            ).count() > 0, f"{v} is not an observed value"
        assert r.p50_disc <= r.p90_disc


def test_local_maxima_really_dominate_neighbors(spark, queries):
    out = queries["q_local_maxima"](spark, SF_SMOKE)
    n = out.count()
    ev_n = load(spark, SF_SMOKE, "events").count()
    # strict peaks are a minority of any non-monotone series
    assert 0 < n < ev_n / 2


def test_activity_streaks_bounded_by_active_days(spark, queries):
    rows = {r.user_id: r for r in
            queries["q_activity_streaks"](spark, SF_SMOKE).collect()}
    du = (
        load(spark, SF_SMOKE, "events")
        .select("user_id", F.to_date("ts").alias("d")).distinct()
        .groupBy("user_id").agg(F.count("*").alias("n_days")).collect()
    )
    for r in du:
        s = rows[r.user_id]
        assert 1 <= s.longest_streak <= r.n_days
        assert s.n_streaks >= 1
        # streak lengths sum to active days: longest <= days - (n_streaks-1)
        assert s.longest_streak <= r.n_days - (s.n_streaks - 1)


def test_gini_in_unit_interval(spark, queries):
    r = queries["q_gini"](spark, SF_SMOKE).first()
    assert 0.0 <= r.gini <= 1.0
    assert r.n_customers > 0


def test_ab_lift_covers_all_users(spark, queries):
    rows = {r.arm: r for r in queries["q_ab_lift"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"A", "B"}
    n_users = (
        load(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    )
    assert rows["A"].n_users + rows["B"].n_users == n_users
    for r in rows.values():
        assert 0 <= r.n_converted <= r.n_users
        assert 0 <= r.cvr_ppm <= 1_000_000


def test_market_basket_confidence_dominates_support(spark, queries):
    rows = queries["q_market_basket"](spark, SF_SMOKE).collect()
    for r in rows:
        assert r.n_both >= 3
        assert r.part_a < r.part_b
        # confidence = n_both/n_a >= support = n_both/n_orders (n_a <= orders)
        assert r.confidence_a_to_b_ppm >= r.support_ppm


def test_cycle_time_accounts_for_every_order(spark, queries):
    rows = queries["q_cycle_time"](spark, SF_SMOKE).collect()
    # synthetic fixture dates aren't TPC-H-constrained: ship can precede
    # order, so buckets may be negative — only conservation is invariant
    assert all(r.min_days <= r.max_days for r in rows)
    n_orders_with_lines = (
        load(spark, SF_SMOKE, "lineitem").select("l_orderkey")
        .distinct().count()
    )
    assert sum(r.n_orders for r in rows) == n_orders_with_lines


def test_shuffle_hash_hint_pins_plan(spark, queries):
    df = queries["q_join_shuffle_hash"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quartile_banding_partitions_each_segment(spark, queries):
    rows = queries["q_quartile_banding"](spark, SF_SMOKE).collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r.segment, {})[r.band] = r.n
    o = load(spark, SF_SMOKE, "orders")
    c = load(spark, SF_SMOKE, "customer")
    n_orders = o.join(c, o.o_custkey == c.c_custkey).count()
    assert sum(sum(b.values()) for b in by_seg.values()) == n_orders
    for seg, bands in by_seg.items():
        # quartiles: each band holds roughly a quarter (±half, small sf)
        total = sum(bands.values())
        for band, n in bands.items():
            assert n <= 0.6 * total, (seg, band, n, total)


def test_topn_with_ties_keeps_all_podium_rows(spark, queries):
    out = queries["q_topn_with_ties"](spark, SF_SMOKE)
    rows = out.collect()
    assert all(1 <= r.rnk <= 3 for r in rows)
    # with-ties: every group has AT LEAST 3 rows (row_number would cap at 3)
    sizes = out.groupBy("segment").count().collect()
    assert all(r["count"] >= 3 for r in sizes)


def test_epoch_shuffle_partitions_and_reshuffles(spark, queries):
    rows = queries["q_epoch_shuffle"](spark, SF_SMOKE).collect()
    docs = load(spark, SF_SMOKE, "documents")
    n_docs = docs.count()
    # shards partition the corpus: counts and id-checksums conserve
    assert sum(r.n_docs for r in rows) == n_docs
    total_ids = docs.agg(F.sum("doc_id")).collect()[0][0]
    assert sum(r.id_checksum for r in rows) == total_ids
    # every shard full (64) except possibly the last
    sizes = sorted((r.shard, r.n_docs) for r in rows)
    assert all(n == 64 for _, n in sizes[:-1])
    # epoch-2 is a genuinely different permutation: same-shard collisions
    # stay near the 64/n_docs expectation, far below identity
    same = sum(r.n_same_shard for r in rows)
    assert same < 0.5 * n_docs, same


def test_domain_token_cap_keeps_ordered_prefix_per_source(spark, queries):
    out = queries["q_domain_token_cap"](spark, SF_SMOKE).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    docs = (load(spark, SF_SMOKE, "documents")
            .select("source", "doc_id",
                    F.size(F.split("text", " ")).alias("n_tokens"))
            .collect())
    all_by_src: dict[str, list] = {}
    for r in docs:
        all_by_src.setdefault(r.source, []).append(r)
    for src, kept in by_src.items():
        kept.sort(key=lambda r: r.doc_id)
        # budget respected and cum matches a running sum
        cum = 0
        for r in kept:
            cum += r.n_tokens
            assert r.cum_tokens == cum <= 800
        # kept set is exactly the maximal doc_id-ordered prefix
        full = sorted(all_by_src[src], key=lambda r: r.doc_id)
        cum, prefix = 0, []
        for r in full:
            cum += r.n_tokens
            if cum > 800:
                break
            prefix.append(r.doc_id)
        assert [r.doc_id for r in kept] == prefix


def test_curriculum_interleave_is_round_robin(spark, queries):
    out = sorted(queries["q_curriculum_interleave"](spark, SF_SMOKE).collect(),
                 key=lambda r: r.position)
    n = len(out)
    n_src = len({r.source for r in out})
    # positions are a 1..n permutation
    assert [r.position for r in out] == list(range(1, n + 1))
    # the first full round touches every source exactly once, in order
    first_round = out[:n_src]
    assert {r.source for r in first_round} == {r.source for r in out}
    assert all(r.rank_in_source == 1 for r in first_round)
    # rank_in_source is non-decreasing along the curriculum
    ranks = [r.rank_in_source for r in out]
    assert ranks == sorted(ranks)


def test_cms_estimates_never_undercount(spark, queries):
    rows = queries["q_cms_frequency"](spark, SF_SMOKE).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cms_est >= r.exact_cnt
        assert r.is_overestimate


def test_mixture_pipeline_conserves_capped_docs(spark, queries):
    """The shard manifest must partition exactly the capped subset:
    doc/token totals equal q_domain_token_cap's, every shard but the
    last holds exactly 16 docs."""
    shards = sorted(queries["q_mixture_pipeline"](spark, SF_SMOKE).collect(),
                    key=lambda r: r.shard)
    capped = queries["q_domain_token_cap"](spark, SF_SMOKE).collect()
    assert sum(r.n_docs for r in shards) == len(capped)
    assert sum(r.tok_sum for r in shards) == sum(r.n_tokens for r in capped)
    assert (sum(r.id_checksum for r in shards)
            == sum(r.doc_id for r in capped))
    assert [r.shard for r in shards] == list(range(len(shards)))
    assert all(r.n_docs == 16 for r in shards[:-1])
