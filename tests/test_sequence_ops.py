"""Property tests for CEP-pattern, gap-fill, anomaly, and band-filter ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from tests.conftest import SF_SMOKE


def test_sequence_pattern_users_have_all_three_stages(spark, queries):
    df = queries["q_sequence_pattern"](spark, SF_SMOKE)
    assert df.filter(F.col("n_matches") < 1).count() == 0
    # a strict-contiguity match implies the user has all three types
    ev = load(spark, SF_SMOKE, "events")
    stages = (
        ev.filter(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("k"))
        .filter(F.col("k") == 3)
    )
    missing = df.join(stages, "user_id", "left_anti")
    assert missing.count() == 0


def test_gap_fill_grid_is_dense_and_total_preserving(spark, queries):
    df = queries["q_gap_fill"](spark, SF_SMOKE)
    ev = load(spark, SF_SMOKE, "events")
    n_days = (
        ev.agg(
            (F.datediff(F.to_date(F.max("ts")), F.to_date(F.min("ts"))) + 1)
        ).collect()[0][0]
    )
    n_types = ev.select("event_type").distinct().count()
    assert df.count() == n_days * n_types
    assert df.agg(F.sum("n")).collect()[0][0] == ev.count()


def test_anomaly_zscore_flags_are_beyond_threshold(spark, queries):
    df = queries["q_anomaly_zscore"](spark, SF_SMOKE)
    assert df.count() > 0
    assert df.filter(F.col("z_x100") < 170).count() == 0
    # flagged orders are a strict subset
    assert df.count() < load(spark, SF_SMOKE, "orders").count()


def test_length_band_filter_keeps_interior_mass(spark, queries):
    rows = queries["q_length_band_filter"](spark, SF_SMOKE).collect()
    docs = load(spark, SF_SMOKE, "documents")
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for r in rows:
        # p05..p95 band keeps ~90% of each language
        assert 0.7 * totals[r["lang"]] <= r["n_kept"] <= totals[r["lang"]]
        assert r["lo_band"] <= r["avg_chars"] <= r["hi_band"] + 1


def test_ewma_bounded_by_min_max_of_user_values(spark, queries):
    df = queries["q_ewma"](spark, SF_SMOKE)
    ev = load(spark, SF_SMOKE, "events")
    bounds = ev.groupBy("user_id").agg(F.min("value").alias("lo"),
                                       F.max("value").alias("hi"))
    # a convex combination of the inputs can never leave their range
    bad = (df.join(bounds, "user_id")
           .filter((F.col("ewma") < F.col("lo") - 1e-3)
                   | (F.col("ewma") > F.col("hi") + 1e-3)))
    assert bad.count() == 0
