"""Semantics tests for the temporal operator family."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from tests.conftest import SF_SMOKE


def test_temporal_join_is_at_most_one_match(spark, queries):
    df = queries["q_temporal_join"](spark, SF_SMOKE).cache()
    probes = (load(spark, SF_SMOKE, "events")
              .filter(F.col("event_type").isin("view", "click")))
    # SCD2 intervals are disjoint: the left join never fans out
    assert df.count() == probes.count()
    # and never leaks the future: matched version started at/before event ts
    ev = probes.select("event_id", F.col("ts").alias("e_ts"))
    pur = (load(spark, SF_SMOKE, "events")
           .filter(F.col("event_type") == "purchase")
           .groupBy("user_id").agg(F.min("ts").alias("first_purchase")))
    early = (df.filter(F.col("version").isNotNull())
             .join(ev, "event_id")
             .join(pur, "user_id")
             .filter(F.col("e_ts") < F.col("first_purchase")))
    assert early.count() == 0
    df.unpersist()


def test_ohlc_invariants(spark, queries):
    df = queries["q_ohlc"](spark, SF_SMOKE).cache()
    # low <= open, close <= high on every bar
    bad = df.filter(
        (F.col("low") > F.col("open")) | (F.col("low") > F.col("close"))
        | (F.col("high") < F.col("open")) | (F.col("high") < F.col("close"))
    )
    assert bad.count() == 0
    # volumes partition the table
    assert (df.agg(F.sum("volume")).collect()[0][0]
            == load(spark, SF_SMOKE, "events").count())
    df.unpersist()


def test_ohlc_single_aggregate_no_window(spark, queries):
    plan = (queries["q_ohlc"](spark, SF_SMOKE)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan  # arg-min/max keys, not row_number
    assert plan.count("Exchange") == 1  # one shuffle: partial->final agg
    assert "partial_min_by" in plan  # map-side combine applies


def test_lateness_audit_counts_are_consistent(spark, queries):
    rows = queries["q_lateness_audit"](spark, SF_SMOKE).collect()
    total = sum(r.n_events for r in rows)
    assert total == load(spark, SF_SMOKE, "events").count()
    for r in rows:
        assert 0 <= r.n_dropped_10m <= r.n_events
        assert r.max_late_us >= 0


def test_transition_matrix_rows_normalize(spark, queries):
    df = queries["q_transition_matrix"](spark, SF_SMOKE)
    per_from = df.groupBy("from_type").agg(
        F.sum("p_ppm").alias("p"), F.sum("n").alias("n"))
    # integer div floors, so each row sums to 1e6 minus at most (k-1)
    for r in per_from.collect():
        assert 1_000_000 - 4 <= r.p <= 1_000_000
    # total transitions = events - distinct users (each user's last event
    # has no successor)
    ev = load(spark, SF_SMOKE, "events")
    expect = ev.count() - ev.select("user_id").distinct().count()
    assert df.agg(F.sum("n")).collect()[0][0] == expect


def test_time_weighted_avg_lies_within_value_range(spark, queries):
    df = queries["q_time_weighted_avg"](spark, SF_SMOKE).cache()
    ev = load(spark, SF_SMOKE, "events")
    rng = (ev.groupBy("user_id")
           .agg(F.min("value").alias("lo"), F.max("value").alias("hi"),
                F.count("*").alias("n")))
    j = df.join(rng, "user_id")
    # a weighted mean can never leave [min, max]
    assert j.filter((F.col("twa_value") < F.col("lo") - 1e-9)
                    | (F.col("twa_value") > F.col("hi") + 1e-9)).count() == 0
    # intervals = events - 1 per surviving user
    assert j.filter(F.col("n_intervals") != F.col("n") - 1).count() == 0
    df.unpersist()
