"""Skew handling: salted-join equivalence + AQE skew-split evidence."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from flink_tutorial_broadcast_spark.operators.skew import salted_join
from tests.conftest import SF_SMOKE


def _skewed_frames(spark):
    """A big frame where 80% of rows share one hot key, plus a small dim."""
    ev = load(spark, SF_SMOKE, "events")
    big = ev.withColumn(
        "skew_key",
        F.when(F.col("event_id") % 5 != 0, F.lit(1))  # hot key: ~80% of rows
        .otherwise(F.pmod(F.col("event_id"), F.lit(50))))
    small = spark.range(50).select(
        F.col("id").alias("dim_key"),
        (F.col("id") * 10).alias("dim_payload"))
    return big, small


def test_salted_join_matches_plain_join(spark):
    big, small = _skewed_frames(spark)
    plain = big.join(small, big.skew_key == small.dim_key, "inner")
    salted = salted_join(big, small, "skew_key", "dim_key", n_salts=8)
    assert salted.count() == plain.count()
    agg_plain = {r["skew_key"]: (r["n"], r["s"]) for r in
                 plain.groupBy("skew_key")
                 .agg(F.count("*").alias("n"),
                      F.sum("dim_payload").alias("s")).collect()}
    agg_salted = {r["skew_key"]: (r["n"], r["s"]) for r in
                  salted.groupBy("skew_key")
                  .agg(F.count("*").alias("n"),
                       F.sum("dim_payload").alias("s")).collect()}
    assert agg_plain == agg_salted


def test_salt_actually_spreads_hot_key(spark):
    """The hot key's rows must occupy every salt bucket, not one."""
    big, _ = _skewed_frames(spark)
    n_buckets = (
        big.filter(F.col("skew_key") == 1)
        .select(F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                       F.lit(8)).alias("salt"))
        .distinct().count()
    )
    assert n_buckets == 8


def test_aqe_skew_split_fires_and_matches_salted(spark):
    """Round-4 completion of the skew story: with mapper fan-out restored
    (round-robin repartition standing in for a cluster's thousands of
    mappers) and thresholds scaled to local volume, AQE must actually
    SPLIT the hot partition — the executed plan's shuffle read carries
    the skew marker — and the plain / AQE-split / salted variants must
    agree exactly. tools/skew_demo.py runs the same comparison at stress
    scale for BASELINE.md."""
    import os
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    import skew_demo as D

    fact, dim = D.skewed_frames(spark, SF_SMOKE, k=32)
    tiny = dict(D.SKEW_ON, **{
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
    })
    tiny_off = dict(tiny,
                    **{"spark.sql.adaptive.skewJoin.enabled": "false"})
    plain, _ = D.run_variant(spark, fact, dim, tiny_off, salted=False)
    skewed, plan = D.run_variant(spark, fact, dim, tiny, salted=False)
    salted, _ = D.run_variant(spark, fact, dim, tiny_off, salted=True)
    assert skewed["skew_marker"] > 0, plan[:2000]
    assert plain["n"] == skewed["n"] == salted["n"]
    assert abs(plain["s"] - skewed["s"]) < 1e-6
    assert abs(plain["s"] - salted["s"]) < 1e-6


def test_aqe_runtime_replan_coalesces_shuffle(spark):
    """AQE's runtime re-plan is live: a shuffle join over the fixtures gets
    its 32 shuffle partitions coalesced from runtime statistics (the same
    machinery that performs skew-join splits at cluster scale — the split
    itself needs multi-mapper shuffles, which single-file local fixtures
    cannot produce, so the engine's deterministic mitigation for extreme
    skew is `salted_join`, proven above)."""
    confs = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big, small = _skewed_frames(spark)
        other = (load(spark, SF_SMOKE, "orders")
                 .select(F.pmod(F.col("o_orderkey"), F.lit(50))
                         .alias("r_key"), "o_totalprice"))
        joined = big.join(other, big.skew_key == other.r_key).agg(
            F.count("*").alias("n"))
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan[:2000]
