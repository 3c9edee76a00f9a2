"""Semantics tests for the embedding-compression operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from tests.conftest import SF_SMOKE


def _long_form(spark):
    return (
        load(spark, SF_SMOKE, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("pos", "vf"))
        .select("vec_id", "pos", F.col("vf").cast("double").alias("v"))
    )


def test_quantize_codes_in_range_and_reconstruction_bounded(spark, queries):
    codes = queries["q_embed_quantize"](spark, SF_SMOKE)
    emb = load(spark, SF_SMOKE, "embeddings")
    assert codes.count() == emb.count() * 64
    assert codes.filter((F.col("code") < 0) | (F.col("code") > 255)).count() == 0
    # dequantize with the same codebook: |x - x̂| <= cell width
    x = _long_form(spark)
    stats = x.groupBy("pos").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    joined = (codes.join(x, ["vec_id", "pos"]).join(stats, "pos")
              .withColumn("cell", (F.col("mx") - F.col("mn")) / 256)
              .withColumn("xhat",
                          F.col("mn") + (F.col("code") + 0.5) * F.col("cell")))
    bad = joined.filter(
        F.abs(F.col("v") - F.col("xhat")) > F.col("cell") * 0.5001)
    assert bad.count() == 0


def test_quantize_fact_side_never_shuffles(spark, queries):
    plan = (queries["q_embed_quantize"](spark, SF_SMOKE)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    # the only hash exchange feeds the 64-row codebook aggregate
    fact_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "vec_id" in ln
    ]
    assert fact_exchanges == []


def test_random_projection_preserves_norms_on_average(spark, queries):
    proj = queries["q_random_projection"](spark, SF_SMOKE)
    # JL with ±1/√64 entries and 16 output dims: E[‖y‖²] = ‖x‖²·(16/64).
    # Check the corpus-level ratio is within 20% of 0.25.
    py = (proj.groupBy("vec_id").agg(F.sum(F.col("y") * F.col("y")).alias("ny"))
          .agg(F.avg("ny")).collect()[0][0])
    x = _long_form(spark)
    px = (x.groupBy("vec_id").agg(F.sum(F.col("v") * F.col("v")).alias("nx"))
          .agg(F.avg("nx")).collect()[0][0])
    ratio = py / (px * 16.0 / 64.0)
    assert 0.8 < ratio < 1.2
    # exactly 16 output dims per vector
    shape = proj.groupBy("vec_id").count()
    assert shape.filter(F.col("count") != 16).count() == 0


def test_bucketed_vector_dedup_equals_direct_group(spark, queries):
    """Tier-1 hash bucketing must be a pure prefix: (bucket, embedding)
    grouping yields exactly the groups of GROUP BY embedding."""
    direct = queries["q_dedup_vectors"](spark, SF_SMOKE).collect()[0]
    tiered = queries["q_dedup_vectors_bucketed"](spark, SF_SMOKE).collect()[0]
    assert tiered.n_unique_vectors == direct.n_unique_vectors
    assert tiered.n_exact_dupes == direct.n_exact_dupes
    assert tiered.keeper_checksum == direct.keeper_checksum
