"""Property tests for format connectors and statistical extensions."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from tests.conftest import SF_SMOKE


def test_csv_roundtrip_lossless(spark, queries):
    back = queries["q_scan_csv"](spark, SF_SMOKE)
    src = load(spark, SF_SMOKE, "nation")
    assert back.count() == src.count()
    assert back.exceptAll(
        src.select("n_nationkey", "n_name", "n_regionkey")).count() == 0


def test_partitioned_prune_reads_one_day_only(spark, queries):
    df = queries["q_partitioned_prune"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    total = df.agg(F.sum("n")).collect()[0][0]
    expected = (
        load(spark, SF_SMOKE, "events")
        .filter(F.to_date("ts") == "2024-01-05").count()
    )
    assert total == expected


def test_merge_upsert_counts_and_update_semantics(spark, queries):
    merged = queries["q_merge_upsert"](spark, SF_SMOKE)
    base = load(spark, SF_SMOKE, "customer")
    n_base = base.count()
    n_new = base.filter(F.col("c_custkey") % 17 == 0).count()
    assert merged.count() == n_base + n_new
    # every 10th customer gained exactly +100
    upd = (
        merged.withColumnRenamed("c_acctbal", "bal_new")
        .join(base.select("c_custkey",
                          F.round("c_acctbal", 2).alias("bal_old")),
              "c_custkey")
        .filter(F.col("c_custkey") % 10 == 0)
        .filter(F.abs(F.col("bal_new") - F.col("bal_old") - 100) > 0.011)
    )
    assert upd.count() == 0
    assert merged.filter(F.col("c_name").startswith("NEW#")).count() == n_new


def test_nth_value_null_for_small_customers(spark, queries):
    df = queries["q_nth_value"](spark, SF_SMOKE)
    sizes = (load(spark, SF_SMOKE, "orders")
             .groupBy("o_custkey").count())
    small = sizes.filter(F.col("count") < 3)
    leaked = (df.join(small, "o_custkey")
              .filter(F.col("third_order_price").isNotNull()))
    assert leaked.count() == 0
    big = sizes.filter(F.col("count") >= 3)
    holes = (df.join(big, "o_custkey")
             .filter(F.col("third_order_price").isNull()))
    assert holes.count() == 0


def test_entropy_bounds(spark, queries):
    df = queries["q_entropy"](spark, SF_SMOKE)
    import math
    # 0 <= H <= ln(5) for 5 event types
    assert df.filter(F.col("entropy") < -1e-9).count() == 0
    assert df.filter(F.col("entropy") > math.log(5) + 1e-9).count() == 0
    # single-event users have exactly zero entropy
    assert df.filter((F.col("n_events") == 1)
                     & (F.col("entropy") != 0.0)).count() == 0


def test_embed_centroid_dense_grid(spark, queries):
    df = queries["q_embed_centroid"](spark, SF_SMOKE)
    labels = (load(spark, SF_SMOKE, "embeddings")
              .select("label").distinct().count())
    assert df.count() == labels * 64
    assert df.groupBy("label").count().filter(
        F.col("count") != 64).count() == 0


def test_custom_source_parallelism_and_rows(spark, queries):
    df = queries["q_scan_custom_source"](spark, SF_SMOKE)
    from flink_tutorial_broadcast_spark.sources.rules import RULES
    assert df.rdd.getNumPartitions() == len(RULES)
    got = {(r["rule_event_type"], r["threshold"], r["severity"])
           for r in df.collect()}
    assert got == set(RULES)


def test_schema_evolution_null_fills_old_generation(spark, queries):
    df = queries["q_schema_evolution"](spark, SF_SMOKE).cache()
    from flink_tutorial_broadcast_spark.io import load
    assert df.count() == load(spark, SF_SMOKE, "customer").count()
    # gen-1 rows (written without the column) read back as NULL;
    # gen-2 rows keep their value
    assert df.filter((F.col("gen") == 1)
                     & F.col("c_nationkey").isNotNull()).count() == 0
    assert df.filter((F.col("gen") == 2)
                     & F.col("c_nationkey").isNull()).count() == 0
    df.unpersist()


def test_psi_drift_small_for_identically_distributed_halves(spark, queries):
    rows = queries["q_psi_drift"](spark, SF_SMOKE).collect()
    assert 1 <= len(rows) <= 10
    n_events = load(spark, SF_SMOKE, "events").count()
    assert sum(r.n_a + r.n_b for r in rows) == n_events
    # both halves draw from the same distribution: PSI must read 'stable'
    assert sum(abs(r.psi_term) for r in rows) < 0.05


def test_weighted_sample_favors_heavy_docs(spark, queries):
    """A-ES weighted sampling: selection is deterministic, k=20, and the
    selected docs' mean weight exceeds the corpus mean (P(select) ∝ w)."""
    from flink_tutorial_broadcast_spark.io import load
    from tests.conftest import SF_SMOKE

    a = sorted(r.doc_id for r in
               queries["q_weighted_sample"](spark, SF_SMOKE).collect())
    b = sorted(r.doc_id for r in
               queries["q_weighted_sample"](spark, SF_SMOKE).collect())
    assert a == b and len(a) == 20
    docs = load(spark, SF_SMOKE, "documents").collect()
    mean_all = sum(d.n_chars for d in docs) / len(docs)
    sel = {d.doc_id: d.n_chars for d in docs if d.doc_id in set(a)}
    mean_sel = sum(sel.values()) / len(sel)
    assert mean_sel > mean_all
