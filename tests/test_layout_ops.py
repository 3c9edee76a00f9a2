"""Plan-shape and semantics tests for the layout-aware join queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from tests.conftest import SF_SMOKE


def test_salted_join_plan_has_composite_shuffle_keys(spark, queries):
    df = queries["q_join_salted"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__salt__" in plan  # shuffle spreads (key, salt), not key


def test_bucketed_join_is_exchange_free(spark, queries):
    df = queries["q_join_bucketed"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # the ONLY exchange is the post-join aggregation on o_orderpriority;
    # neither join input re-shuffles on the join key
    join_key_exchanges = [
        line for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
        and ("o_custkey" in line or "c_custkey" in line)
    ]
    assert join_key_exchanges == []


def test_dedup_keep_best_prefers_longest_then_lowest_id(spark, queries):
    df = queries["q_dedup_keep_best"](spark, SF_SMOKE)
    docs = load(spark, SF_SMOKE, "documents")
    # survivor count equals distinct content count
    assert df.count() == docs.select(F.md5("text")).distinct().count()
    # each kept doc really has its group's max length
    kept = df.join(
        docs.select(F.col("doc_id").alias("kept_doc_id"), "n_chars"),
        "kept_doc_id")
    assert kept.filter(F.col("n_chars") != F.col("best_chars")).count() == 0
    # total group sizes account for every document
    assert df.agg(F.sum("group_size")).collect()[0][0] == docs.count()


def test_bloom_filter_injected_under_scoped_confs(spark, queries):
    from flink_tutorial_broadcast_spark.operators.layout_ops import (
        _BLOOM_CONFS, _bloom_join)
    old = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        df = _bloom_join(spark, SF_SMOKE)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "bloom" in plan.lower()
    finally:
        for k, v in old.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
    # the public query restores thresholds after materializing
    queries["q_bloom_filter_join"](spark, SF_SMOKE).count()
    assert spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    ) != "0"


def test_compact_small_files_reduces_file_count(spark, queries):
    import glob
    import tempfile

    df = queries["q_compact_small_files"](spark, SF_SMOKE)
    tag = SF_SMOKE.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    base = f"{tempfile.gettempdir()}/ftbs_compact_{tag}"
    n_frag = len(glob.glob(f"{base}/frag/part-*.parquet"))
    n_compact = len(glob.glob(f"{base}/compact/part-*.parquet"))
    assert n_frag > n_compact
    assert n_compact <= 4
    # content preserved
    from flink_tutorial_broadcast_spark.io import load
    assert df.count() == load(spark, SF_SMOKE, "documents").count()


def test_join_dpp_restores_session_conf(spark, queries):
    """The partition-type-inference conf is scoped to the partitioned
    read inside q_join_dpp — after the query runs, the session value
    must be back to what the caller had (order-independence for any
    later partitioned-parquet reads)."""
    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    before = spark.conf.get(key)
    queries["q_join_dpp"](spark, SF_SMOKE).count()
    assert spark.conf.get(key) == before
    # and a subsequent partitioned read still behaves (types inferred
    # per the restored conf, rows correct)
    assert queries["q_partitioned_prune"](spark, SF_SMOKE).count() > 0
