"""Runnable 100 TB-layout evidence (docs/scale.md "Data layout").

The fixtures are single unpartitioned files, so the scale-critical layout
behaviors — partition pruning, dynamic partition pruning, exchange-free
bucketed joins — can't show up in the main query plans. This module writes
small partitioned/bucketed copies of the fixtures to a temp dir and proves
each behavior from the executed physical plan:

1. **Static partition pruning** — a day-partitioned copy of `events`
   filtered to one day scans 1 of 30 partitions (plan carries the
   partition filter; the scan's partition count is 1).
2. **Dynamic partition pruning** — joining the day-partitioned fact to a
   filtered dim injects `dynamicpruningexpression(...)` into the fact
   scan: at 100 TB the fact side is pruned by the dim filter at runtime.
3. **Bucketed co-located join** — `orders` and `lineitem` bucketed 8-way
   on orderkey sort-merge-join with NO Exchange in the plan: at scale the
   shuffle (the dominant cost of big-big joins) disappears at write time.

Usage:  python -m flink_tutorial_broadcast_spark.plans.layout_demo
Asserted in tests/test_layout.py.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.001")


def _executed_plan(df) -> str:
    df.collect()  # AQE: final plan only exists post-execution
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_num_files(df) -> int:
    """Execute ``df`` and read the file-scan's ``numFiles`` SQL metric —
    the number of files the reader actually opened (post-pruning)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    if plan.nodeName() == "AdaptiveSparkPlan":
        plan = plan.executedPlan()
    leaves = plan.collectLeaves()
    for i in range(leaves.size()):
        metrics = leaves.apply(i).metrics()
        if metrics.contains("numFiles"):
            return int(metrics.apply("numFiles").value())
    raise AssertionError("no file scan in plan")


def demo_partition_pruning(spark: SparkSession, workdir: str) -> str:
    """Write events day-partitioned; filter to one day; prove pruning."""
    path = f"{workdir}/events_by_day"
    (load(spark, SF_DIR, "events")
     .withColumn("day", F.to_date("ts"))
     .write.mode("overwrite").partitionBy("day").parquet(path))
    # shuffle-free projections so the scan is the plan's leaf
    base = spark.read.parquet(path).select("event_id", "event_type", "day")
    plan = _executed_plan(base.filter(F.col("day") == "2024-01-05"))
    scan = next(ln for ln in plan.splitlines() if "FileScan" in ln)
    if "PartitionFilters" not in scan:
        raise AssertionError(f"no partition filter pushed:\n{scan}")
    n_pruned = _scan_num_files(base.filter(F.col("day") == "2024-01-05"))
    n_total = _scan_num_files(base)
    if not n_pruned < n_total / 5:
        raise AssertionError(
            f"pruning ineffective: {n_pruned}/{n_total} files")
    return (f"partition pruning: scan reads {n_pruned}/{n_total} files "
            f"for a 1-day filter")


def demo_dynamic_partition_pruning(spark: SparkSession, workdir: str) -> str:
    """Fact partitioned by day ⋈ dim filtered on a non-key column → the
    fact scan carries a runtime dynamicpruning subquery."""
    path = f"{workdir}/events_by_day"  # written by demo_partition_pruning
    fact = spark.read.parquet(path)
    dim = (load(spark, SF_DIR, "events")
           .select(F.to_date("ts").alias("day"), "event_type")
           .filter(F.col("event_type") == "purchase")
           .groupBy("day").agg(F.count("*").alias("n_purchases"))
           .filter(F.col("n_purchases") > 18))
    joined = fact.join(dim, "day").groupBy("event_type").count()
    # DPP decision happens at planning; read it from the optimized plan
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "dynamicpruning" not in plan.lower():
        raise AssertionError(f"no dynamic partition pruning:\n{plan}")
    return "dynamic partition pruning: fact scan filtered by dim-side subquery"


def demo_bucketed_join(spark: SparkSession, workdir: str) -> str:
    """8-bucket orderkey layout on both join sides → SMJ with no Exchange."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS layout_demo "
              f"LOCATION '{workdir}/warehouse'")
    for table, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (load(spark, SF_DIR, table)
         .write.mode("overwrite")
         .bucketBy(8, key).sortBy(key)
         .saveAsTable(f"layout_demo.{table}_bucketed"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.sql("""
            SELECT o.o_orderkey, o.o_totalprice, COUNT(*) AS n_items
            FROM layout_demo.orders_bucketed o
            JOIN layout_demo.lineitem_bucketed l
              ON o.o_orderkey = l.l_orderkey
            GROUP BY 1, 2
        """)
        plan = _executed_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    if "SortMergeJoin" not in plan:
        raise AssertionError(f"expected sort-merge join:\n{plan}")
    join_section = plan.split("SortMergeJoin")[1]
    if "Exchange" in join_section:
        raise AssertionError(
            f"bucketed join still shuffles:\n{plan}")
    return "bucketed join: SMJ with zero Exchange below the join (co-located read)"


def run_all(spark: SparkSession) -> list[str]:
    workdir = tempfile.mkdtemp(prefix="spark_graft_layout_")
    try:
        results = [
            demo_partition_pruning(spark, workdir),
            demo_dynamic_partition_pruning(spark, workdir),
            demo_bucketed_join(spark, workdir),
        ]
    finally:
        spark.sql("DROP DATABASE IF EXISTS layout_demo CASCADE")
        shutil.rmtree(workdir, ignore_errors=True)
    return results


if __name__ == "__main__":
    from flink_tutorial_broadcast_spark.session import get_spark
    s = get_spark("layout-demo")
    s.sparkContext.setLogLevel("ERROR")
    for line in run_all(s):
        print("ok:", line)
