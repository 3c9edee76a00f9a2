"""SparkSession builder with the engine's execution defaults.

Design notes (SURVEY.md §4): the reference (Flink DataStream tutorial) has
no optimizer — its user program IS the plan. Here we lean on Catalyst and
fix only the knobs that matter for oracle parity and 100 TB posture:

- AQE on (runtime re-plan, skew-join split, shuffle-partition coalescing).
- ``spark.sql.session.timeZone=UTC`` — fixture timestamps are tz-naive;
  DuckDB reads them as-is, so UTC pinning prevents value-hash divergence.
- Arrow on for pandas UDF / toPandas transfer (vectorized Py<->JVM).
- ``spark.sql.shuffle.partitions`` sized for local[32]; on a real cluster
  AQE coalescing makes the initial number mostly irrelevant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB these would be set per-cluster; they are safe local defaults and
# every one of them scales (AQE re-plans with runtime stats).
ENGINE_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Arrow-vectorize Python UDF/UDTF evaluation (row-pickling is the slow
    # path; these move even the J1/J4 demos onto Arrow batches)
    "spark.sql.execution.pythonUDF.arrow.enabled": "true",
    "spark.sql.execution.pythonUDTF.arrow.enabled": "true",
    # fixtures' events.ts is timestamp[ns] — an illegal parquet type for
    # Spark's reader; read the raw int64 nanos and convert in io.load()
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
    # Parallelism floors for small inputs (r13, guide §2.2/§6.1). Both
    # knobs are SIZE-adaptive, not cluster constants:
    # - scan splits: maxSplitBytes = min(maxPartitionBytes,
    #   max(openCostInBytes, bytes/defaultParallelism)). The 4 MB default
    #   open-cost packs every sub-128 MB fixture into 1-3 splits, so all
    #   map-side work (explode fan-out, md5 hashing, broadcast-join
    #   probes) ran on 1-3 of the 32 cores. At real scale
    #   bytes/parallelism >> openCost and the floor is inert; it only
    #   bites when the input is smaller than cores x 128 KB — exactly
    #   when the extra splits are free parallelism. Measured at sf0.1:
    #   q_tpch_q9 0.95->0.70 s, q_broadcast_rule_join 0.75->0.62 s.
    # - post-shuffle AQE coalescing: parallelismFirst targets
    #   defaultParallelism but never below minPartitionSize (default
    #   1 MB), which coalesced CPU-heavy fan-out stages (PPJoin candidate
    #   generation) to 4 partitions. 256 KB keeps small-but-expensive
    #   stages wide without drowning iterative many-stage queries in
    #   micro-tasks (sweep at sf0.1: q_setsim_join 7.8->4.9 s,
    #   q_dedup_simhash_portable best at 256k, q_pagerank ~flat); large
    #   stages are unaffected (their partitions are >> 1 MB anyway).
    "spark.sql.files.openCostInBytes":
        os.environ.get("SPARK_GRAFT_OPEN_COST", str(128 * 1024)),
    "spark.sql.adaptive.coalescePartitions.minPartitionSize":
        os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "256k"),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(app_name: str = "flink-tutorial-broadcast-spark",
              master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default ``*``)
    so tests/bench share one code path with the driver harness.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(ENGINE_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def release_cached_blocks(spark: SparkSession) -> int:
    """Unpersist every persistent RDD (localCheckpoint blocks, stray
    caches) plus the DataFrame cache; returns how many RDDs were freed.

    Some query builders eagerly ``localCheckpoint()`` shared subplans (a
    measured 3× win where ReusedExchange can't dedupe them — see
    graph_setsim/llm_ops). Those blocks live until the JVM reference is
    GC'd, so a long-lived session that builds thousands of DataFrames
    (bench warm passes, the oracle sweep, pytest) accumulates executor
    storage. Harness loops call this BETWEEN queries: each builder call
    constructs and re-checkpoints its own DataFrames, so freeing the
    previous query's blocks never invalidates live results — only
    DataFrames the caller is still holding onto would recompute.
    """
    rdds = spark.sparkContext._jsc.getPersistentRDDs()  # py4j MapConverter
    n = 0
    for rdd in list(rdds.values()):
        rdd.unpersist(False)
        n += 1
    spark.catalog.clearCache()
    return n


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an externally-created session.

    The driver passes its own SparkSession to ``entry``/``queries`` — we
    cannot rebuild it, but session-level confs (timezone, AQE, Arrow) are
    settable post-hoc and are required for oracle hash parity.
    """
    for k, v in ENGINE_CONF.items():
        if k.startswith(("spark.sql.",)):
            try:
                spark.conf.set(k, v)
            except Exception:  # immutable conf on this build — best effort
                pass
    return spark
