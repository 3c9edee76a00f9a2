"""Layout-aware join strategies as oracle-checked queries: salted skew
join, bucketed exchange-free join, and policy-driven dedup.

Elevates the utilities that were previously test-only (SURVEY.md §2 L15,
layout proofs in plans/layout_demo.py) into first-class `queries()`
entries: each strategy must produce EXACTLY the rows of its naive
formulation — the oracle SQL is the naive join — while its plan carries
the scale property (salt-spread shuffle keys, no Exchange before the
join, single agg pass).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from flink_tutorial_broadcast_spark.operators.skew import salted_join
from flink_tutorial_broadcast_spark.registry import query
from flink_tutorial_broadcast_spark.sources.rules import RULES_SQL, rules_df


@query(
    "q_join_salted",
    oracle=f"""
    SELECT e.event_type, COUNT(*) AS n, ROUND(SUM(e.value), 2) AS sum_value
    FROM events e JOIN {RULES_SQL}
      ON e.event_type = rules.rule_event_type
    WHERE e.value > rules.threshold
    GROUP BY e.event_type
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join, semantics-checked against the plain join.

    `events.event_type` is the pathological shuffle key (5 distinct
    values → 5 tasks do all the work in a naive shuffle join). Salting
    spreads each hot key across 16 (key, salt) shuffle partitions; the
    oracle is the UNSALTED join, so the hash check IS the proof that
    salting preserves semantics. At 100 TB this is the fallback when
    AQE's skew split can't break one mega-key.
    """
    ev = load(spark, sf_dir, "events")
    joined = salted_join(ev, rules_df(spark), "event_type",
                         "rule_event_type", n_salts=16)
    return (
        joined.filter(F.col("value") > F.col("threshold"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("sum_value"))
    )


@query(
    "q_join_bucketed",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n,
           ROUND(SUM(o.o_totalprice), 2) AS sum_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY o.o_orderpriority
    """,
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-bucket join: both sides pre-bucketed 8 ways on the join
    key, so the sort-merge join runs with NO shuffle Exchange on either
    side (asserted on the physical plan in tests/test_layout_ops.py).

    This is the co-located-join layout for repeated big⋈big joins at
    100 TB: pay the bucketing shuffle ONCE at write time, then every
    subsequent join on that key is exchange-free. The oracle is the
    plain unbucketed join — identical rows, different physics. The
    bucketed write repartitions on the key first (one file per bucket);
    Spark still inserts partition-LOCAL Sort nodes under the SMJ (the
    reader does not exploit sortBy metadata — long-open SPARK-19256),
    which cost O(bucket) with no network — the Exchange elimination is
    the property that matters.
    """
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketed_ops")
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    ord_t = f"bucketed_ops.orders_b_{sf_tag}"
    cust_t = f"bucketed_ops.customer_b_{sf_tag}"

    def _write_bucketed(df: DataFrame, table: str, key: str) -> None:
        # External table in /tmp: a fresh session's catalog may not know
        # the table while its old location survives on disk, which makes
        # managed-table overwrite fail with LOCATION_ALREADY_EXISTS.
        loc = os.path.join(tempfile.gettempdir(),
                           f"ftbs_{table.replace('.', '_')}")
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(loc, ignore_errors=True)
        # repartition on the bucket key first → exactly ONE file per
        # bucket (repartition and bucketBy share the Murmur3 hash), which
        # is the precondition for the reader to trust sortBy order and
        # drop the per-partition Sort under the merge join.
        (df.repartition(8, F.col(key))
         .write.mode("overwrite").bucketBy(8, key).sortBy(key)
         .option("path", loc).format("parquet").saveAsTable(table))

    _write_bucketed(
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"),
        ord_t, "o_custkey")
    _write_bucketed(
        load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
        cust_t, "c_custkey")
    o = spark.table(ord_t)
    c = spark.table(cust_t)
    # Pin sort-merge: at demo SFs the dim side is under the broadcast
    # threshold and the planner would pick BHJ, hiding the property this
    # query exists to prove — bucket-aligned SMJ with zero Exchange and
    # zero Sort on either side.
    return (
        o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
    )


@query(
    "q_dedup_keep_best",
    oracle="""
    WITH keyed AS (
      SELECT md5(text) AS h, doc_id, n_chars,
             lpad(CAST(n_chars AS VARCHAR), 10, '0')
               || lpad(CAST(9999999999 - doc_id AS VARCHAR), 10, '0')
               AS pref
      FROM documents
    )
    SELECT arg_max(doc_id, pref) AS kept_doc_id,
           MAX(n_chars) AS best_chars,
           COUNT(*) AS group_size
    FROM keyed GROUP BY h
    """,
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-driven exact dedup: one survivor per content hash, chosen
    by quality policy (longest doc wins; ties → lowest doc_id) — the
    LLM-corpus dedup shape where you keep the BEST duplicate, not an
    arbitrary first row.

    Single hash aggregate via arg-max over a composite preference key
    (fixed-width sortable string: n_chars desc-dominant, inverted doc_id
    tiebreak) — no window, no sort, one shuffle on the content hash.
    """
    d = load(spark, sf_dir, "documents")
    pref = F.concat(
        F.lpad(F.col("n_chars").cast("string"), 10, "0"),
        F.lpad((F.lit(9999999999) - F.col("doc_id")).cast("string"), 10, "0"),
    )
    return (
        d.select(F.md5("text").alias("h"), "doc_id", "n_chars",
                 pref.alias("pref"))
        .groupBy("h")
        .agg(
            F.max_by("doc_id", "pref").alias("kept_doc_id"),
            F.max("n_chars").alias("best_chars"),
            F.count("*").alias("group_size"),
        )
        .drop("h")
    )


_BLOOM_CONFS = {
    # inject for small creation sides / tiny scans (defaults target
    # cluster-scale sizes; the MECHANISM is what this query pins)
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # InjectRuntimeFilter skips joins that could plan as broadcast-hash
    # (no shuffle to save); at test SF everything broadcasts, so disable
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ σ(orders) as a shuffle join, eligible for runtime
    bloom-filter injection (exposed unmaterialized for the plan test)."""
    o = (load(spark, sf_dir, "orders")
         .filter(F.col("o_orderpriority") == "1-URGENT")
         .select("o_orderkey", "o_orderpriority"))
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    return (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@query(
    "q_bloom_filter_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY o.o_orderpriority
    """,
)
def q_bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning (Catalyst InjectRuntimeFilter):
    the selective dimension side builds a bloom filter that is pushed
    into the fact-side SCAN, so most non-matching lineitem rows die
    before the shuffle — at 100 TB this is the difference between
    shuffling the whole fact table and shuffling ~1/5 of it.

    The oracle is the plain join (identical rows — the filter is
    semantics-free pruning). Confs are scoped: set → eager
    localCheckpoint materialization under bloom planning → restored, so
    later queries on the shared session see default thresholds.
    """
    old = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        return _bloom_join(spark, sf_dir).localCheckpoint(eager=True)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@query(
    "q_skew_stats",
    oracle="""
    WITH c AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    )
    SELECT COUNT(*)  AS n_keys,
           MIN(n)    AS min_n,
           MAX(n)    AS max_n,
           median(n) AS median_n,
           CAST(FLOOR(MAX(n) * 1e6 / SUM(n)) AS BIGINT) AS top_key_ppm
    FROM c
    """,
)
def q_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-planning diagnostic: per-key row-count distribution for the
    events.user_id join/agg key — min/max/median group size and the hot
    key's share in parts-per-million.

    This is the measurement that DECIDES the layout strategy: top_key_ppm
    near 10^6/n_tasks means one task owns the key -> salt it
    (q_join_salted) or rely on AQE skew split; a flat distribution means
    plain hash partitioning is fine. Two aggregations, both tiny after
    the first map-side combine; max*1e6/sum divides exact integers in
    doubles, so FLOOR is engine-stable.
    """
    counts = (load(spark, sf_dir, "events")
              .groupBy("user_id").agg(F.count("*").alias("n")))
    return counts.agg(
        F.count("*").alias("n_keys"),
        F.min("n").alias("min_n"),
        F.max("n").alias("max_n"),
        F.median("n").alias("median_n"),
        F.floor(F.max("n") * F.lit(1000000.0) / F.sum("n"))
        .cast("long").alias("top_key_ppm"),
    )


@query(
    "q_compact_small_files",
    oracle="SELECT doc_id, lang, n_chars FROM documents",
)
def q_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: fragment the documents table into 64 tiny
    parquet files (simulating streaming/hourly ingest), compact 64 → 4
    with a shuffle-free `coalesce`, and return the compacted copy's
    rows — the oracle is the ORIGINAL table, so the hash check proves
    compaction is content-preserving. tests/test_layout_ops.py asserts
    the file count actually shrank.

    At 100 TB the small-files problem kills scan throughput (one task +
    one footer-read per file; NameNode/listing pressure). The production
    shape: `coalesce(ceil(bytes / maxPartitionBytes))` when only merging
    (narrow, no shuffle), `repartition` + `maxRecordsPerFile` when
    re-clustering too; AQE's advisoryPartitionSizeInBytes does the same
    for shuffle outputs automatically.
    """
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), f"ftbs_compact_{sf_tag}")
    frag, compact = os.path.join(base, "frag"), os.path.join(base, "compact")
    shutil.rmtree(base, ignore_errors=True)
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    d.repartition(64).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).coalesce(4) \
        .write.mode("overwrite").parquet(compact)
    return spark.read.parquet(compact)


@query(
    "q_agg_pushdown_join",
    oracle="""
    SELECT n.n_name AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_agg_pushdown_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual partial-aggregation pushdown: revenue per nation computed
    by aggregating lineitem to (suppkey, partial revenue) BEFORE the
    dimension joins, then re-aggregating per nation. The oracle is the
    naive join-then-aggregate formulation — same result by agg/join
    associativity (every lineitem matches exactly one supplier).

    This is the rewrite Catalyst does NOT do for you (partial agg
    pushdown below joins is not in the optimizer): at 100 TB it shrinks
    the join input from |lineitem| rows to |supplier| rows, after which
    both dimension joins broadcast. The float caveat: regrouping changes
    summation order, so revenue is rounded like every float aggregate.
    """
    li = load(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
         .alias("rev_part"),
        F.count("*").alias("n_part"),
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        per_supp.join(F.broadcast(s),
                      per_supp.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum("rev_part"), 2).alias("revenue"),
            F.sum("n_part").alias("n_items"),
        )
    )


@query(
    "q_dim_encode",
    oracle="""
    WITH dim AS (
      SELECT lang, source,
             dense_rank() OVER (ORDER BY lang, source) AS sk
      FROM (SELECT DISTINCT lang, source FROM documents)
    )
    SELECT d.sk, MIN(dim.lang) AS lang, MIN(dim.source) AS source,
           COUNT(*) AS n_docs, CAST(SUM(doc.n_chars) AS BIGINT) AS chars
    FROM documents doc
    JOIN dim ON dim.lang = doc.lang AND dim.source = doc.source
    JOIN dim d ON d.sk = dim.sk
    GROUP BY d.sk
    """,
)
def q_dim_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension encoding / surrogate-key assignment: distinct
    (lang, source) pairs get DENSE, DETERMINISTIC integer keys (ordered
    dense_rank — NOT monotonically_increasing_id, whose values depend on
    partition layout), and the fact is rewritten to carry the surrogate.
    This is the dictionary-building step of star-schema construction and
    of categorical feature encoding for training. The dim is tiny by
    definition → broadcast back onto the fact; the only big shuffle is
    the final per-key aggregate."""
    docs = load(spark, sf_dir, "documents")
    dim = (
        docs.select("lang", "source").distinct()
        .withColumn(
            "sk", F.dense_rank().over(Window.orderBy("lang", "source"))
        )
    )
    return (
        docs.join(F.broadcast(dim), ["lang", "source"])
        .groupBy("sk")
        .agg(
            F.min("lang").alias("lang"),
            F.min("source").alias("source"),
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("chars"),
        )
    )


@query(
    "q_join_shuffle_hash",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n,
           ROUND(SUM(o.o_totalprice), 2) AS sum_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy control surface: the SHUFFLE_HASH hint pins a
    ShuffledHashJoin — no sort on either side, build a hash table per
    partition from the smaller side. The right call when both sides are
    too big to broadcast but the build side fits per-partition memory
    and the output needn't be sort-ordered: skips SMJ's two sorts. Same
    rows as the unhinted join (the oracle); the plan shape is the point
    (asserted in tests)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )
