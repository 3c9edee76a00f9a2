"""Batch analytic window functions (SURVEY.md §2.F).

Engine surface for the harness (the reference's keyed-state per-record
computations map to these in batch). All deterministic: every ORDER BY
carries a unique tiebreak column so both engines rank identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_tutorial_broadcast_spark.io import load
from flink_tutorial_broadcast_spark.registry import query


@query(
    "q_rank",
    oracle="""
    SELECT c_custkey, c_nationkey,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 ranking family within nation by account balance."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey"))
    return load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "q_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           first_value(value) OVER w AS first_value_in_key
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 analytic lag/lead/first per user in event-time order."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load(spark, sf_dir, "events").select(
        "event_id", "user_id", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value_in_key"),
    )


@query(
    "q_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_total,
           COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS n_last3
    FROM orders
    """,
)
def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 frames: running total + sliding 3-row count per customer."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last3 = w.rowsBetween(-2, Window.currentRow)
    return load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.round(F.sum("o_totalprice").over(running), 2)
        .alias("running_total"),
        F.count("*").over(last3).alias("n_last3"),
    )


@query(
    "q_topk_per_group",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM ranked WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 top-3 orders per customer — rank-filter pattern; at scale this
    beats a global sort because the window shuffles once on the group key
    and the filter prunes before any further exchange."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice",
                F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW),
             2) AS sum_30d,
           COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
             AS n_30d
    FROM orders WHERE o_custkey < 500
    """,
)
def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 RANGE frame with a time interval: per-customer trailing-30-day
    order total — value-based frames (all peers of equal order date
    included), distinct from row-count frames. Expressed via the SQL
    entry (lifecycle B) because interval RANGE frames are SQL-only in
    Spark's window API."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT o_orderkey, o_custkey,
               ROUND(SUM(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW),
                 2) AS sum_30d,
               COUNT(*) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
                 AS n_30d
        FROM orders WHERE o_custkey < 500
    """)


@query(
    "q_rolling_median",
    oracle="""
    SELECT event_id, user_id,
           ROUND(quantile_cont(value, 0.5)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
                 4) AS med5
    FROM events
    """,
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over each user's last 5 observations — the
    robust-smoothing twin of a moving average (one outlier can't drag
    it). `percentile` as a WINDOW aggregate ≡ DuckDB's quantile_cont
    window: both interpolate over the same ≤5 doubles, so the floats
    match before ROUND. One user_id Exchange + sort; the ROWS frame is
    bounded, so state per key is O(5) — the same bounded-buffer shape a
    Flink keyed ProcessFunction would hold.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    return load(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.round(
            F.expr("percentile(value, 0.5)").over(w), 4
        ).alias("med5"),
    )


@query(
    "q_share_of_total",
    oracle="""
    WITH rev AS (
      SELECT n.n_regionkey AS region_key, n.n_name AS nation,
             SUM(o.o_totalprice) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    )
    SELECT region_key, nation,
           ROUND(revenue, 2) AS revenue,
           CAST(FLOOR(revenue * 1000000 /
                      SUM(revenue) OVER (PARTITION BY region_key))
                AS BIGINT) AS share_ppm
    FROM rev
    """,
)
def q_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's revenue share within its region as
    integer parts-per-million (FLOOR on the exact double ratio — the
    engine's portable percentage idiom, same as the Markov ppm rows).
    A window aggregate with no ORDER BY: whole-partition sum, no sort
    needed beyond the partition Exchange. The denominator never leaves
    the executor — no second pass, no driver round-trip."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_regionkey").alias("region_key"),
            F.col("n_name").alias("nation"),
        )
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("region_key")
    return rev.select(
        "region_key", "nation",
        F.round("revenue", 2).alias("revenue"),
        F.floor(F.col("revenue") * 1000000 / F.sum("revenue").over(w))
        .cast("long").alias("share_ppm"),
    )


@query(
    "q_topn_with_ties",
    oracle="""
    SELECT c_mktsegment AS segment, c_custkey,
           ROUND(c_acctbal, 2) AS acctbal, rnk
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             rank() OVER (PARTITION BY c_mktsegment
                          ORDER BY ROUND(c_acctbal, 2) DESC) AS rnk
      FROM customer
    )
    WHERE rnk <= 3
    """,
)
def q_topn_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N WITH TIES (rank() ≤ 3, vs q_topk_per_group's row_number):
    every customer tied at a podium balance is kept, so group result
    sizes vary — the SQL:2008 FETCH WITH TIES semantics. Ranking on the
    ROUNDED balance makes tie groups themselves deterministic across
    engines (raw float ties are engine-stable here, but the rounded key
    removes any doubt and creates real ties to exercise the semantics).
    """
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.round("c_acctbal", 2).desc()
    )
    return (
        load(spark, sf_dir, "customer")
        .select(
            F.col("c_mktsegment").alias("segment"),
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.rank().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )
