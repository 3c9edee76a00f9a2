"""Extended OLAP surface: pivot, deterministic sampling, exact quantiles,
statistical aggregates, fuzzy matching, and SQL-entry subqueries.

These round out the engine beyond the reference's streaming operators
(SURVEY.md §2 engine-surface rows): the ops a 100 TB training-data
pipeline leans on for rebalancing (stratified sampling), corpus audits
(quantiles/corr), and fuzzy joins. All are pure Catalyst — no Python in
any hot path — and every one is oracle-checked.

Sampling note: Spark's native ``df.sample``/``TABLESAMPLE`` is
seed-dependent and engine-specific, so it cannot hash-match an oracle.
The portable-and-reproducible form used below — filter on a slice of
``md5(key)`` — is also the RIGHT tool for training pipelines: the sample
is stable across engines, re-runs, and cluster sizes, which makes
dataset versions reproducible. (Spark's ``sample`` remains available;
it is exercised rows-only in tests/test_operators.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from flink_tutorial_broadcast_spark.registry import query

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q_pivot",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           COUNT(*) FILTER (event_type = 'click')    AS n_click,
           COUNT(*) FILTER (event_type = 'error')    AS n_error,
           COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
           COUNT(*) FILTER (event_type = 'view')     AS n_view
    FROM events GROUP BY 1
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): day × event_type counts as columns.

    Explicit value list ⇒ single-pass hash aggregate (no extra job to
    discover pivot values, no second shuffle) — the only pivot shape that
    is sane at 100 TB."""
    ev = load(spark, sf_dir, "events")
    piv = (
        ev.withColumn("day", F.date_trunc("day", "ts"))
        .groupBy("day")
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    return piv.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
                 for t in _EVENT_TYPES])


@query(
    "q_sample_deterministic",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
    """,
)
def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample: keep rows whose md5(key) prefix falls in
    the first 0x1a/0x100 of hash space. Engine-portable, seed-free, and
    stable under re-partitioning — the reproducible-dataset sampler."""
    o = load(spark, sf_dir, "orders")
    bucket = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2)
    return (
        o.filter(bucket < "1a")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_stratified_sample",
    oracle="""
    SELECT event_id, event_type, user_id
    FROM events
    WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2)
          < CASE WHEN event_type = 'view' THEN '0d' ELSE 'cd' END
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: downsample the dominant 'view'
    class to ~5% while keeping ~80% of everything else — the
    class-rebalancing pass of a training-data pipeline, as a pure
    codegen'd filter (no shuffle at all)."""
    ev = load(spark, sf_dir, "events")
    bucket = F.substring(F.md5(F.col("event_id").cast("string")), 1, 2)
    rate = F.when(F.col("event_type") == "view", "0d").otherwise("cd")
    return (
        ev.filter(bucket < rate)
        .select("event_id", "event_type", "user_id")
    )


@query(
    "q_quantiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY 1
    """,
)
def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (`percentile`, the sort-based
    exact form; `approx_percentile` is the 100 TB drop-in with the same
    call shape when exactness can be traded for a single pass)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(*[F.round(F.percentile("l_extendedprice", F.lit(p)), 4)
               .alias(name)
               for p, name in [(0.25, "p25"), (0.50, "p50"),
                               (0.75, "p75"), (0.99, "p99")]])
    )


@query(
    "q_corr_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
           ROUND(stddev_samp(l_extendedprice), 2) AS sd_price,
           ROUND(var_samp(l_quantity), 6) AS var_qty
    FROM lineitem GROUP BY 1
    """,
)
def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (corr/covar/stddev/variance) per group —
    single-pass, partial-aggregable, so they scale like any hash agg."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(F.corr("l_quantity", "l_extendedprice"), 6)
             .alias("corr_qty_price"),
             F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2)
             .alias("covar_qp"),
             F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
             F.round(F.var_samp("l_quantity"), 6).alias("var_qty"))
    )


_FUZZY_LIMIT = 60  # bounded block for the all-pairs oracle form


@query(
    "q_edit_distance",
    oracle=f"""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM part a JOIN part b ON a.p_partkey < b.p_partkey
    WHERE a.p_partkey < {_FUZZY_LIMIT} AND b.p_partkey < {_FUZZY_LIMIT}
      AND levenshtein(a.p_name, b.p_name) <= 12
    """,
)
def q_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy matching: Levenshtein pairs within a bounded block (JVM
    builtin, no Python). At corpus scale the block is a blocking key
    (e.g. first token / simhash band) instead of a key range — same plan,
    linear candidate generation."""
    p = (load(spark, sf_dir, "part")
         .filter(F.col("p_partkey") < _FUZZY_LIMIT)
         .select("p_partkey", "p_name"))
    a = p.select(F.col("p_partkey").alias("key_a"),
                 F.col("p_name").alias("name_a"))
    b = p.select(F.col("p_partkey").alias("key_b"),
                 F.col("p_name").alias("name_b"))
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(F.broadcast(b), F.col("key_a") < F.col("key_b"))
        .filter(dist <= 12)
        .select("key_a", "key_b", dist.alias("edit_dist"))
    )


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-entry scalar subquery (lifecycle B, SURVEY.md §3.3): Catalyst
    plans the inner AVG once and broadcasts the scalar — identical to the
    hand-written two-job form, written declaratively."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql("""
        SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """)


@query(
    "q_exists_correlated",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49
    )
    """,
)
def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-entry correlated EXISTS: Catalyst decorrelates to a left-semi
    join (RewriteCorrelatedScalarSubquery/RewritePredicateSubquery) — the
    declarative twin of q_join_semi, proving the SQL lifecycle end-to-end."""
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49
        )
    """)


@query(
    "q_unpivot",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             COUNT(*) FILTER (event_type = 'click')    AS n_click,
             COUNT(*) FILTER (event_type = 'purchase') AS n_purchase
      FROM events GROUP BY 1
    )
    SELECT day, 'n_click' AS metric, n_click AS n FROM daily
    UNION ALL
    SELECT day, 'n_purchase' AS metric, n_purchase AS n FROM daily
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) — the inverse of q_pivot: wide per-day metric
    columns back to (day, metric, value) rows via the native `unpivot`
    operator (pure Generate, no shuffle beyond the source agg)."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day", F.date_trunc("day", "ts"))
        .groupBy("day")
        .agg(F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
             .alias("n_click"),
             F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
             .alias("n_purchase"))
    )
    return daily.unpivot("day", ["n_click", "n_purchase"], "metric", "n")


@query(
    "q_lateral_join",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, ROUND(t.o_totalprice, 2) AS totalprice
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice
                  FROM orders o WHERE o.o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
    WHERE c.c_custkey < 200
    """,
)
def q_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL LATERAL correlated subquery (lifecycle B): top-3 orders per
    customer via a per-row dependent subquery. Catalyst decorrelates
    LATERAL + LIMIT into a window-ranked join — same physical shape as
    q_topk_per_group, written in the SQL idiom."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT c.c_custkey, t.o_orderkey, ROUND(t.o_totalprice, 2) AS totalprice
        FROM customer c,
             LATERAL (SELECT o_orderkey, o_totalprice
                      FROM orders o WHERE o.o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
        WHERE c.c_custkey < 200
    """)


_RECURSIVE_DEPTH_SQL = """
    WITH RECURSIVE walk(custkey, node, depth) AS (
      SELECT c_custkey AS custkey, c_custkey AS node, 0 AS depth
      FROM customer
      UNION ALL
      SELECT custkey, CAST(FLOOR(node / 2) AS BIGINT) AS node, depth + 1 AS depth
      FROM walk WHERE node > 1
    )
    SELECT custkey, MAX(depth) AS depth_to_root
    FROM walk GROUP BY custkey
"""


@query("q_recursive_cte", oracle=_RECURSIVE_DEPTH_SQL)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.x `WITH RECURSIVE`): pointer-chase depth in
    the implicit binary hierarchy parent(k) = k/2 — the BOM-explosion /
    org-chart traversal shape, run from the IDENTICAL SQL text on both
    engines.

    Spark executes the recursion as an iterated union with a loop-
    invariant plan per step (bounded here at ~log2(max key) ≈ 17
    iterations); contrast `q_dup_clusters`, which hand-rolls the same
    fixpoint as a driver loop with localCheckpoint — WITH RECURSIVE is
    the declarative replacement when the step relation is SQL-shaped.
    """
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_RECURSIVE_DEPTH_SQL)


@query(
    "q_allocate_proration",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             SUM(CAST(l_quantity AS BIGINT)) AS qty
      FROM lineitem GROUP BY 1, 2
    ), tot AS (
      SELECT o.o_orderkey,
             CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS cents,
             SUM(li.qty) AS qty_sum, COUNT(*) AS n_items
      FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ), base AS (
      SELECT li.l_orderkey, li.l_linenumber, t.cents, t.qty_sum,
             (t.cents * li.qty) // t.qty_sum AS alloc_floor,
             (t.cents * li.qty) % t.qty_sum AS rem,
             t.cents - SUM((t.cents * li.qty) // t.qty_sum)
               OVER (PARTITION BY li.l_orderkey) AS shortfall
      FROM li JOIN tot t ON li.l_orderkey = t.o_orderkey
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY l_orderkey
                                   ORDER BY rem DESC, l_linenumber)
                  AS rk
      FROM base
    )
    SELECT l_orderkey, l_linenumber,
           CAST(alloc_floor + CASE WHEN rk <= shortfall THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_cents
    FROM ranked
    """,
)
def q_allocate_proration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder proration: split each order's total (in integer
    cents) across its lineitems proportionally to quantity, with the
    rounding shortfall distributed one cent at a time to the largest
    fractional remainders — allocations per order sum EXACTLY to the
    order total (test-pinned), the invariant every billing/cost-
    attribution pipeline must hold. Entirely int64 arithmetic (floor
    division + modulus; no float enters after the one cents conversion),
    so the result is bit-identical on any engine and any partitioning.
    The per-order total quantity is a WINDOW sum over the same
    l_orderkey partitioning the proration windows already need — one
    branch, no separate aggregate-and-rejoin of the deduped lineitems
    (which executed the dedup twice; 1.02 s → 0.70 s at sf0.1)."""
    li = (
        load(spark, sf_dir, "lineitem")
        # duplicate (orderkey, linenumber) pairs exist in the fixture —
        # collapse them so the remainder-rank tiebreak is a total order
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w_order = Window.partitionBy("l_orderkey")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn("qty_sum", F.sum("qty").over(w_order))
        .withColumn("alloc_floor",
                    F.expr("(cents * qty) div qty_sum"))
        .withColumn("rem", (F.col("cents") * F.col("qty")) % F.col("qty_sum"))
    )
    w_rank = Window.partitionBy("l_orderkey").orderBy(
        F.col("rem").desc(), "l_linenumber")
    return (
        base.withColumn(
            "shortfall",
            F.col("cents") - F.sum("alloc_floor").over(w_order),
        )
        .withColumn("rk", F.row_number().over(w_rank))
        .select(
            "l_orderkey", "l_linenumber",
            (F.col("alloc_floor")
             + F.when(F.col("rk") <= F.col("shortfall"), 1).otherwise(0))
            .alias("alloc_cents"),
        )
    )


@query(
    "q_quartile_banding",
    oracle="""
    WITH cuts AS (
      SELECT c_mktsegment AS segment,
             quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.50) AS q2,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1
    )
    SELECT cuts.segment,
           CASE WHEN o.o_totalprice <= cuts.q1 THEN 'Q1'
                WHEN o.o_totalprice <= cuts.q2 THEN 'Q2'
                WHEN o.o_totalprice <= cuts.q3 THEN 'Q3'
                ELSE 'Q4' END AS band,
           COUNT(*) AS n,
           ROUND(SUM(o.o_totalprice), 2) AS band_total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN cuts ON cuts.segment = c.c_mktsegment
    GROUP BY 1, 2
    """,
)
def q_quartile_banding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile banding: classify each order into its customer segment's
    price quartile (group-relative binning — Q1 in BUILDING ≠ Q1 in
    MACHINERY). Two passes: exact per-segment quartile cuts broadcast
    back, then a CASE classifier + aggregate. Cut values are identical
    doubles on both engines (same interpolated quantile over the same
    floats), so band membership is deterministic. The 100 TB variant
    swaps pass 1 for approx_percentile sketches.

    The (segment, price) projection of the enrich join feeds BOTH the
    cut pass and the banding pass — checkpoint it lazily so the join
    runs once (blocks freed by session.release_cached_blocks)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    oc = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_totalprice")
        .localCheckpoint(eager=False)
    )
    cuts = oc.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("q1"),
        F.percentile("o_totalprice", F.lit(0.50)).alias("q2"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("q3"),
    )
    banded = oc.join(
        F.broadcast(cuts), oc.c_mktsegment == cuts.segment
    ).withColumn(
        "band",
        F.when(F.col("o_totalprice") <= F.col("q1"), "Q1")
        .when(F.col("o_totalprice") <= F.col("q2"), "Q2")
        .when(F.col("o_totalprice") <= F.col("q3"), "Q3")
        .otherwise("Q4"),
    )
    return banded.groupBy("segment", "band").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("band_total"),
    )


@query(
    "q_sql_pipe_syntax",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-entry pipe syntax (Spark 4's `|>` operator chaining — the
    linear FROM-first form of the same relational algebra): each `|>`
    stage parses to exactly the node the keyword names, and Catalyst
    plans the chain identically to the nested-SELECT twin the oracle
    runs — one scan with the filter pushed down, partial+final agg, then
    a sort. Proves the third SQL entry surface (after the scalar-subquery
    and correlated-EXISTS lifecycles) end-to-end against an engine that
    has no pipe syntax at all."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        FROM orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE COUNT(*) AS n_orders,
                     ROUND(SUM(o_totalprice), 2) AS revenue
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
    """)


@query(
    "q_weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             ROUND(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                        ::BIGINT + 1.0) / 4503599627370497.0)
                   / n_chars, 12) AS es_key
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, source, n_chars
    FROM keyed ORDER BY es_key, doc_id LIMIT 20
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    each row draws key = -ln(u)/w with u uniform and w its weight (here
    n_chars as a quality-mass stand-in); the k smallest keys are exactly
    a weighted sample without replacement — the quality-weighted subset
    selection used to downsample a corpus while preserving high-value
    documents. u derives from md5(doc_id) (13 hex chars → uniform in
    (0,1]) so the draw is seed-free, engine-portable, and stable under
    repartitioning; both engines evaluate the identical double
    expression, so the selected set matches exactly. The top-k is
    sort+limit — TakeOrderedAndProject, a two-phase per-partition top-k,
    never a global sort — so the plan scales to any corpus size with
    O(partitions·k) driver traffic."""
    u = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13),
                16, 10).cast("double") + F.lit(1.0)) / F.lit(4503599627370497.0)
    return (
        load(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        # rounded to 12 dp before the ORDER BY: natural log is not
        # IEEE-guaranteed correctly rounded, so a 1-ulp libm/JVM
        # divergence must not be able to flip the top-20 boundary
        .withColumn("es_key", F.round(-F.log(u) / F.col("n_chars"), 12))
        .orderBy("es_key", "doc_id")
        .limit(20)
        .select("doc_id", "source", "n_chars")
    )
