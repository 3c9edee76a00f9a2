"""Projection / filter / joins / sort / set ops (SURVEY.md §2 B, C, G, H).

Flink anchors: ``DataStream#map/flatMap/filter/union`` and the join surface
a broadcast-state tutorial implies (connect + keyed state ≈ equi join).
Everything here is pure Catalyst — no UDFs, whole-stage codegen throughout.

Scale notes are per-query docstrings; the common rules:
- dims (region/nation/supplier) are always broadcast — no shuffle of facts;
- big-big joins (orders⋈lineitem) shuffle on the join key once, and AQE
  re-plans with runtime stats (skew split, smaller side conversion);
- semi/anti joins never materialize the probe side's payload columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load, local_rows_df
from flink_tutorial_broadcast_spark.registry import query

# --- B. projection / filter ------------------------------------------------


@query(
    "q_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1.0 - l_discount), 4) AS net_price,
           ROUND(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax), 6)
               AS charged,
           CAST(l_quantity AS BIGINT) AS qty_int
    FROM lineitem
    """,
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 map: derived-column projection (the Flink ``map`` analogue)."""
    li = load(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    # round at the true decimal width of the product (price·disc are
    # 2-decimal, so net has ≤4 and charged ≤6 decimals) — rounding at 2
    # would sit exactly on .005 boundaries where engines' ROUND diverges
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(net, 4).alias("net_price"),
        F.round(net * (F.lit(1.0) + F.col("l_tax")), 6).alias("charged"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
    )


@query(
    "q_flatmap_tokens",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents WHERE doc_id < 100
    """,
)
def q_flatmap_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 flatMap: 1→N tokenization via explode(split) (Flink ``flatMap``)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )


@query(
    "q_filter",
    oracle="""
    SELECT event_id, event_type, value FROM events
    WHERE event_type = 'purchase' AND value > 50.0
    """,
)
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 filter: simple predicate (Flink ``filter``)."""
    return (
        load(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("value") > 50.0))
        .select("event_id", "event_type", "value")
    )


@query(
    "q_filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE (o_orderstatus IN ('O', 'F'))
      AND (o_totalprice BETWEEN 100000.0 AND 300000.0)
      AND o_orderpriority LIKE '%URGENT%'
      AND o_custkey IS NOT NULL
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: IN / BETWEEN / LIKE / IS NULL boolean algebra."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(100000.0, 300000.0)
        & F.col("o_orderpriority").like("%URGENT%")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


# --- C. joins ---------------------------------------------------------------


@query(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus,
           COUNT(*) AS n_lines,
           ROUND(SUM(l.l_extendedprice), 2) AS order_revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_totalprice > 350000.0
    GROUP BY 1, 2
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 big-big equi join: orders⋈lineitem, shuffle on the order key.

    Both sides shuffle-partition on o_orderkey/l_orderkey exactly once; the
    selective orders filter runs before the join (Catalyst pushes it below)
    so AQE can flip to broadcast when the filtered side is small.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000.0)
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("order_revenue"),
        )
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 left outer join: customers keep rows with zero orders."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "q_join_right",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus, c.c_name
    FROM customer c RIGHT JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_orderkey < 5000
    """,
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 right outer join: every order survives even without a customer
    row (mirror of q_join_left; Catalyst plans it as the mirrored outer
    hash join, broadcast when the preserved side's build fits)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "right")
        .filter(F.col("o_orderkey") < 5000)
        .select("o_orderkey", "o_orderstatus", "c_name")
    )


@query(
    "q_join_full",
    oracle="""
    WITH bignation AS (
      SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 15
    ), custn AS (
      SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1
    )
    SELECT b.n_name AS n_name, c.c_nationkey AS c_nationkey,
           COALESCE(c.n_cust, 0) AS n_cust
    FROM bignation b FULL JOIN custn c ON b.n_nationkey = c.c_nationkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 full outer join: unmatched rows survive from both sides."""
    n = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_nationkey") < 15)
        .select("n_nationkey", "n_name")
    )
    c = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    return n.join(c, n.n_nationkey == c.c_nationkey, "full").select(
        F.col("n_name"),
        F.col("c_nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 450000.0)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 left-semi: customers having a big order; no payload duplication."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 left-anti: customers with no orders at all."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name")


@query(
    "q_star_join",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(DISTINCT c.c_custkey) AS n_customers,
           COUNT(o.o_orderkey) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
    """,
)
def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 multi-way star join: region→nation→customer→orders.

    region/nation are broadcast explicitly (tiny dims); customer is under
    the threshold at every SF the fixtures ship, so the only shuffle is the
    final aggregate. At 100 TB: facts never move for dim joins.
    """
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"),
                 F.col("n_name").alias("nation_name"))
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "q_interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id, e.event_id AS error_id,
           p.user_id AS user_id
    FROM events p JOIN events e
      ON p.user_id = e.user_id
     AND e.ts BETWEEN p.ts - INTERVAL 5 MINUTE AND p.ts + INTERVAL 5 MINUTE
    WHERE p.event_type = 'purchase' AND e.event_type = 'error'
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 interval join (Flink ``KeyedStream#intervalJoin between(-5m,+5m)``):
    errors within ±5 minutes of a purchase by the same user.

    Equi key (user_id) carries the shuffle; the range predicate filters
    post-probe. Streaming formulation: stream-stream join + watermarks
    (streaming/ demos).
    """
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("e_ts"),
    )
    joined = p.join(
        e,
        (p.user_id == e.e_user_id)
        & (e.e_ts >= p.p_ts - F.expr("INTERVAL 5 MINUTES"))
        & (e.e_ts <= p.p_ts + F.expr("INTERVAL 5 MINUTES")),
    )
    return joined.select("purchase_id", "error_id", "user_id")


@query(
    "q_window_join",
    oracle="""
    WITH clicks AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
             COUNT(*) AS n_clicks
      FROM events WHERE event_type = 'click' GROUP BY 1
    ), errors AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
             COUNT(*) AS n_errors
      FROM events WHERE event_type = 'error' GROUP BY 1
    )
    SELECT c.hr AS hr, c.n_clicks AS n_clicks, e.n_errors AS n_errors
    FROM clicks c JOIN errors e ON c.hr = e.hr
    """,
)
def q_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 window join: co-group two event classes by tumbling hour bucket."""
    ev = load(spark, sf_dir, "events")
    hr = F.date_trunc("hour", F.col("ts")).alias("hr")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(hr).agg(F.count("*").alias("n_clicks"))
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(hr).agg(F.count("*").alias("n_errors"))
    )
    return clicks.join(errors, "hr").select("hr", "n_clicks", "n_errors")


@query(
    "q_cross_join",
    oracle="""
    SELECT r.r_name AS r_name, s.severity AS severity
    FROM region r CROSS JOIN
         (SELECT DISTINCT severity FROM (VALUES ('low'), ('medium'), ('high'))
            AS t(severity)) s
    """,
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 cross join: tiny×tiny cartesian (BroadcastNestedLoopJoin)."""
    r = load(spark, sf_dir, "region").select("r_name")
    sev = local_rows_df(
        spark, [("low",), ("medium",), ("high",)], "severity string")
    return r.crossJoin(F.broadcast(sev))


# --- G. sort / limit --------------------------------------------------------


@query(
    "q_sort",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_orderstatus = 'F' ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 global sort (range-partitioned exchange + per-partition sort)."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 global top-k → TakeOrderedAndProject (no full sort, per-partition
    heaps + driver merge; the plan that survives 100 TB)."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_totalprice")
    )


# --- H. set operations ------------------------------------------------------


@query(
    "q_union_all",
    oracle="""
    SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, event_type, value FROM events WHERE event_type = 'view'
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1 union (bag semantics — Flink ``DataStream#union``)."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.filter(F.col("event_type") == "click").unionByName(
        ev.filter(F.col("event_type") == "view"))


@query(
    "q_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2 intersect (distinct): customers with both open and filled orders."""
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
        .intersect(o.filter(F.col("o_orderstatus") == "F").select("o_custkey"))
    )


@query(
    "q_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2 except (distinct): customer keys never seen in orders."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"))
    return c.subtract(o)


@query(
    "q_explode_outer",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
    FROM documents WHERE lang = 'en'
    UNION ALL
    SELECT doc_id, NULL AS tok FROM documents WHERE lang <> 'en'
    """,
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 completion: null-preserving 1:N expansion (``explode_outer``).
    English documents fan out to one row per token; every other document
    survives as a single NULL-token row instead of disappearing — the
    LEFT JOIN LATERAL semantics a plain explode silently breaks. The
    oracle spells the same contract as a two-branch union.

    Map-side only (no shuffle); at scale this is the safe default for
    enrichment explodes where dropping parentless rows would corrupt
    downstream counts.
    """
    docs = load(spark, sf_dir, "documents")
    toks = F.when(F.col("lang") == "en", F.split("text", " "))
    return docs.select(
        "doc_id", F.explode_outer(toks).alias("tok")
    )


@query(
    "q_union_evolve",
    oracle="""
    SELECT event_id, user_id, event_type,
           ROUND(value, 2) AS value, CAST(NULL AS VARCHAR) AS props
    FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, user_id, event_type,
           CAST(NULL AS DOUBLE) AS value, props
    FROM events WHERE event_type = 'error'
    """,
)
def q_union_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1 completion: union across SCHEMA GENERATIONS —
    ``unionByName(allowMissingColumns=True)`` null-pads columns the other
    side lacks, by NAME not position (positional UNION on drifted
    schemas silently mismatches columns; by-name is the engine rule).
    Here a clicks feed carrying `value` merges with an errors feed
    carrying `props` — the multi-source ingest shape where feeds evolve
    independently. Map-side only."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "event_type",
        F.round("value", 2).alias("value"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "event_type", "props",
    )
    return clicks.unionByName(errors, allowMissingColumns=True)


@query(
    "q_join_null_safe",
    oracle="""
    WITH ev AS (
      SELECT event_id, NULLIF(event_type, 'click') AS et, value
      FROM events
    ),
    dim AS (
      SELECT DISTINCT NULLIF(event_type, 'click') AS et,
             COALESCE(NULLIF(event_type, 'click'), 'was_click') AS label
      FROM events
    )
    SELECT d.label, COUNT(*) AS n, ROUND(SUM(ev.value), 2) AS sum_value
    FROM ev JOIN dim d ON ev.et IS NOT DISTINCT FROM d.et
    GROUP BY 1
    """,
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`eqNullSafe` ≡ IS NOT DISTINCT FROM as a JOIN
    key): NULL keys match each other instead of vanishing — the shape
    every dimension join with an 'unknown' member needs. Physically this
    stays a HASH join (Catalyst canonicalizes <=> into the join key, so
    no nested-loop penalty for admitting NULLs); the dim side is
    broadcast. The scalar-expression twin is q_null_semantics; this is
    the join-operator form."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.nullif(F.col("event_type"), F.lit("click")).alias("et"),
        "value")
    dim = (
        load(spark, sf_dir, "events")
        .select(F.nullif(F.col("event_type"), F.lit("click")).alias("et"))
        .distinct()
        .withColumn("label", F.coalesce(F.col("et"), F.lit("was_click")))
    )
    return (
        ev.join(F.broadcast(dim), ev.et.eqNullSafe(dim.et))
        .groupBy("label")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("sum_value"))
    )
