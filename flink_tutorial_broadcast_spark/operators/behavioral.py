"""Behavioral / sequence analytics over the event stream: conversion
funnel, cohort retention, distribution ranks, and ignore-nulls carry-
forward.

These are the batch forms of what the reference's keyed process functions
compute imperatively — per-key ordered-state walks over an event stream
([FLINK-API `KeyedProcessFunction` + `ValueState`], the same machinery the
broadcast tutorial's `processElement` uses). Spark-first, each is a
declarative plan: stage joins co-partitioned on `user_id`, window
functions over (ts, event_id) orderings, no Python in any hot path.

Scale notes:
- The funnel's stage tables shrink monotonically (view ⊇ click ⊇
  purchase survivors); every join keys on `user_id`, so AQE reuses the
  hash partitioning across stages instead of re-shuffling the fact table.
- Retention's `DISTINCT (user, offset)` happens AFTER projecting two
  narrow columns — the wide event row never crosses the shuffle.
- Ordered-window queries use the verified-unique (user_id, ts) ordering
  (ties would make any engine's window output nondeterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from flink_tutorial_broadcast_spark.registry import query


@query(
    "q_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click,
           (SELECT COUNT(*) FROM p) AS n_purchase
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: view → click (after view) → purchase
    (after click); one row of per-stage survivor counts.

    The streaming formulation of this is exactly the reference's keyed-
    state pattern (store the stage reached per user in ValueState); the
    batch form is two shrinking user_id-keyed joins, which Catalyst
    co-partitions — the fact table is scanned once per stage filter and
    only (user_id, ts) pairs shuffle.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t_view")))
    c = (ev.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter(F.col("ts") > F.col("t_view"))
         .groupBy("user_id").agg(F.min("ts").alias("t_click")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter(F.col("ts") > F.col("t_click"))
         .groupBy("user_id").agg(F.min("ts").alias("t_purchase")))

    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase")))
    )


@query(
    "q_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT e.user_id, f.d0,
             datediff('day', f.d0, CAST(e.ts AS DATE)) AS off
      FROM events e JOIN first f ON e.user_id = f.user_id
    )
    SELECT CAST(d0 AS TIMESTAMP) AS cohort_day,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(DISTINCT CASE WHEN off = 1 THEN user_id END) AS ret_d1,
           COUNT(DISTINCT CASE WHEN off = 7 THEN user_id END) AS ret_d7
    FROM act GROUP BY d0
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day; how many
    return exactly 1 and 7 days later.

    The (user, day-offset) pairs are projected to two narrow columns
    before DISTINCT, so the shuffle carries ~16 bytes/row regardless of
    event width — the property that keeps this viable at 100 TB.
    """
    ev = (load(spark, sf_dir, "events")
          .select("user_id", F.to_date("ts").alias("d")))
    first = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    act = (ev.join(first, "user_id")
           .select("user_id", "d0", F.datediff("d", "d0").alias("off"))
           .distinct())
    return (
        act.groupBy("d0")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count_distinct(
                F.when(F.col("off") == 1, F.col("user_id"))).alias("ret_d1"),
            F.count_distinct(
                F.when(F.col("off") == 7, F.col("user_id"))).alias("ret_d7"),
        )
        .select(
            F.col("d0").cast("timestamp").alias("cohort_day"),
            "n_users", "ret_d1", "ret_d7",
        )
    )


@query(
    "q_cume_dist",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(FLOOR(percent_rank() OVER w * 1000000) AS BIGINT) AS pr_ppm,
           CAST(FLOOR(cume_dist() OVER w * 1000000) AS BIGINT) AS cd_ppm,
           ntile(4) OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def q_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranks: percent_rank / cume_dist / ntile quartiles of
    customers by balance within nation (F1 family beyond rank/dense_rank).

    Ordering includes c_custkey as tiebreaker — a unique ordering is what
    makes ntile deterministic on ANY data; never ship a window query
    without one. Ranks are emitted as floor-scaled parts-per-million
    integers: percent_rank yields exact binary fractions like 0.0640625
    whose ROUND(x, 6) differs between Spark (half-up) and DuckDB
    (half-even); FLOOR sidesteps the rounding-mode divergence.
    """
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey",
        F.floor(F.percent_rank().over(w) * 1000000).alias("pr_ppm"),
        F.floor(F.cume_dist().over(w) * 1000000).alias("cd_ppm"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "q_last_ignore_nulls",
    oracle="""
    SELECT event_id, user_id,
           ROUND(last_value(CASE WHEN event_type = 'purchase' THEN value END
                            IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS last_purchase_value
    FROM events
    """,
)
def q_last_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS carry-forward: each event annotated with the value of
    the user's most recent purchase so far (NULL before the first one).

    This is the declarative form of the reference's per-key ValueState
    ("remember the last X per key" in `processElement`) — one window
    function instead of imperative state. Explicit ROWS frame + unique
    (ts, event_id) ordering keeps both engines byte-identical.
    """
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return load(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.round(F.last(purchase_val, ignorenulls=True).over(w), 2)
         .alias("last_purchase_value"),
    )


@query(
    "q_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('second', lag(ts) OVER w, ts) > 21600
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts,
             CAST(SUM(new_sess) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_no
      FROM flagged
    )
    SELECT user_id, session_no,
           COUNT(*) AS n_events,
           date_diff('second', MIN(ts), MAX(ts)) AS duration_sec
    FROM numbered GROUP BY user_id, session_no
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization with explicit SESSION IDs: a new session
    starts after a >6h silence; session_no is the running sum of
    session-start flags — the batch equivalent of Flink's
    EventTimeSessionWindows, but keeping the assignment (which event is
    in which session) instead of only the windowed aggregate
    (q_window_session).

    Scale: two windows + one agg, ALL over the same (user_id) partitioning
    — Catalyst plans a single Exchange; the sort is reused by the lag, the
    cumulative sum, and the final group. Order pinned by (ts, event_id).
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_sess",
        F.when(F.lag("ts").over(w).isNull() | (gap > 21600), 1).otherwise(0))
    numbered = flagged.withColumn(
        "session_no",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        numbered.groupBy("user_id", "session_no")
        .agg(F.count("*").alias("n_events"),
             (F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts")))
             .alias("duration_sec"))
    )


@query(
    "q_attribution",
    oracle="""
    WITH j AS (
      SELECT p.event_id AS purchase_id, p.user_id AS user_id,
             c.event_id AS click_id,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM events p LEFT JOIN events c
        ON c.user_id = p.user_id AND c.event_type = 'click'
       AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 DAY
      WHERE p.event_type = 'purchase'
    )
    SELECT purchase_id, user_id, click_id FROM j WHERE rn = 1
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's LATEST
    click in the preceding 24 h (NULL when organic). The other classic
    as-of-join shape — pointing backward from conversions instead of
    forward from rules — kept as a LEFT join so unattributed purchases
    survive.

    One user_id shuffle joins both event roles; the per-purchase
    row_number needs no extra Exchange (purchase_id is user-local).
    At 100 TB the 24 h bound makes this the bucketed-range-join shape
    (q_range_join_bucketed) — here the naive form IS the oracle.
    """
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    )
    j = p.join(
        c,
        (p.user_id == c.c_user_id)
        & (c.c_ts <= p.p_ts)
        & (c.c_ts >= p.p_ts - F.expr("INTERVAL 1 DAY")),
        "left",
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("c_ts").desc(), F.col("click_id").desc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("purchase_id", "user_id", "click_id")
    )


@query(
    "q_rfm",
    oracle="""
    WITH base AS (
      SELECT user_id,
             MAX(ts) AS last_ts,
             COUNT(*) AS n_events,
             SUM(CASE WHEN event_type = 'purchase' THEN value
                      ELSE 0 END) AS monetary
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           ntile(5) OVER (ORDER BY last_ts DESC, user_id) AS r_q,
           ntile(5) OVER (ORDER BY n_events DESC, user_id) AS f_q,
           ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m_q,
           n_events
    FROM base
    """,
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quintile each user on Recency (latest event),
    Frequency (event count), Monetary (purchase value sum) — quintile 1
    is best on every axis. The canonical marketing-segmentation query:
    one keyed aggregate, then three global ntiles.

    Every ntile ordering carries user_id as the unique tiebreak, so
    quintile assignment is deterministic on both engines (ntile is
    row-order-dependent — an un-tiebroken ORDER BY would hash-diverge).

    Each global ntile is EXECUTED two-phase (two_phase.global_order on
    the NEGATED measure for the DESC orderings, then ntile_from_rn
    arithmetic on the exact global row number and the broadcast user
    count) — three bucket-partitioned windows, no unpartitioned
    WindowExec (CI-guarded in plans/audit.py). The multi-spec form
    shares ONE stats pass and ONE bucket-histogram pass across all
    three orderings."""
    from .two_phase import global_order_multi, ntile_from_rn

    ev = load(spark, sf_dir, "events")
    base = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count("*").alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(0.0)
        ).alias("monetary"),
    )
    # DESC orderings rank ascending on the negated measure; user_id
    # stays the ASC tiebreak in all three, matching the oracle exactly
    ranked = global_order_multi(base, [
        (-F.unix_micros("last_ts"), ["user_id"], "rn_r"),
        (-F.col("n_events"), ["user_id"], "rn_f"),
        (-F.col("monetary"), ["user_id"], "rn_m"),
    ])
    n_users = base.agg(F.count("*").alias("__n_users"))
    return (
        ranked.crossJoin(F.broadcast(n_users))
        .select(
            "user_id",
            ntile_from_rn(F.col("rn_r"), F.col("__n_users"), 5)
            .alias("r_q"),
            ntile_from_rn(F.col("rn_f"), F.col("__n_users"), 5)
            .alias("f_q"),
            ntile_from_rn(F.col("rn_m"), F.col("__n_users"), 5)
            .alias("m_q"),
            "n_events",
        )
    )


@query(
    "q_cumulative_distinct",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events
      GROUP BY user_id
    ), per_day AS (
      SELECT d0, COUNT(*) AS n_new FROM first_seen GROUP BY d0
    )
    SELECT CAST(d0 AS TIMESTAMP) AS day, n_new,
           CAST(SUM(n_new) OVER (ORDER BY d0
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW)
                AS BIGINT) AS n_cum
    FROM per_day
    """,
)
def q_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users to date (and new-vs-returning): a
    running COUNT(DISTINCT) can't be windowed on either engine; the
    rewrite assigns each user their FIRST-SEEN day (one keyed agg) and
    takes a running sum of the per-day first-seen counts — exact, one
    user_id shuffle plus a tiny day-level window. The trailing-window
    twin is q_windowed_distinct; this one is monotone to-date actives.
    """
    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("d0")
    )
    per_day = first_seen.groupBy("d0").agg(F.count("*").alias("n_new"))
    w = Window.orderBy("d0").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.col("d0").cast("timestamp").alias("day"),
        "n_new",
        F.sum("n_new").over(w).alias("n_cum"),
    )


@query(
    "q_time_to_convert",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(epoch_us(t_buy) - epoch_us(t_signup) AS BIGINT)
             AS convert_us
    FROM firsts
    WHERE t_signup IS NOT NULL AND t_buy IS NOT NULL
      AND t_buy >= t_signup
    """,
)
def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert: µs between each user's first signup and first
    subsequent purchase — the activation-latency metric behind every
    funnel dashboard. ONE conditional-min aggregate extracts both
    timestamps (no self-join, no window): the same single-pass
    accumulator shape as OHLC. Durations are integer µs (engine-exact).
    """
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
        .alias("t_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .alias("t_buy"),
    )
    return (
        firsts.filter(
            F.col("t_signup").isNotNull()
            & F.col("t_buy").isNotNull()
            & (F.col("t_buy") >= F.col("t_signup"))
        )
        .select(
            "user_id",
            (F.unix_micros("t_buy") - F.unix_micros("t_signup"))
            .alias("convert_us"),
        )
    )


@query(
    "q_growth_mom",
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             SUM(o_totalprice) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, ROUND(revenue, 2) AS revenue,
           CAST(FLOOR((revenue - lag(revenue) OVER (ORDER BY month))
                      * 10000 / lag(revenue) OVER (ORDER BY month))
                AS BIGINT) AS growth_bps
    FROM m
    """,
)
def q_growth_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth in integer basis points (FLOOR on
    the exact double ratio; first month NULL) — the lag-ratio report
    every finance rollup runs. Month-level window is tiny by
    construction; the only real shuffle is the month aggregate."""
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(F.sum("o_totalprice").alias("revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        F.round("revenue", 2).alias("revenue"),
        F.floor((F.col("revenue") - prev) * 10000 / prev)
        .cast("long").alias("growth_bps"),
    )


@query(
    "q_audience_overlap",
    oracle="""
    WITH tu AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), sizes AS (
      SELECT event_type, COUNT(*) AS n FROM tu GROUP BY event_type
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_both,
           MIN(sa.n) AS n_a, MIN(sb.n) AS n_b,
           CAST(FLOOR(COUNT(*) * 1000000.0
                      / (MIN(sa.n) + MIN(sb.n) - COUNT(*))) AS BIGINT)
             AS jaccard_ppm
    FROM tu a
    JOIN tu b ON a.user_id = b.user_id AND a.event_type < b.event_type
    JOIN sizes sa ON sa.event_type = a.event_type
    JOIN sizes sb ON sb.event_type = b.event_type
    GROUP BY a.event_type, b.event_type
    """,
)
def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: for every pair of event types, how many
    users do both, and the Jaccard similarity of the two audiences
    (integer ppm) — the segment-overlap report behind campaign targeting
    and cannibalization analysis. Dedup to (type, user) FIRST (the same
    shrink-before-expand rule as the rolling distinct), then one
    user-keyed self-join; sizes broadcast back. Output is bounded at
    |types|² rows."""
    ev = load(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count("*").alias("n"))
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"),
                  F.col("user_id").alias("user_b"))
    pairs = a.join(
        b,
        (a.user_id == b.user_b) & (F.col("type_a") < F.col("type_b")),
    )
    sa = sizes.select(F.col("event_type").alias("type_a"),
                      F.col("n").alias("na"))
    sb = sizes.select(F.col("event_type").alias("type_b"),
                      F.col("n").alias("nb"))
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
        .join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a", "type_b", "n_both",
            F.col("na").alias("n_a"), F.col("nb").alias("n_b"),
            F.floor(
                F.col("n_both") * 1000000.0
                / (F.col("na") + F.col("nb") - F.col("n_both"))
            ).cast("long").alias("jaccard_ppm"),
        )
    )


@query(
    "q_revenue_bridge",
    oracle="""
    WITH m AS (
      SELECT o_custkey,
             date_trunc('month', o_orderdate) AS month,
             SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1, 2
    ), bounds AS (
      SELECT MAX(month) AS m1 FROM m
    ), prev AS (
      SELECT o_custkey, cents FROM m, bounds
      WHERE month = m1 - INTERVAL 1 MONTH
    ), curr AS (
      SELECT o_custkey, cents FROM m, bounds WHERE month = m1
    )
    SELECT CASE WHEN p.o_custkey IS NULL THEN 'new'
                WHEN c.o_custkey IS NULL THEN 'churned'
                WHEN c.cents > p.cents THEN 'expanded'
                WHEN c.cents < p.cents THEN 'contracted'
                ELSE 'flat' END AS segment,
           COUNT(*) AS n_customers,
           CAST(SUM(COALESCE(c.cents, 0) - COALESCE(p.cents, 0))
                AS BIGINT) AS delta_cents
    FROM prev p FULL OUTER JOIN curr c ON p.o_custkey = c.o_custkey
    GROUP BY 1
    """,
)
def q_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue bridge: decompose the latest month's revenue change vs
    the prior month into new / churned / expanded / contracted customer
    segments — the waterfall chart every finance review opens with. The
    segment deltas sum EXACTLY to the total month-over-month change
    (integer cents; test-pinned conservation). One month-keyed
    aggregate, then a full-outer join of two month slices on the
    customer key."""
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .alias("cents")
    )
    m1 = m.agg(F.max("month").alias("m1"))
    prev = (
        m.join(F.broadcast(m1),
               m.month == F.col("m1") - F.expr("INTERVAL 1 MONTH"))
        .select(F.col("o_custkey").alias("pk"), F.col("cents").alias("pc"))
    )
    curr = (
        m.join(F.broadcast(m1), m.month == F.col("m1"))
        .select(F.col("o_custkey").alias("ck"), F.col("cents").alias("cc"))
    )
    j = prev.join(curr, prev.pk == curr.ck, "full")
    return (
        j.select(
            F.when(F.col("pk").isNull(), "new")
            .when(F.col("ck").isNull(), "churned")
            .when(F.col("cc") > F.col("pc"), "expanded")
            .when(F.col("cc") < F.col("pc"), "contracted")
            .otherwise("flat")
            .alias("segment"),
            (F.coalesce(F.col("cc"), F.lit(0))
             - F.coalesce(F.col("pc"), F.lit(0))).alias("delta"),
        )
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("delta").alias("delta_cents"),
        )
    )


@query(
    "q_stickiness",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ), spine AS (SELECT DISTINCT d FROM du),
    dau AS (
      SELECT d, COUNT(*) AS dau FROM du GROUP BY d
    ), mau AS (
      SELECT s.d, COUNT(DISTINCT du.user_id) AS mau
      FROM spine s JOIN du ON du.d BETWEEN s.d - 27 AND s.d
      GROUP BY s.d
    )
    SELECT CAST(dau.d AS TIMESTAMP) AS day, dau.dau AS dau, mau.mau AS mau,
           CAST(FLOOR(dau.dau * 1000000.0 / mau.mau) AS BIGINT)
             AS stickiness_ppm
    FROM dau JOIN mau ON dau.d = mau.d
    """,
)
def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness: daily actives over trailing-28-day actives,
    as integer ppm — THE engagement ratio product teams track. Composes
    the dedup-then-expand rewrite at two window widths from ONE
    (day, user) dedup: the expensive shuffle happens once and both
    window scales reuse it."""
    ev = load(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    spine = du.select(F.col("d").alias("day")).distinct()
    dau = du.groupBy(F.col("d").alias("day")).agg(
        F.count("*").alias("dau"))
    mau = (
        du.join(
            F.broadcast(spine),
            (F.col("d") <= F.col("day"))
            & (F.col("d") >= F.date_sub(F.col("day"), 27)),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return (
        dau.join(mau, "day")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "dau", "mau",
            F.floor(F.col("dau") * 1000000.0 / F.col("mau"))
            .cast("long").alias("stickiness_ppm"),
        )
    )


@query(
    "q_cycle_time",
    oracle="""
    WITH ct AS (
      SELECT o.o_orderkey,
             datediff('day', CAST(o.o_orderdate AS DATE),
                      MAX(CAST(l.l_shipdate AS DATE))) AS days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
    )
    SELECT CAST(FLOOR(days / 7) AS INT) AS week_bucket,
           COUNT(*) AS n_orders,
           MIN(days) AS min_days, MAX(days) AS max_days
    FROM ct GROUP BY 1
    """,
)
def q_cycle_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order cycle-time distribution: days from order placement to the
    LAST shipment, bucketed by week — the fulfillment-latency histogram
    behind every operations SLA. Integer day arithmetic end to end; one
    orderkey aggregate then a bounded bucket aggregate."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    ct = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max(F.to_date("l_shipdate")).alias("shipped"))
        .select(
            F.datediff("shipped", F.to_date("o_orderdate")).alias("days")
        )
    )
    return ct.groupBy(
        F.floor(F.col("days") / 7).cast("int").alias("week_bucket")
    ).agg(
        F.count("*").alias("n_orders"),
        F.min("days").alias("min_days"),
        F.max("days").alias("max_days"),
    )


@query(
    "q_gini",
    oracle="""
    WITH c AS (
      SELECT o_custkey,
             SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, o_custkey) AS rk,
             COUNT(*) OVER () AS n,
             SUM(cents) OVER () AS tot
      FROM c
    )
    SELECT MIN(n) AS n_customers,
           ROUND((2.0 * SUM(rk * cents)) / (MIN(n) * MIN(tot))
                 - (MIN(n) + 1.0) / MIN(n), 6) AS gini
    FROM ranked
    """,
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers — the
    one-number inequality summary next to the Pareto/ABC report (0 =
    everyone equal, →1 = one whale). Revenue is integer cents and ranks
    are integers (unique tiebreak on custkey), so Σ(rank·cents) is exact
    int64; floats appear only in the final closed-form ratio, computed
    from identical integers on both engines.

    The global rank over the per-customer aggregate is EXECUTED
    two-phase (two_phase.global_order: deterministic equal-width value
    buckets + broadcast prefix-sum offsets + bucket-partitioned
    row_number) — no unpartitioned WindowExec, CI-guarded in
    plans/audit.py; n and Σcents fold into the final 1-row aggregate."""
    from .two_phase import global_order

    o = load(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .alias("cents")
    )
    ranked = global_order(c, F.col("cents"), ["o_custkey"], out_rn="rk")
    return ranked.agg(
        F.count("*").alias("n_customers"),
        F.round(
            (2.0 * F.sum(F.col("rk") * F.col("cents")))
            / (F.count("*") * F.sum("cents"))
            - (F.count("*") + 1.0) / F.count("*"),
            6,
        ).alias("gini"),
    )


@query(
    "q_ab_lift",
    oracle="""
    WITH assign AS (
      SELECT user_id,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                    THEN 'A' ELSE 'B' END AS arm,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    )
    SELECT arm, COUNT(*) AS n_users,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST(FLOOR(SUM(converted) * 1000000.0 / COUNT(*)) AS BIGINT)
             AS cvr_ppm
    FROM assign GROUP BY arm
    """,
)
def q_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users assigned to arms by md5 hash
    (deterministic, the same seed-free idiom as the dataset split),
    conversion = any purchase, per-arm conversion rate in integer ppm.
    The assignment-at-analysis-time shape is what you run when the
    experiment system didn't log exposures — hash assignment is
    reproducible post-hoc. One user-level aggregate, then two rows."""
    ev = load(spark, sf_dir, "events")
    assign = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).withColumn(
        "arm",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
            "A",
        ).otherwise("B"),
    )
    return assign.groupBy("arm").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").alias("n_converted"),
        F.floor(F.sum("converted") * 1000000.0 / F.count("*"))
        .cast("long").alias("cvr_ppm"),
    )
