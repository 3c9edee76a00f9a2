"""Temporal/time-series operators: versioned-dimension (SCD2) temporal
join, OHLC downsampling, watermark-lateness audit, and event-transition
matrix.

The temporal join is the batch form of Flink's temporal table join
([FLINK-API `TemporalTableFunction` /
`KeyedBroadcastProcessFunction`]): each event matches the dimension
version whose validity interval covers the event's timestamp — exactly
how the reference's broadcast rule state answers "which rule was active
when this event arrived". The lateness audit quantifies what a
watermark would drop ([FLINK-API
`WatermarkStrategy.forBoundedOutOfOrderness`]), turning the streaming
E5/E6 semantics into an oracle-checkable batch diagnostic.

Scale notes:
- Temporal join: the versioned dimension derives from the low-volume
  change stream (broadcast side by construction) — the probe side never
  shuffles; Spark plans BroadcastHashJoin on the equi key with the
  interval predicate as a post-join filter.
- OHLC: single hash aggregate, no window/sort — open/close use
  fixed-width-string arg-min/max keys (the engine's portable composite
  ordering idiom), so partial aggregation (map-side combine) applies.
- Lateness audit: running max is per-user (Flink watermarks are
  per-source-partition), so the window sort partitions cleanly; the
  global-watermark figure is the min over partitions of the same state.
- Transition matrix: lag over (user_id) windows reuses one Exchange;
  the ppm probabilities use integer arithmetic for cross-engine hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from flink_tutorial_broadcast_spark.registry import query


def _scd2_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase events as a versioned per-user dimension (see
    governance.q_scd2_build): each purchase opens a version carrying its
    value; lead(ts) closes the previous one."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("d_user_id"),
            F.row_number().over(w).alias("version"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.round("value", 2).alias("rule_value"),
        )
    )


@query(
    "q_temporal_join",
    oracle="""
    WITH dim AS (
      SELECT user_id AS d_user_id, ts AS valid_from,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS version,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to,
             ROUND(value, 2) AS rule_value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT e.event_id, e.user_id, e.event_type,
           d.version, d.rule_value
    FROM events e
    LEFT JOIN dim d
      ON d.d_user_id = e.user_id
     AND e.ts >= d.valid_from
     AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    WHERE e.event_type IN ('view', 'click')
    """,
)
def q_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (versioned-dimension) join: each view/click event picks
    up the purchase-version active at its event time — Flink's temporal
    table join, and the point-in-time-correct feature lookup every
    training pipeline needs (no future leakage: versions opened after
    the event can't match).

    LEFT join keeps events before the user's first purchase
    (version NULL). SCD2 intervals are disjoint per user, so the join
    is at-most-one-match by construction — row count equals the probe
    count (asserted in tests). The dimension derives from the low-volume
    change stream: Spark broadcast-joins it against the never-shuffled
    probe side.
    """
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click"))
        .select("event_id", "user_id", "event_type", "ts")
    )
    d = _scd2_dim(spark, sf_dir)
    return (
        e.join(
            F.broadcast(d),
            (F.col("d_user_id") == F.col("user_id"))
            & (F.col("ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
            "left",
        )
        .select("event_id", "user_id", "event_type", "version", "rule_value")
    )


@query(
    "q_ohlc",
    oracle="""
    WITH e AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             value,
             lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
               || lpad(CAST(event_id AS VARCHAR), 10, '0') AS ord
      FROM events
    )
    SELECT event_type, day,
           ROUND(arg_min(value, ord), 2) AS open,
           ROUND(MAX(value), 2)          AS high,
           ROUND(MIN(value), 2)          AS low,
           ROUND(arg_max(value, ord), 2) AS close,
           COUNT(*)                      AS volume
    FROM e GROUP BY event_type, day
    """,
)
def q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: daily open/high/low/close/volume bars per
    event_type — the canonical time-series resample.

    Single partial+final aggregate, no per-row window: open/close are
    arg-min/arg-max over a fixed-width string key (epoch-µs then
    event_id tiebreak — total order, so deterministic under ties). The
    string buffer makes Spark pick SortAggregate over HashAggregate,
    but the sort is on the (type, day) group key within each task and
    map-side combine still collapses each bar to one row per task
    before the single shuffle — the scalable shape either way.
    """
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        "value",
        F.concat(
            F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
            F.lpad(F.col("event_id").cast("string"), 10, "0"),
        ).alias("ord"),
    )
    return e.groupBy("event_type", "day").agg(
        F.round(F.min_by("value", F.col("ord")), 2).alias("open"),
        F.round(F.max("value"), 2).alias("high"),
        F.round(F.min("value"), 2).alias("low"),
        F.round(F.max_by("value", F.col("ord")), 2).alias("close"),
        F.count("*").alias("volume"),
    )


@query(
    "q_lateness_audit",
    oracle="""
    WITH a AS (
      SELECT event_type,
             (MAX(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW)
              - epoch_us(ts)) AS late_us
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN late_us > 600000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped_10m,
           MAX(late_us) AS max_late_us
    FROM a GROUP BY event_type
    """,
)
def q_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-lateness audit: with arrival order = event_id (ingest
    sequence) and a per-user running max of event time as the watermark
    state, how many events would a 10-minute
    bounded-out-of-orderness watermark drop, and how late is the worst
    straggler? This is the batch diagnostic for choosing the E5/E6
    watermark Δ — run it before picking `withWatermark`'s threshold.

    Per-user watermark mirrors Flink's per-source-partition watermarks
    and makes the running-max window partition cleanly (no global sort);
    µs-integer arithmetic keeps hashes engine-exact.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    a = load(spark, sf_dir, "events").select(
        "event_type",
        (F.max(F.unix_micros("ts")).over(w) - F.unix_micros("ts"))
        .alias("late_us"),
    )
    return a.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count_if(F.col("late_us") > 600_000_000).alias("n_dropped_10m"),
        F.max("late_us").alias("max_late_us"),
    )


@query(
    "q_transition_matrix",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ), t AS (
      SELECT event_type AS from_type, next_type AS to_type,
             COUNT(*) AS n
      FROM s WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           CAST((1000000 * n) // SUM(n) OVER (PARTITION BY from_type)
                AS BIGINT) AS p_ppm
    FROM t
    """,
)
def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: counts and row-normalized probabilities (integer ppm) for
    each (from_type → to_type) pair — the behavioral-analytics
    complement to the CEP pattern match (q_sequence_pattern).

    One shuffle on user_id for the lead(); the count aggregate reduces
    to 25 cells before the tiny normalization window. ppm via integer
    div keeps the result float-free.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = load(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    t = (
        s.filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"),
                 F.col("next_type").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
    wn = Window.partitionBy("from_type")
    return t.select(
        "from_type", "to_type", "n",
        F.expr("(1000000 * n) div sum(n) OVER (PARTITION BY from_type)")
        .alias("p_ppm"),
    )


@query(
    "q_time_weighted_avg",
    oracle="""
    WITH s AS (
      SELECT user_id, value,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
               - epoch_us(ts) AS dur_us
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_intervals,
           CAST(SUM(dur_us) AS BIGINT) AS total_us,
           ROUND(SUM(value * dur_us) / SUM(dur_us), 4) AS twa_value
    FROM s WHERE dur_us IS NOT NULL
    GROUP BY user_id HAVING SUM(dur_us) > 0
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per user: each observation is
    weighted by how long it was current (until the user's next event) —
    the correct mean for irregularly-sampled series, where the
    arithmetic mean over-weights bursts. This is the batch form of the
    piecewise-constant state a Flink keyed ValueState holds between
    events.

    One user_id shuffle; lead() and the aggregate share the same
    partitioning (single Exchange under AQE). Durations are integer µs
    (engine-exact); the single float division happens once per user at
    the end, rounded like every float aggregate in the engine. Users
    with one event (no interval) drop on both engines.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = load(spark, sf_dir, "events").select(
        "user_id", "value",
        (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts"))
        .alias("dur_us"),
    )
    return (
        s.filter(F.col("dur_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum("dur_us").alias("total_us"),
            F.round(F.sum(F.col("value") * F.col("dur_us"))
                    / F.sum("dur_us"), 4).alias("twa_value"),
        )
        .filter(F.col("total_us") > 0)
    )


@query(
    "q_resample_interp",
    oracle="""
    WITH s AS (
      SELECT user_id, value,
             lead(value) OVER w AS nval,
             epoch_us(ts) AS t0,
             epoch_us(lead(ts) OVER w) AS t1
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), seg AS (
      SELECT user_id, value, nval, t0, t1,
             ((t0 + 43199999999) // 43200000000) * 43200000000 AS g0
      FROM s WHERE t1 IS NOT NULL AND t1 > t0
    ), grid AS (
      SELECT user_id, value, nval, t0, t1,
             unnest(generate_series(make_timestamp(g0), make_timestamp(t1),
                                    INTERVAL 12 HOUR)) AS grid_ts
      FROM seg WHERE g0 <= t1
    )
    SELECT user_id, grid_ts,
           ROUND(value + (nval - value)
                 * (CAST(epoch_us(grid_ts) - t0 AS DOUBLE) / (t1 - t0)),
                 4) AS interp_value
    FROM grid
    WHERE epoch_us(grid_ts) < t1
    """,
)
def q_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's irregular event series onto a 12-hour grid by
    linear interpolation between the surrounding observations — the other
    half of time-series repair next to gap-fill (q_gap_fill fills a dense
    grid with zeros; this one estimates BETWEEN observations).

    Grid alignment is integer-exact (ceil to the 12 h boundary in µs);
    the one float expression — the interpolation fraction — is written
    with identical operand order on both engines, so IEEE doubles match
    bit-for-bit before the final ROUND. Per-user lead() and the segment
    explode share one user_id Exchange; the sequence() explode is
    map-side. Grid points falling exactly on an observation return that
    observation (fraction 0); the right endpoint belongs to the next
    segment (half-open intervals), so each grid point is emitted exactly
    once.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    step = 43_200_000_000  # 12 h in µs
    s = load(spark, sf_dir, "events").select(
        "user_id",
        "value",
        F.lead("value").over(w).alias("nval"),
        F.unix_micros("ts").alias("t0"),
        F.unix_micros(F.lead("ts").over(w)).alias("t1"),
    )
    seg = (
        s.filter(F.col("t1").isNotNull() & (F.col("t1") > F.col("t0")))
        .withColumn(
            # integer ceil-division (div, not /): float division + cast
            # could land one µs off near grid boundaries at large epochs
            "g0",
            F.expr(f"((t0 + {step - 1}) div {step}) * {step}"),
        )
        .filter(F.col("g0") <= F.col("t1"))
    )
    grid = seg.select(
        "user_id", "value", "nval", "t0", "t1",
        F.explode(
            F.sequence(
                F.timestamp_micros(F.col("g0")),
                F.timestamp_micros(F.col("t1")),
                F.expr("INTERVAL 12 HOURS"),
            )
        ).alias("grid_ts"),
    ).filter(F.unix_micros("grid_ts") < F.col("t1"))
    frac = (
        (F.unix_micros("grid_ts") - F.col("t0")).cast("double")
        / (F.col("t1") - F.col("t0"))
    )
    return grid.select(
        "user_id",
        "grid_ts",
        F.round(
            F.col("value") + (F.col("nval") - F.col("value")) * frac, 4
        ).alias("interp_value"),
    )


@query(
    "q_open_orders",
    oracle="""
    WITH ship AS (
      SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS shipped
      FROM lineitem GROUP BY l_orderkey
    ), deltas AS (
      SELECT CAST(o.o_orderdate AS DATE) AS d, 1 AS delta
      FROM orders o JOIN ship s ON o.o_orderkey = s.l_orderkey
      UNION ALL
      SELECT s.shipped AS d, -1 AS delta
      FROM orders o JOIN ship s ON o.o_orderkey = s.l_orderkey
    ), per_day AS (
      SELECT d, CAST(SUM(delta) AS BIGINT) AS net FROM deltas GROUP BY d
    )
    SELECT CAST(d AS TIMESTAMP) AS day, net,
           CAST(SUM(net) OVER (ORDER BY d
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW)
                AS BIGINT) AS n_open
    FROM per_day
    """,
)
def q_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval counting: orders in flight per day (placed
    but not yet fully shipped). Each order contributes +1 at its order
    date and −1 at its LAST ship date; the running sum of per-day nets
    IS the concurrent-interval count — O(n) instead of the O(n·days)
    day-spine range join, THE rewrite for "how many X were active at
    time t" at 100 TB. Boundary deltas aggregate per day before the
    (tiny, day-level) cumulative window."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    ship = li.groupBy("l_orderkey").agg(
        F.to_date(F.max("l_shipdate")).alias("shipped")
    )
    base = o.join(ship, o.o_orderkey == ship.l_orderkey)
    deltas = base.select(
        F.to_date("o_orderdate").alias("d"), F.lit(1).alias("delta")
    ).unionByName(
        base.select(F.col("shipped").alias("d"), F.lit(-1).alias("delta"))
    )
    per_day = deltas.groupBy("d").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.col("d").cast("timestamp").alias("day"),
        "net",
        F.sum("net").over(w).alias("n_open"),
    )
