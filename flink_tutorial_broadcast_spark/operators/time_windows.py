"""Event-time windows, batch-equivalent forms (SURVEY.md §2.E).

The reference's core domain: Flink tumbling/sliding/session/count windows
(``TumblingEventTimeWindows``, ``SlidingEventTimeWindows``,
``EventTimeSessionWindows``, ``KeyedStream#countWindow``). Each operator
here is the oracle-checkable batch formulation over the static ``events``
table; the true ``readStream`` formulations live in ``streaming/`` and are
semantically identical at the window/watermark level (micro-batch
execution; SURVEY.md §3.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_tutorial_broadcast_spark.io import load, local_rows_df
from flink_tutorial_broadcast_spark.registry import query


@query(
    "q_window_tumbling",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 tumbling 1h event-time window ≡ hour-bucket groupBy.

    Uses F.window (the streaming-identical construct) and projects
    window.start, so the same code shape lifts to readStream unchanged.
    """
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "sum_value")
    )


@query(
    "q_window_sliding",
    oracle="""
    WITH ws AS (
      SELECT unnest(generate_series(TIMESTAMP '2023-12-31 23:15:00',
                                    TIMESTAMP '2024-01-31 00:00:00',
                                    INTERVAL 15 MINUTE)) AS window_start
    )
    SELECT ws.window_start AS window_start,
           COUNT(*) AS n_events,
           ROUND(SUM(e.value), 2) AS sum_value
    FROM ws JOIN events e
      ON CAST(e.ts AS TIMESTAMP) >= ws.window_start
     AND CAST(e.ts AS TIMESTAMP) < ws.window_start + INTERVAL 1 HOUR
    GROUP BY 1
    """,
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 sliding window (1h size, 15min slide): each event lands in 4
    epoch-aligned windows. Oracle reproduces Spark's window assignment with
    a generated window-start series + range join."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events",
                "sum_value")
    )


@query(
    "q_window_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                    OR CAST(ts AS TIMESTAMP)
                       - lag(CAST(ts AS TIMESTAMP)) OVER w
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
    FROM numbered GROUP BY user_id, session_id
    """,
)
def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 session window (30min gap) per user — Flink
    ``EventTimeSessionWindows.withGap``. Spark's ``session_window`` merges
    events up to AND INCLUDING exactly gap apart (boundary pinned by
    tests/test_properties.py); the oracle is the gaps-and-islands rewrite
    (lag + cumulative flag sum) with the matching strict-> comparison."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"),
                 F.col("user_id"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select("user_id", F.col("w.start").alias("session_start"),
                "n_events", "sum_value")
    )


@query(
    "q_window_count",
    oracle="""
    WITH numbered AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id,
           CAST(floor((rn - 1) / 50) AS BIGINT) AS bucket,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM numbered GROUP BY 1, 2
    """,
)
def q_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 count window (Flink ``countWindow(50)``): per-key buckets of 50
    events in (ts, event_id) order — no Spark streaming equivalent; this is
    the deterministic batch form (event_id tiebreak keeps both engines'
    row_number identical)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("bucket",
                    F.floor((F.col("rn") - 1) / 50).cast("bigint"))
        .groupBy("user_id", "bucket")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
    )


@query(
    "q_dedup_first_event",
    oracle="""
    WITH numbered AS (
      SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT event_id, user_id, event_type, ts FROM numbered WHERE rn = 1
    """,
)
def q_dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8 keyed stateful dedup (Flink ``KeyedProcessFunction``+ValueState
    keep-first): earliest event per (user, type). Batch ≡ row_number()=1;
    streaming ≡ ``dropDuplicatesWithinWatermark`` (streaming/ demo)."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts")
    )


# --- C8 as-of join (temporal broadcast-state semantics) ---------------------

# Versioned rule history: (event_type, valid_from, threshold). An event is
# governed by the latest version with valid_from <= ts — exactly the
# broadcast-state-over-time semantics of processBroadcastElement updates.
RULE_VERSIONS: list[tuple[str, str, float]] = [
    ("click", "2024-01-01 00:00:00", 40.0),
    ("click", "2024-01-10 00:00:00", 25.0),
    ("click", "2024-01-20 00:00:00", 35.0),
    ("purchase", "2024-01-01 00:00:00", 70.0),
    ("purchase", "2024-01-15 00:00:00", 55.0),
    ("error", "2024-01-05 00:00:00", 45.0),
    ("view", "2024-01-01 00:00:00", 15.0),
    ("signup", "2024-01-08 00:00:00", 30.0),
]

_VERSIONS_SQL = (
    "(VALUES "
    + ", ".join(f"('{t}', TIMESTAMP '{v}', {th!r})"
                for t, v, th in RULE_VERSIONS)
    + ") AS rv(rule_event_type, valid_from, threshold)"
)


@query(
    "q_asof_join",
    oracle=f"""
    WITH candidates AS (
      SELECT e.event_id, e.event_type, e.value, rv.threshold,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY rv.valid_from DESC) AS rn
      FROM events e
      JOIN {_VERSIONS_SQL}
        ON e.event_type = rv.rule_event_type
       AND rv.valid_from <= CAST(e.ts AS TIMESTAMP)
    )
    SELECT event_id, event_type, threshold,
           CASE WHEN value > threshold THEN 1 ELSE 0 END AS fired
    FROM candidates WHERE rn = 1
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 as-of join: each event matched to the LATEST rule version with
    valid_from <= event ts (broadcast-state temporal semantics).

    Spark-first: broadcast the tiny version history, keep candidates with
    valid_from <= ts, pick latest via row_number over event_id. The version
    table never shuffles the fact side; the window runs on the already
    joined (still fact-partitioned) data. Scale alternative for big
    version histories: pd.merge_asof inside applyInPandas.
    """
    ev = load(spark, sf_dir, "events")
    rv = local_rows_df(
        spark, [(t, v, th) for t, v, th in RULE_VERSIONS],
        "rule_event_type string, valid_from string, threshold double",
    ).withColumn("valid_from", F.to_timestamp("valid_from"))
    j = ev.join(
        F.broadcast(rv),
        (ev.event_type == rv.rule_event_type) & (rv.valid_from <= ev.ts),
    )
    w = Window.partitionBy("event_id").orderBy(F.col("valid_from").desc())
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id", "event_type", "threshold",
            F.when(F.col("value") > F.col("threshold"), 1).otherwise(0)
            .alias("fired"),
        )
    )


@query(
    "q_asof_merge_pandas",
    oracle=f"""
    WITH candidates AS (
      SELECT e.event_id, e.event_type, e.value, rv.threshold,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY rv.valid_from DESC) AS rn
      FROM events e
      JOIN {_VERSIONS_SQL}
        ON e.event_type = rv.rule_event_type
       AND rv.valid_from <= CAST(e.ts AS TIMESTAMP)
    )
    SELECT event_id, event_type, threshold,
           CASE WHEN value > threshold THEN 1 ELSE 0 END AS fired
    FROM candidates WHERE rn = 1
    """,
)
def q_asof_merge_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 as-of join, scale-path formulation: the SAME temporal semantics
    as q_asof_join (latest version with valid_from <= ts, inner — events
    before the first version drop), but via cogrouped `pd.merge_asof`
    instead of broadcast+window. Identical oracle SQL ⇒ the two plans are
    hash-proven equivalent.

    This is the right shape when the version history is too big to
    broadcast: both sides hash-shuffle ONCE on the join key, each key
    group lands in one Arrow batch, and merge_asof is a linear two-
    pointer scan over the per-key sorted frames — O(n log n) per group
    versus the broadcast plan's O(n · versions) candidate blow-up.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value")
    rv = local_rows_df(
        spark, [(t, v, th) for t, v, th in RULE_VERSIONS],
        "rule_event_type string, valid_from string, threshold double",
    ).withColumn("valid_from", F.to_timestamp("valid_from"))

    cols = ["event_id", "event_type", "threshold", "fired"]

    def merge(evs, vers):
        import pandas as pd
        if evs.empty or vers.empty:
            return pd.DataFrame({c: [] for c in cols})
        m = pd.merge_asof(
            evs.sort_values("ts"),
            vers.sort_values("valid_from"),
            left_on="ts", right_on="valid_from", direction="backward")
        m = m.dropna(subset=["threshold"])
        m["fired"] = (m["value"] > m["threshold"]).astype("int32")
        return m[cols]

    return (
        ev.groupBy("event_type")
        .cogroup(rv.groupBy("rule_event_type"))
        .applyInPandas(
            merge,
            "event_id bigint, event_type string, threshold double, fired int")
    )


@query(
    "q_seasonality",
    oracle="""
    SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
           CAST(hour(ts) AS INT) AS hod,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality profile: the hour-of-day × day-of-week activity
    matrix (the heatmap behind every traffic dashboard, and the input
    to cyclic time features for training). Date-part extraction is
    map-side; the aggregate is bounded at 7×24 groups regardless of
    data size. Convention trap: Spark dayofweek is 1=Sunday..7 but
    DuckDB's is 0=Sunday..6 — the oracle shifts by +1 to align.
    """
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hod"),
    ).agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )
