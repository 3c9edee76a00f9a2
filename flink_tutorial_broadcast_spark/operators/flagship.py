"""Flagship pipeline — the reference's headline semantics in batch form.

Reference shape (SURVEY.md §0, canonical broadcast-state program):
keyed event stream ⋈ broadcast rule set (equi on type + theta on value
threshold) → event-time tumbling window aggregation. Re-expressed
Spark-first: ``events ⋈ F.broadcast(rules)`` → Catalyst plans a
BroadcastHashJoin (equi key carries the hash; theta predicate evaluated
post-probe, still broadcast — no shuffle of the fact side), then a
partial+final hash aggregate on (hour, type).

At 100 TB: the only shuffle is the final aggregation on
(hour-bucket × event_type) — low cardinality, map-side partials shrink it
to ~|groups|×|partitions| rows. The fact scan prunes to 3 columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from flink_tutorial_broadcast_spark.registry import query
from flink_tutorial_broadcast_spark.sources.rules import RULES_SQL, rules_df


def broadcast_rule_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events matched against the broadcast rule set (C1 equi + C2 theta)."""
    events = load(spark, sf_dir, "events")
    rules = rules_df(spark)
    return events.join(
        F.broadcast(rules),
        (events.event_type == rules.rule_event_type)
        & (events.value > rules.threshold),
        "inner",
    )


@query(
    "q_broadcast_rule_join",
    oracle=f"""
    SELECT e.event_type AS event_type,
           rules.severity AS severity,
           date_trunc('hour', CAST(e.ts AS TIMESTAMP)) AS window_start,
           COUNT(*) AS n_matches,
           ROUND(SUM(e.value), 2) AS sum_value,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e
    JOIN {RULES_SQL}
      ON e.event_type = rules.rule_event_type
     AND e.value > rules.threshold
    GROUP BY 1, 2, 3
    """,
)
def q_broadcast_rule_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+C2+E1 composed: broadcast rule join + tumbling 1h window agg."""
    matched = broadcast_rule_matches(spark, sf_dir)
    return (
        matched
        .groupBy(
            F.col("event_type"),
            F.col("severity"),
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
        )
        .agg(
            F.count("*").alias("n_matches"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "q_broadcast_theta_join",
    oracle=f"""
    SELECT e.event_id, e.event_type, ROUND(e.value, 2) AS value,
           rules.severity AS severity
    FROM events e
    JOIN {RULES_SQL}
      ON e.event_type = rules.rule_event_type
     AND e.value > rules.threshold
    WHERE e.event_id < 20000
    """,
)
def q_broadcast_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 standalone: the broadcast theta join at row granularity (the
    per-record rule-match output a Flink KeyedBroadcastProcessFunction
    emits, before any windowing). The equi key rides the broadcast hash
    table; the `value > threshold` theta predicate evaluates post-probe —
    the fact side never shuffles."""
    matched = broadcast_rule_matches(spark, sf_dir)
    return (
        matched.filter(F.col("event_id") < 20000)
        .select("event_id", "event_type",
                F.round("value", 2).alias("value"), "severity")
    )


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """Entry-point flagship for the driver's t1 smoke check."""
    return q_broadcast_rule_join(spark, sf_dir)
