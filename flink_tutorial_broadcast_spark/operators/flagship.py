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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from flink_tutorial_broadcast_spark.registry import query
from flink_tutorial_broadcast_spark.sources.rules import (
    RULES_SQL,
    rule_waves_df,
    rule_waves_sql,
    rules_df,
)


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


def rule_mutation_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events matched against the MUTABLE rule stream (E9's batch twin,
    unrounded): the per-record `processBroadcastElement` semantics —
    each event sees exactly the rule version in effect at its position
    on the shared (events ∪ rule-waves) total order.

    Scale shape: the rule stream is tiny, so its versions are turned
    into validity intervals [valid_from, valid_to) with one LEAD window
    over 10 rows, then BROADCAST range-joined to the fact — the fact
    side never shuffles and never runs a window; this is the SCD2 /
    temporal-join layout, not a fact-scale last-value window.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value",
        (F.col("event_id") * 2 + 1).alias("seq"))
    med = int(ev.agg(
        F.floor(F.expr("percentile(event_id, 0.5)")).cast("long")
        .alias("m")).collect()[0]["m"])  # bounded: ONE row
    wr = Window.partitionBy("rule_id").orderBy("valid_from")
    versions = (
        rule_waves_df(spark, med)
        .withColumnRenamed("seq", "valid_from")
        .withColumn("valid_to", F.lead("valid_from").over(wr))
    )
    cond = (
        (ev.event_type == versions.rule_event_type)
        & (versions.valid_from < ev.seq)
        & (versions.valid_to.isNull() | (ev.seq < versions.valid_to))
        & (ev.value > versions.threshold)
    )
    return ev.join(F.broadcast(versions), cond, "inner").select(
        "event_id", "event_type", "value", "threshold", "severity")


@query(
    "q_broadcast_rule_mutation",
    oracle=f"""
    WITH med AS (
      SELECT CAST(FLOOR(MEDIAN(event_id)) AS BIGINT) AS m FROM events
    ),
    rw AS ({rule_waves_sql("med")}),
    versions AS (
      SELECT rule_id, rule_event_type, threshold, severity,
             seq AS valid_from,
             LEAD(seq) OVER (PARTITION BY rule_id ORDER BY seq) AS valid_to
      FROM rw
    ),
    ev AS (
      SELECT event_id, event_type, value, 2 * event_id + 1 AS seq
      FROM events
    )
    SELECT e.event_id, e.event_type, ROUND(e.value, 2) AS value,
           v.threshold AS threshold, v.severity AS severity
    FROM ev e JOIN versions v
      ON e.event_type = v.rule_event_type
     AND v.valid_from < e.seq
     AND (v.valid_to IS NULL OR e.seq < v.valid_to)
     AND e.value > v.threshold
    """,
)
def q_broadcast_rule_mutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9 with the reference's PER-RECORD rule-update semantics, batch
    form: rules arrive as a sequenced upsert stream interleaved with the
    events; an event matches the rule version in effect AT ITS SEQUENCE
    POSITION (wave 1 before the median event, the doubled-threshold
    "v2-" wave after). The streaming twin
    (streaming/jobs.broadcast_rules_union_tws) runs the identical
    semantics as a tagged union through one transformWithStateInPandas
    processor with the rules in MapState, and is test-pinned equal."""
    m = rule_mutation_matches(spark, sf_dir)
    return m.select(
        "event_id", "event_type", F.round("value", 2).alias("value"),
        "threshold", "severity")


@query(
    "q_facade_program",
    oracle=f"""
    SELECT e.event_type AS event_type,
           rules.severity AS severity,
           date_trunc('hour', CAST(e.ts AS TIMESTAMP)) AS window_start,
           COUNT(*) AS n_matches,
           ROUND(SUM(e.value), 2) AS sum_value
    FROM events e
    JOIN {RULES_SQL}
      ON e.event_type = rules.rule_event_type
     AND e.value > rules.threshold
    WHERE e.value >= 1
    GROUP BY 1, 2, 3
    """,
)
def q_facade_program(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical tutorial program's flagship branch built ENTIRELY
    through the DataStream facade's fast (expression/codegen) path —
    the driver-verifiable proof that the fluent migration surface emits
    the same Catalyst plans as the operator keys: side-output routing
    (value<1 rows to the error channel), broadcast rule match, keyed
    tumbling-window aggregate. The identical body's streaming run and
    its keyed-state/timer branch are pinned by the canonical-program
    tests in tests/test_datastream.py."""
    from flink_tutorial_broadcast_spark.datastream import (
        StreamExecutionEnvironment,
    )
    env = StreamExecutionEnvironment.get_execution_environment(spark)
    routed = (env.from_dataframe(load(spark, sf_dir, "events"))
              .split({"errors": "value < 1"}))
    return (routed.main()
            .connect_broadcast(
                rules_df(spark),
                on="event_type = rule_event_type AND value > threshold")
            .key_by("event_type", "severity")
            .window_tumbling("ts", "hour")
            .aggregate(n_matches="count(*)",
                       sum_value="round(sum(value), 2)")
            .to_df())


@query(
    "q_stream_join_facade",
    oracle="""
    SELECT c.user_id AS user_id,
           date_trunc('hour', CAST(c.ts AS TIMESTAMP)) AS window_start,
           c.event_id AS click_id, e.event_id AS error_id
    FROM events c JOIN events e
      ON c.user_id = e.user_id
     AND date_trunc('hour', CAST(c.ts AS TIMESTAMP))
         = date_trunc('hour', CAST(e.ts AS TIMESTAMP))
    WHERE c.event_type = 'click' AND e.event_type = 'error'
    """,
)
def q_stream_join_facade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Flink windowed two-stream join written through the facade
    [FLINK-API: a.join(b).where(kL).equalTo(kR).window(
    TumblingEventTimeWindows.of(Time.hours(1))).apply(fn)]: click/error
    row pairs sharing (user, hour), compiled to ONE codegen equi-join
    on (key, bucket) — driver-verifiable proof of the JoinedStreams
    verb (row-grain C9; the aggregated form is q_window_join)."""
    from flink_tutorial_broadcast_spark.datastream import (
        StreamExecutionEnvironment,
    )
    env = StreamExecutionEnvironment.get_execution_environment(spark)
    ev = load(spark, sf_dir, "events")
    clicks = env.from_dataframe(
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts", "event_id"))
    errors = env.from_dataframe(
        ev.filter(F.col("event_type") == "error")
        .select("user_id", "ts", "event_id"))
    return (clicks.join(errors).where("user_id").equal_to("user_id")
            .window_tumbling("ts", "hour")
            .to_df()
            .select("user_id", "window_start",
                    F.col("event_id").alias("click_id"),
                    F.col("event_id_r").alias("error_id")))


@query(
    "q_reduce_facade",
    oracle="""
    SELECT user_id, event_id, value FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_reduce_facade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink KeyedStream.reduce(ReduceFunction) through the facade: an
    arbitrary Python pairwise merge (keep the richer record, event_id
    breaking value ties) folded per key in deterministic order — the
    ported-ReduceFunction surface, driver-verified against the
    relational max_by twin. Row-in = row-out per the Flink contract;
    the fold runs on the Arrow grouped-map path (one key shuffle)."""
    from flink_tutorial_broadcast_spark.datastream import (
        StreamExecutionEnvironment,
    )
    env = StreamExecutionEnvironment.get_execution_environment(spark)
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")

    def richer(a, b):
        return b if (b["value"], -b["event_id"]) > (a["value"], -a["event_id"]) else a

    return (env.from_dataframe(ev).key_by("user_id")
            .reduce(richer)
            .to_df()
            .select("user_id", "event_id", "value"))


@query(
    "q_window_all_facade",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY 1
    """,
)
def q_window_all_facade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-keyed windowAll through the facade [FLINK-API:
    DataStream.windowAll(TumblingEventTimeWindows.of(Time.hours(1)))
    .aggregate(...)]: Flink runs windowAll at parallelism 1 (every
    record to one subtask); the engine compiles the window bucket as
    the grouping key, so the SAME program is a partial-agg + tiny
    exchange — results identical, scan fully parallel. Round-8 facade
    verb (datastream.DataStream.window_all_tumbling)."""
    from flink_tutorial_broadcast_spark.datastream import (
        StreamExecutionEnvironment,
    )
    env = StreamExecutionEnvironment.get_execution_environment(spark)
    return (env.from_dataframe(load(spark, sf_dir, "events"))
            .window_all_tumbling("ts", "hour")
            .aggregate(n="count(*)",
                       sum_value="round(sum(value), 2)")
            .to_df())


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """Entry-point flagship for the driver's t1 smoke check."""
    return q_broadcast_rule_join(spark, sf_dir)
