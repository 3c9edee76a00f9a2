"""The broadcast rule set — the reference's control/``ruleStream`` analogue.

In the reference (Flink broadcast-state tutorial; SURVEY.md §0), a
low-volume rule stream is ``.broadcast(MapStateDescriptor)`` to every
parallel subtask and matched against a keyed event stream inside a
``KeyedBroadcastProcessFunction``. Here the rule set is a tiny dimension
DataFrame that the engine always joins with an explicit ``F.broadcast``
(pinning the reference's replication semantics rather than relying on the
autoBroadcast threshold — SURVEY.md §4).

The rule content is a deterministic constant so the DuckDB oracle can
reproduce it as an inline VALUES relation (``RULES_SQL``).

Scale note: a rule/dim table of thousands-to-millions of rows still
broadcasts fine (replicated once per executor, not per task); past the
broadcast threshold the same join degrades gracefully to shuffle-hash —
only the ``F.broadcast`` hint would be dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from flink_tutorial_broadcast_spark.io import local_rows_df

# (event_type, threshold, severity): an event "fires" a rule when its value
# exceeds the threshold for its type. Mirrors the tutorial's type→rule map.
RULES: list[tuple[str, float, str]] = [
    ("click", 30.0, "low"),
    ("view", 10.0, "low"),
    ("purchase", 60.0, "high"),
    ("signup", 20.0, "medium"),
    ("error", 50.0, "high"),
]

RULES_SCHEMA = StructType([
    StructField("rule_event_type", StringType(), False),
    StructField("threshold", DoubleType(), False),
    StructField("severity", StringType(), False),
])

# DuckDB-side mirror of RULES for oracle queries; keep in exact sync.
RULES_SQL = (
    "(VALUES "
    + ", ".join(f"('{t}', {th!r}, '{sev}')" for t, th, sev in RULES)
    + ") AS rules(rule_event_type, threshold, severity)"
)


def rules_df(spark: SparkSession) -> DataFrame:
    """The rule dimension as an inline DataFrame (A1 collection source)."""
    return local_rows_df(spark, RULES, RULES_SCHEMA)


# --- Mutable-rule-stream constants (the processBroadcastElement story) ---
#
# The reference's rule stream is not static: `processBroadcastElement`
# UPSERTS the per-type rule while events flow. The engine models that as
# two deterministic rule WAVES on a total order shared with the events
# (events sit at odd sequence numbers 2*event_id+1; rules at even ones,
# so "rule before event" is never a tie):
#   wave 1 (seq -100..-96): the initial RULES, before every event;
#   wave 2 (seq 2*(floor(median(event_id)) + i)): the mutation — same
#     rule_id per type, doubled threshold, severity prefixed "v2-" —
#     landing mid-stream so roughly half the events match under each
#     version. Both engines derive the wave-2 seq from the data
#     identically (floored interpolated median), keeping the oracle pure
#     SQL.
RULES_V2: list[tuple[str, float, str]] = [
    (t, th * 2, "v2-" + sev) for (t, th, sev) in RULES
]

RULE_WAVE1_SEQ_BASE = -100  # wave-1 rule i sits at seq BASE + i


def rule_waves_df(spark: SparkSession, med: int) -> DataFrame:
    """Both rule waves as one sequenced upsert stream:
    (seq, rule_id, rule_event_type, threshold, severity)."""
    rows = [
        (RULE_WAVE1_SEQ_BASE + i, "rule-" + t, t, th, sev)
        for i, (t, th, sev) in enumerate(RULES)
    ] + [
        (2 * (med + i), "rule-" + t, t, th, sev)
        for i, (t, th, sev) in enumerate(RULES_V2)
    ]
    return local_rows_df(
        spark, rows, "seq long, rule_id string, rule_event_type string, "
                     "threshold double, severity string")


def rule_waves_sql(med_cte: str = "med") -> str:
    """DuckDB mirror of ``rule_waves_df``: a CTE body selecting both
    waves, with wave-2 seqs referencing ``{med_cte}(m)``."""
    w1 = ", ".join(
        f"({RULE_WAVE1_SEQ_BASE + i}, 'rule-{t}', '{t}', {th!r}, '{sev}')"
        for i, (t, th, sev) in enumerate(RULES))
    w2 = ", ".join(
        f"({i}, 'rule-{t}', '{t}', {th!r}, '{sev}')"
        for i, (t, th, sev) in enumerate(RULES_V2))
    return (
        f"SELECT seq, rule_id, rule_event_type, threshold, severity "
        f"FROM (VALUES {w1}) "
        f"AS w1(seq, rule_id, rule_event_type, threshold, severity) "
        f"UNION ALL "
        f"SELECT 2 * (m.m + i), rule_id, rule_event_type, threshold, "
        f"severity FROM (VALUES {w2}) "
        f"AS w2(i, rule_id, rule_event_type, threshold, severity), "
        f"{med_cte} m"
    )
