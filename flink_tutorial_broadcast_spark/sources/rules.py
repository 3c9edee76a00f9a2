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
    return spark.createDataFrame(RULES, RULES_SCHEMA)
