"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource`) — the
engine's analogue of Flink's user-defined `SourceFunction`
([FLINK-API `o.a.f.streaming.api.functions.source.SourceFunction`],
SURVEY.md §2.A4: the tutorial family's hand-rolled rule/event emitters).

Where Flink gives you `run(SourceContext)` + a cancel flag, Spark 4's
Python Data Source API gives you a planner-integrated source: you
declare a schema and a PARTITION LIST, and each partition's `read()`
runs as an independent task — so a custom generator is parallel,
retryable, and pruneable by Catalyst like any built-in source, instead
of a single-threaded emitter.

The generator below deterministically synthesizes the engine's rule
dimension (sources/rules.py RULES), sharded one rule per partition, so
the oracle can mirror it as an inline VALUES relation. It is
deliberately tiny — the point is the mechanism: swap `read()` for a
Kafka-offset range, an HTTP page range, or a synthetic-bench generator
and the parallelism story is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from flink_tutorial_broadcast_spark.sources.rules import RULES


class _RulePartition(InputPartition):
    def __init__(self, index: int) -> None:
        self.index = index


class RulesSourceReader(DataSourceReader):
    def partitions(self) -> list[InputPartition]:
        # one partition per rule: proves task-parallel custom generation
        return [_RulePartition(i) for i in range(len(RULES))]

    def read(self, partition: _RulePartition) -> Iterator[tuple]:
        event_type, threshold, severity = RULES[partition.index]
        yield (event_type, float(threshold), severity)


class RulesDataSource(DataSource):
    """`spark.read.format("ftbs_rules")` — custom-generated rule rows."""

    @classmethod
    def name(cls) -> str:
        return "ftbs_rules"

    def schema(self) -> str:
        return "rule_event_type string, threshold double, severity string"

    def reader(self, schema) -> RulesSourceReader:
        return RulesSourceReader()


def register(spark) -> None:
    """Register the custom format on this session.

    `spark.dataSource.register` is itself idempotent (re-registering the
    same class silently replaces the prior registration), so a genuine
    failure — missing Python Data Source API, serialization error — must
    propagate here rather than resurface later as a confusing
    "format ftbs_rules not found" at read time."""
    spark.dataSource.register(RulesDataSource)


# --- Streaming form (A4's unbounded half) -----------------------------------
# Flink's SourceFunction.run() loop with checkpointed state maps to Spark 4's
# SimpleDataSourceStreamReader: the OFFSET ({"index": n}) is the checkpointed
# state, read(start) emits the next deterministic slice and advances it, and
# readBetweenOffsets(start, end) REGENERATES a committed slice on replay —
# which is exactly the replayability contract a Kafka-class source satisfies
# with (partition, offset) ranges (docs/kafka.md).

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402

_STREAM_BATCH = 500
_STREAM_MAX = 2000  # bounded demo horizon; production sources are unbounded
_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def _synth_row(i: int) -> tuple:
    """Deterministic event i — pure function of the offset, any replica
    or replay regenerates it bit-identically (no RNG state)."""
    return (
        i,
        i % 100,
        _EVENT_TYPES[i % 5],
        float((i * 37) % 500),
    )


class EventStreamReader(SimpleDataSourceStreamReader):
    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        lo = start["index"]
        hi = min(lo + _STREAM_BATCH, _STREAM_MAX)
        # list iterator, not a generator: the engine's prefetch cache
        # copy.copy()s the iterator (generators aren't copyable)
        return iter([_synth_row(i) for i in range(lo, hi)]), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay path: regenerate the committed range deterministically
        return iter([_synth_row(i)
                     for i in range(start["index"], end["index"])])

    def commit(self, end: dict) -> None:
        pass  # nothing external to acknowledge; offsets live in the checkpoint


class EventStreamDataSource(DataSource):
    """`readStream.format("synthetic_events")` — custom streaming source."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return ("event_id long, user_id long, event_type string, "
                "value double")

    def simpleStreamReader(self, schema) -> EventStreamReader:
        return EventStreamReader()


def register_streaming(spark) -> None:
    spark.dataSource.register(EventStreamDataSource)
