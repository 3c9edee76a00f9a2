"""docs/migrate.md's runnable walkthrough (examples.py) must actually
hold: seek honored once, restart-resume exactly-once, the DLQ side
output partitioning the error channel, and the streaming aggregate
converging to the batch oracle over the seek-filtered log."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark import examples


def _kv_agg(df):
    return {(r["event_type"], r["severity"]): (r["n_matches"],
                                               r["sum_value"])
            for r in df.collect()}


def test_migration_walkthrough_end_to_end(spark):
    root = tempfile.mkdtemp(prefix="migrate_log_")
    dlq, agg, batch_ids = examples.run_streaming(
        spark, root, produce_rounds=2, events_per_round=60)

    # two produce→resume rounds ⇒ at least one DLQ batch per round,
    # with strictly advancing batch ids (checkpoint resumed, not reset)
    assert len(batch_ids) >= 2
    assert batch_ids == sorted(batch_ids)

    # ground truth: the batch read of the final log, minus the records
    # the fresh-checkpoint seek skipped
    after_seek = examples.expected_after_seek(spark, root).cache()
    want_errors = {r["event_id"] for r in
                   after_seek.filter("event_type = 'error'").collect()}
    got_errors = {r["event_id"] for r in dlq.collect()}
    assert got_errors == want_errors and got_errors

    # the aggregate snapshot equals the facade program's batch run over
    # the seek-filtered events (same body — examples.program)
    from flink_tutorial_broadcast_spark.datastream import (
        StreamExecutionEnvironment,
    )
    from flink_tutorial_broadcast_spark.sources.rules import rules_df
    env = StreamExecutionEnvironment.get_execution_environment(spark)
    _, want_agg = examples.program(
        env.from_dataframe(after_seek), rules_df(spark))
    assert _kv_agg(agg) == _kv_agg(want_agg.to_df())

    # seek actually skipped something: the full batch read has MORE
    # error rows than the DLQ iff a skipped offset was an error row,
    # and in any case more total rows than after_seek
    full_errors, full_agg = examples.run_batch(spark, root)
    assert (full_errors.count()
            >= after_seek.filter("event_type = 'error'").count())
    n_full = (spark.read.format("ftbs_eventlog")
              .option("path", root).load().count())
    assert n_full == after_seek.count() + sum(examples.SEEK.values())
    after_seek.unpersist()
