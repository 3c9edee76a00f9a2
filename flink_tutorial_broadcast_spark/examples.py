"""The "migrate your Flink job" end-to-end example (docs/migrate.md).

One runnable program composing the pieces a real migration touches, in
the order a reference user meets them:

  1. a partitioned, offset-addressed EVENT LOG (the Kafka stand-in:
     sources/eventlog.py — L116 seek grammar + L122 admission control),
  2. the DataStream FACADE program body (datastream.py): side-output
     routing (L113 / Flink OutputTag), broadcast rule matching (C1 /
     KeyedBroadcastProcessFunction), keyed windowless aggregation,
  3. two sinks: an idempotent per-batch DLQ for the error channel and
     a complete-mode aggregate for the main channel.

The SAME program body runs over the log in batch mode (the oracle path
the test pins) and in streaming mode (availableNow micro-batches with a
maxRecordsPerTrigger admission cap and a startingOffsets seek). In
production the only change is `format("ftbs_eventlog")` →
`format("kafka")` plus value deserialization (docs/kafka.md).
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.datastream import (
    DataStream,
    StreamExecutionEnvironment,
)
from flink_tutorial_broadcast_spark.sources import eventlog
from flink_tutorial_broadcast_spark.sources.rules import rules_df

N_LOG_PARTITIONS = 2
ADMISSION_CAP = 40  # maxRecordsPerTrigger: records admitted per batch
SEEK = {"0": 2, "1": 0}  # startingOffsets: skip partition 0's first 2


def produce_demo_log(root: str, n_events: int = 120) -> None:
    """The 'topic': deterministic events, ~1 in 6 an operational error
    record (the side-output/DLQ channel's input)."""
    rows = [
        (i, i % 7,
         "error" if i % 6 == 5 else ("purchase" if i % 3 == 0 else "view"),
         float((i * 37) % 160))
        for i in range(n_events)
    ]
    eventlog.log_write(root, rows, n_partitions=N_LOG_PARTITIONS)


def program(events: DataStream, rules: DataFrame):
    """THE migrated job body — written once, used for batch and
    streaming. Flink shape:

        events.process(routeErrors)           // OutputTag side output
              .connect(rules.broadcast())     // broadcast state
              .process(matchRules)
              .keyBy(type, severity).sum(...)

    Facade translation (each verb's engine key named in docs/migrate.md):
    """
    routed = events.split({"errors": "event_type = 'error'"})
    matches = routed.main().connect_broadcast(
        rules, on="event_type = rule_event_type AND value > threshold")
    agg = (matches
           .key_by("event_type", "severity")
           .aggregate(n_matches="count(*)",
                      sum_value="round(sum(value), 2)"))
    return routed.get_side_output("errors"), agg


def run_batch(spark: SparkSession, root: str):
    """The oracle path: the identical program body over the log's batch
    reader (full log, no seek — seek/admission are stream-read knobs)."""
    eventlog.register(spark)
    env = StreamExecutionEnvironment.get_execution_environment(spark)
    src = env.from_dataframe(
        spark.read.format("ftbs_eventlog").option("path", root).load())
    errors, agg = program(src, rules_df(spark))
    return errors.to_df(), agg.to_df()


def run_streaming(spark: SparkSession, root: str,
                  produce_rounds: int = 2, events_per_round: int = 60):
    """The production path, including the operational lifecycle: each
    round PRODUCES a segment batch then RESUMES the same checkpointed
    query over it (availableNow), so the example demonstrates seek
    (honored once, on the fresh checkpoint), restart-resume (each later
    round picks up exactly the new records), the per-batch-idempotent
    DLQ, and a complete-mode aggregate snapshot. The admission cap is
    set as it would be in production; its enforcement applies to
    steady-state batches (the first batch of each run is uncapped — the
    documented Python-DataSource divergence, pinned by
    test_eventlog_max_records_per_trigger_rate_limit).

    Returns (dlq_df, agg_df, batch_ids_seen)."""
    eventlog.register(spark)
    env = StreamExecutionEnvironment.get_execution_environment(spark)
    work = tempfile.mkdtemp(prefix="migrate_")
    dlq_root = os.path.join(work, "dlq")
    agg_root = os.path.join(work, "agg")
    ckpt_dlq = os.path.join(work, "ckpt_dlq")
    ckpt_agg = os.path.join(work, "ckpt_agg")
    seen_batches: list[int] = []

    def to_dlq(batch_df: DataFrame, batch_id: int) -> None:
        # per-batch overwrite dir = exactly-once on at-least-once replay
        seen_batches.append(batch_id)
        (batch_df.write.mode("overwrite")
         .parquet(os.path.join(dlq_root, f"batch={batch_id}")))

    def agg_snapshot(batch_df: DataFrame, batch_id: int) -> None:
        # complete-mode snapshot per batch; the latest dir is the table
        (batch_df.write.mode("overwrite")
         .parquet(os.path.join(agg_root, f"batch={batch_id}")))

    for rnd in range(produce_rounds):
        if rnd == 0:
            produce_demo_log(root, n_events=events_per_round)
        else:
            eventlog.log_write(root, [
                (1000 * rnd + i, i % 7,
                 "error" if i % 6 == 5 else
                 ("purchase" if i % 3 == 0 else "view"),
                 float((i * 53) % 160))
                for i in range(events_per_round)
            ], n_partitions=N_LOG_PARTITIONS)
        sdf = (spark.readStream.format("ftbs_eventlog")
               .option("path", root)
               .option("startingOffsets", json.dumps(SEEK))
               .option("maxRecordsPerTrigger", str(ADMISSION_CAP))
               .load())
        errors, agg = program(env.from_dataframe(sdf), rules_df(spark))

        # drain loop: an availableNow run on a RESUMED checkpoint can
        # stop after one admission-capped batch (its terminal target is
        # planned from the restored baseline + cap), so re-run until the
        # committed offset stops advancing — the standard bounded-drain
        # pattern for rate-limited sources
        def committed_batches(ckpt: str) -> int:
            d = os.path.join(ckpt, "commits")
            return len(os.listdir(d)) if os.path.isdir(d) else 0

        for make_q, ckpt in (
            (lambda: errors.to_df().writeStream.foreachBatch(to_dlq)
             .option("checkpointLocation", ckpt_dlq)
             .trigger(availableNow=True), ckpt_dlq),
            (lambda: agg.to_df().writeStream.foreachBatch(agg_snapshot)
             .outputMode("complete")
             .option("checkpointLocation", ckpt_agg)
             .trigger(availableNow=True), ckpt_agg),
        ):
            prev = -1
            while committed_batches(ckpt) != prev:
                prev = committed_batches(ckpt)
                q = make_q().start()
                q.awaitTermination()

    dlq = spark.read.option("recursiveFileLookup", "true").parquet(dlq_root)
    latest = max(int(d.split("=")[1]) for d in os.listdir(agg_root))
    agg_df = spark.read.parquet(os.path.join(agg_root, f"batch={latest}"))
    return dlq, agg_df, sorted(set(seen_batches))


def expected_after_seek(spark: SparkSession, root: str):
    """What the seek skips: the batch read MINUS the first SEEK[p]
    offsets of each partition — computed relationally for the test."""
    eventlog.register(spark)
    full = (spark.read.format("ftbs_eventlog").option("path", root).load()
            .withColumn("p", F.col("user_id") % N_LOG_PARTITIONS))
    w_rank = F.row_number().over(
        Window.partitionBy("p").orderBy("event_id"))
    skip = F.when(F.col("p") == 0, SEEK["0"]).otherwise(SEEK["1"])
    return (full.withColumn("rn", w_rank)
            .filter(F.col("rn") > skip)
            .drop("p", "rn"))


def run_round7_extensions(spark: SparkSession, root: str):
    """The round-7 surfaces in walkthrough form, over the same demo log:

      4. ASYNC enrichment of the rule matches [FLINK-API:
         AsyncDataStream.orderedWait(fn, timeout, capacity)] — a
         deterministic fake lookup service through `map_async` with a
         deadline (a real migration points `fn` at its HTTP/JDBC client
         and supplies `on_timeout`),
      5. CEP on the keyed stream [FLINK-API: CEP.pattern] — each user's
         view→purchase conversions via `pattern()`, the log's offsets
         synthesized into event time,
      6. a TRANSACTIONAL landing zone [FLINK-API:
         TwoPhaseCommitSinkFunction] — the log streamed through the
         two-phase-commit file sink; only manifest-committed files are
         readable.

    Returns (enriched_df, conversions_df, landed_df, sink)."""
    from flink_tutorial_broadcast_spark.cep import Pattern
    from flink_tutorial_broadcast_spark.streaming.two_phase_sink import (
        TwoPhaseCommitFileSink,
    )

    eventlog.register(spark)
    env = StreamExecutionEnvironment.get_execution_environment(spark)
    raw = spark.read.format("ftbs_eventlog").option("path", root).load()
    # the log carries offsets, not timestamps — synthesize event time
    # (1 min per offset) once, on the facade's codegen path
    src = env.from_dataframe(raw).map({
        "event_id": "event_id", "user_id": "user_id",
        "event_type": "event_type", "value": "value",
        "ts": "timestamp_micros(event_id * 60000000)"})

    # 4) async enrichment of the broadcast-rule matches
    def lookup_service(row: dict) -> dict:
        # stands in for an external call; deterministic so the test can
        # recompute it relationally
        return {"event_id": row["event_id"],
                "category": "big" if row["value"] >= 100.0 else "small"}

    enriched = (src.connect_broadcast(
        rules_df(spark),
        on="event_type = rule_event_type AND value > threshold")
        .map_async(lookup_service, "event_id long, category string",
                   concurrency=8, timeout=10.0))

    # 5) CEP: each user's view→purchase conversions (relaxed contiguity)
    pat = Pattern.begin("v", "view").followed_by("p", "purchase")
    conversions = src.key_by("user_id").pattern(pat)

    # 6) transactional landing: stream the log into the 2PC sink
    sink = TwoPhaseCommitFileSink(tempfile.mkdtemp(prefix="migrate_2pc_"))
    q = (spark.readStream.format("ftbs_eventlog").option("path", root)
         .load()
         .writeStream.foreachBatch(sink.foreach_batch())
         .option("checkpointLocation",
                 tempfile.mkdtemp(prefix="migrate_2pc_ckpt_"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    landed = sink.committed_df(spark)
    return enriched.to_df(), conversions.to_df(), landed, sink


def run_round8_extensions(spark: SparkSession, root: str):
    """The round-8 surfaces in walkthrough form, same demo log:

      7. MIXED-contiguity CEP with a REPEATED stage type [FLINK-API:
         Pattern.begin(x).followedBy(x).next(y)] — two views in any
         gap, then a purchase as the IMMEDIATE next event; the shape
         that needed round 8's stage-index machines and strict-await
         flags (either feature alone refuses or mis-counts it),
      8. async enrichment WITH RETRY [FLINK-API:
         AsyncDataStream.orderedWaitWithRetry +
         AsyncRetryStrategies.fixedDelayRetry] — a lookup whose first
         answer is retryable-empty resolves on the retry attempt,
      9. an IDLE co-stream un-starved by the withIdleness emulation —
         the demo log's rows as a watermarked file stream unioned with
         a never-producing input; the heartbeat advances the idle
         watermark so hourly append windows flow.

    Returns (conversions_df, enriched_df, windows_df)."""
    from flink_tutorial_broadcast_spark.cep import Pattern
    from flink_tutorial_broadcast_spark.streaming.idleness import (
        IdleSourceHeartbeat, strip_heartbeats,
    )
    from flink_tutorial_broadcast_spark.streaming.jobs import (
        _run_to_memory,
    )

    eventlog.register(spark)
    env = StreamExecutionEnvironment.get_execution_environment(spark)
    raw = spark.read.format("ftbs_eventlog").option("path", root).load()
    src = env.from_dataframe(raw).map({
        "event_id": "event_id", "user_id": "user_id",
        "event_type": "event_type", "value": "value",
        "ts": "timestamp_micros(event_id * 60000000)"})

    # 7) view ... view, then purchase IMMEDIATELY (mixed + repeated)
    pat = (Pattern.begin("v1", "view")
           .followed_by("v2", "view")
           .next("p", "purchase"))
    conversions = src.key_by("user_id").pattern(pat)

    # 8) retryable-empty lookups resolve on the second attempt; the
    # category rule itself is deterministic so tests recompute it
    # relationally (one partition => the attempt dict is worker-shared)
    def flaky_lookup():
        attempts: dict = {}

        def svc(row: dict) -> dict:
            k = row["event_id"]
            attempts[k] = attempts.get(k, 0) + 1
            if attempts[k] == 1:
                return {"event_id": k, "category": ""}  # empty answer
            return {"event_id": k,
                    "category": "big" if row["value"] >= 100.0
                    else "small"}
        return svc

    enriched = (env.from_dataframe(raw.coalesce(1))
                .connect_broadcast(
                    rules_df(spark),
                    on="event_type = rule_event_type "
                       "AND value > threshold")
                .map_async(flaky_lookup(),
                           "event_id long, category string",
                           concurrency=8, retries=2,
                           retry_on_result=lambda r: r["category"] == ""))

    # 9) idle co-stream: park the log's rows as a parquet file stream,
    # union with a never-producing directory, heartbeat un-starves
    d_active = tempfile.mkdtemp(prefix="migrate_idle_active_")
    d_idle = tempfile.mkdtemp(prefix="migrate_idle_idle_")
    ev = src.to_df().select("ts", "user_id")
    ev.coalesce(1).write.parquet(os.path.join(d_active, "f=0"))
    ev.filter(F.lit(False)).coalesce(1).write.parquet(
        os.path.join(d_idle, "f=0"))
    hb = IdleSourceHeartbeat(d_idle, idle_timeout_s=0.0,
                             fields={"user_id": -1}, ts_col="ts")
    hb.check_and_inject()

    def stream(d):
        return (spark.readStream.schema("ts timestamp, user_id long")
                .option("recursiveFileLookup", "true").parquet(d)
                .withWatermark("ts", "0 seconds"))

    agg = (strip_heartbeats(stream(d_active).union(stream(d_idle)))
           .groupBy(F.window("ts", "1 hour").alias("w"))
           .agg(F.count("*").alias("n"))
           .select(F.col("w.end").alias("w_end"), "n"))
    windows = _run_to_memory(agg, "append")
    return conversions.to_df(), enriched.to_df(), windows


def run_round9_extensions(spark: SparkSession, root: str):
    """The round-9 surfaces in walkthrough form, same demo log:

      10. STRICT chain with a REPEATED stage type on a LIVE stream
          [FLINK-API: Pattern.begin(x).next(x).next(y)] — view, view
          IMMEDIATELY, purchase IMMEDIATELY — running on the KMP
          failure-function stepper across a two-file micro-batch
          boundary (round 8 had to refuse repeated types on streams:
          a bordered prefix must RE-ENTER mid-pattern on a mismatch,
          which kill-or-re-anchor cannot do),
      11. the BOUNDED looping quantifier [FLINK-API: oneOrMore().
          within(d) under noSkip]: view followed by one-or-more
          purchases within 12 hours — each in-horizon purchase adds
          one match per live view anchor (the fork-loop machine),
      12. the chunked batch escape hatch for huge per-key histories:
          the same fork pattern compiled with chunked=True returns
          IDENTICAL counts while capping the per-task buffer at
          per-(key, chunk) horizon density instead of the full
          history.

    Returns (strict_stream_df, loops_df, chunked_df, fork_df) — the
    last two are count-identical by construction (test-pinned)."""
    from flink_tutorial_broadcast_spark.cep import Pattern
    from flink_tutorial_broadcast_spark.streaming.jobs import (
        _run_to_memory,
    )

    eventlog.register(spark)
    env = StreamExecutionEnvironment.get_execution_environment(spark)
    raw = spark.read.format("ftbs_eventlog").option("path", root).load()
    src = env.from_dataframe(raw).map({
        "event_id": "event_id", "user_id": "user_id",
        "event_type": "event_type", "value": "value",
        "ts": "timestamp_micros(event_id * 60000000)"})

    # 10) strict view>view>purchase on a stream, split mid-log so the
    # KMP prefix length carries across the micro-batch boundary
    strict_pat = (Pattern.begin("v1", "view")
                  .next("v2", "view")
                  .next("p", "purchase"))
    ev = src.to_df().select("user_id", "ts", "event_id", "event_type")
    d = tempfile.mkdtemp(prefix="migrate_r9_strict_")
    half = ev.agg(F.percentile_approx("event_id", 0.5).alias("m")) \
        .collect()[0]["m"]
    ev.filter(F.col("event_id") <= half).coalesce(1) \
        .write.parquet(os.path.join(d, "f=0"))
    ev.filter(F.col("event_id") > half).coalesce(1) \
        .write.parquet(os.path.join(d, "f=1"))
    sdf = (spark.readStream
           .schema("user_id long, ts timestamp, event_id long, "
                   "event_type string")
           .option("maxFilesPerTrigger", "1")
           .option("recursiveFileLookup", "true").parquet(d))
    strict_stream = _run_to_memory(
        env.from_dataframe(sdf).key_by("user_id")
        .pattern(strict_pat).to_df(), "update")

    # 11) bounded one_or_more on the fork machine
    loop_pat = (Pattern.begin("v", "view")
                .followed_by("p", "purchase").one_or_more()
                .within("12 hours").no_skip())
    loops = src.key_by("user_id").pattern(loop_pat)

    # 12) chunked ≡ unchunked for the fork family
    fork_pat = (Pattern.begin("v", "view")
                .followed_by("p", "purchase")
                .within("12 hours").no_skip())
    chunked = src.key_by("user_id").pattern(fork_pat, chunked=True,
                                            chunk_horizons=2)
    fork = src.key_by("user_id").pattern(fork_pat)
    return strict_stream, loops.to_df(), chunked.to_df(), fork.to_df()


def run_round9_verbs(spark: SparkSession, root: str):
    """The late-round-9 CONDITION/QUANTIFIER verbs in walkthrough form,
    same demo log:

      13. stage PREDICATES [FLINK-API: Pattern#where / Pattern#or]: a
          high-value view (where value >= 40) followed by a purchase —
          the condition is plain ANSI-SQL over the event row,
          evaluated JVM-side as one bit of the event's condition mask,
      14. an OPTIONAL middle stage [FLINK-API: Pattern#optional] under
          noSkip — compiled as the union of the with- and without-
          variant fork machines; the walkthrough returns the two
          variant counts too, so the sum identity is visible,
      15. `followed_by_any` [FLINK-API: Pattern#followedByAny]: ALL
          view→purchase combinations, counted by the K-longs
          subsequence DP (no anchor sets at all),
      16. an ANCHOR-RELATIVE condition [FLINK-API: IterativeCondition]
          — a purchase worth MORE than the view that anchored its run.

    Returns (where_df, opt_df, with_df, without_df, any_df, rel_df)."""
    from flink_tutorial_broadcast_spark.cep import Pattern

    eventlog.register(spark)
    env = StreamExecutionEnvironment.get_execution_environment(spark)
    raw = spark.read.format("ftbs_eventlog").option("path", root).load()
    src = env.from_dataframe(raw).map({
        "event_id": "event_id", "user_id": "user_id",
        "event_type": "event_type", "value": "value",
        "ts": "timestamp_micros(event_id * 60000000)"})
    ks = src.key_by("user_id")

    # 13) predicate stage — big views only anchor
    where_pat = (Pattern.begin("v", "view").where("value >= 40")
                 .followed_by("p", "purchase"))
    where_df = ks.pattern(where_pat).to_df()

    # 14) optional middle click: union of variants, sum identity
    opt_pat = (Pattern.begin("v", "view")
               .followed_by("c", "click").optional()
               .followed_by("p", "purchase")
               .within("12 hours").no_skip())
    with_pat = (Pattern.begin("v", "view")
                .followed_by("c", "click")
                .followed_by("p", "purchase")
                .within("12 hours").no_skip())
    without_pat = (Pattern.begin("v", "view")
                   .followed_by("p", "purchase")
                   .within("12 hours").no_skip())
    opt_df = ks.pattern(opt_pat).to_df()
    with_df = ks.pattern(with_pat).to_df()
    without_df = ks.pattern(without_pat).to_df()

    # 15) all combinations — the subsequence-counting DP
    any_pat = (Pattern.begin("v", "view")
               .followed_by_any("p", "purchase").no_skip())
    any_df = ks.pattern(any_pat).to_df()

    # 16) purchase worth more than its anchoring view
    rel_pat = (Pattern.begin("v", "view")
               .followed_by("p", "purchase")
               .where_rel("value", ">", "value"))
    rel_df = ks.pattern(rel_pat).to_df()
    return where_df, opt_df, with_df, without_df, any_df, rel_df
