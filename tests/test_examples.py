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


def test_round7_extensions_walkthrough(spark):
    """docs/migrate.md steps 4-6: async enrichment matches a relational
    recompute exactly, CEP conversions match a brute-force Python
    automaton over the raw log, and the 2PC landing zone holds the
    whole log with every batch committed."""
    import tempfile

    from pyspark.sql import functions as F

    from flink_tutorial_broadcast_spark import examples

    root = tempfile.mkdtemp(prefix="migrate_log_r7_")
    examples.produce_demo_log(root, n_events=120)
    enriched, conversions, landed, sink = \
        examples.run_round7_extensions(spark, root)

    # 4) async enrichment ≡ the relational twin of the fake service
    from flink_tutorial_broadcast_spark.sources.rules import rules_df
    raw = (spark.read.format("ftbs_eventlog").option("path", root)
           .load())
    rules = rules_df(spark)
    want = (raw.join(F.broadcast(rules),
                     (raw.event_type == rules.rule_event_type)
                     & (raw.value > rules.threshold))
            .select("event_id",
                    F.when(F.col("value") >= 100.0, "big")
                    .otherwise("small").alias("category")))
    assert {(r.event_id, r.category) for r in enriched.collect()} \
        == {(r.event_id, r.category) for r in want.collect()}
    assert enriched.count() > 0

    # 5) CEP conversions ≡ brute-force automaton on the sorted log
    per_user: dict[int, list] = {}
    for r in raw.collect():
        per_user.setdefault(r.user_id, []).append(
            (r.event_id, r.event_type))
    expect = {}
    for u, evs in per_user.items():
        stage = cnt = 0
        for _, ty in sorted(evs):
            if stage == 0 and ty == "view":
                stage = 1
            elif stage == 1 and ty == "purchase":
                cnt, stage = cnt + 1, 0
        if cnt:
            expect[u] = cnt
    assert {r.user_id: r.n_matches
            for r in conversions.collect()} == expect

    # 6) the landing zone is complete and fully committed
    assert landed.count() == raw.count()
    assert sink.staged_uncommitted() == []


def test_round8_extensions_walkthrough(spark):
    """docs/migrate.md steps 7-9: mixed/repeated CEP conversions match
    a brute-force Python machine over the raw log, retryable-empty
    lookups resolve to the relational recompute (no empty category
    survives), and the idle-unioned window counts equal the
    single-source truth."""
    import tempfile

    from pyspark.sql import functions as F

    from flink_tutorial_broadcast_spark import examples

    root = tempfile.mkdtemp(prefix="migrate_log_r8_")
    examples.produce_demo_log(root, n_events=120)
    conversions, enriched, windows = \
        examples.run_round8_extensions(spark, root)

    raw = (spark.read.format("ftbs_eventlog").option("path", root)
           .load().collect())

    # 7) brute-force the mixed/repeated machine: view..view then an
    # IMMEDIATELY-following purchase (event time = offset minutes)
    per: dict = {}
    for r in sorted(raw, key=lambda r: r.event_id):
        per.setdefault(r.user_id, []).append(r.event_type)
    want = {}
    for u, seq in per.items():
        stage = cnt = 0
        for ty in seq:
            need = ["view", "view", "purchase"][stage]
            if ty == need:
                stage += 1
                if stage == 3:
                    cnt, stage = cnt + 1, 0
            elif stage == 2:  # strict await missed: die / re-anchor
                stage = 1 if ty == "view" else 0
        if cnt:
            want[u] = cnt
    assert {(r.user_id, r.n_matches) for r in conversions.collect()} \
        == set(want.items())
    assert want  # non-vacuous

    # 8) every retryable-empty lookup resolved on the retry
    from flink_tutorial_broadcast_spark.sources.rules import rules_df
    rawdf = (spark.read.format("ftbs_eventlog").option("path", root)
             .load())
    rules = rules_df(spark)
    want_enriched = (
        rawdf.join(F.broadcast(rules),
                   (rawdf.event_type == rules.rule_event_type)
                   & (rawdf.value > rules.threshold))
        .select("event_id",
                F.when(F.col("value") >= 100.0, "big")
                .otherwise("small").alias("category")))
    got = {(r.event_id, r.category) for r in enriched.collect()}
    assert got == {(r.event_id, r.category)
                   for r in want_enriched.collect()}
    assert all(c for _, c in got)  # no empty category survived

    # 9) the idle union flowed and equals the single-source window truth
    rows = windows.collect()
    assert rows
    ev = spark.createDataFrame(
        [(r.event_id, r.user_id) for r in raw], "event_id long, u long"
    ).select(F.expr("timestamp_micros(event_id * 60000000)").alias("ts"))
    want_w = (ev.groupBy(F.window("ts", "1 hour").alias("w"))
              .agg(F.count("*").alias("n"))
              .select(F.col("w.end").alias("w_end"), "n").collect())
    got_w = {(r.w_end, r.n) for r in rows}
    # min-policy correctness: the heartbeat un-starves the IDLE input,
    # but the ACTIVE source's own watermark (max event ts, 0s delay)
    # still gates — windows ending past it stay pending, exactly as a
    # single-source run would behave
    max_ts = max(r.ts for r in ev.collect())
    expected = {(r.w_end, r.n) for r in want_w if r.w_end <= max_ts}
    assert expected and expected <= got_w


def test_round9_extensions_walkthrough(spark):
    """docs/migrate.md rounds-9 rows: the streamed KMP strict chain
    (repeated stage type, bordered prefix) converges to a brute-force
    KMP over the raw log; bounded one_or_more counts every in-horizon
    purchase per live view anchor; chunked=True equals the plain fork
    compile exactly."""
    import tempfile

    from flink_tutorial_broadcast_spark import examples

    root = tempfile.mkdtemp(prefix="migrate_log_r9_")
    examples.produce_demo_log(root, n_events=120)
    strict_stream, loops, chunked, fork = \
        examples.run_round9_extensions(spark, root)

    raw = (spark.read.format("ftbs_eventlog").option("path", root)
           .load().collect())
    per: dict = {}
    for r in sorted(raw, key=lambda r: r.event_id):
        per.setdefault(r.user_id, []).append(r.event_type)

    # 10) brute-force KMP (restart-after-match) for view,view,purchase
    P = ["view", "view", "purchase"]
    fail = [0, 0, 1, 0]  # borders of 'vvp' prefixes
    want = {}
    for u, seq in per.items():
        j = cnt = 0
        for ty in seq:
            while j > 0 and ty != P[j]:
                j = fail[j]
            if ty == P[j]:
                j += 1
            if j == 3:
                cnt, j = cnt + 1, 0
        if cnt:
            want[u] = cnt
    final: dict = {}
    for r in strict_stream.collect():
        final[r.user_id] = max(final.get(r.user_id, 0), r.n_matches)
    assert {u: n for u, n in final.items() if n > 0} == want
    assert want  # the demo log really contains vv-then-p runs

    # 11) brute force the fork-loop count: every purchase within 12h
    # after each view, via the first-match-per-stage rule (K=2: every
    # in-horizon purchase after the view anchor)
    per_t: dict = {}
    for r in sorted(raw, key=lambda r: r.event_id):
        per_t.setdefault(r.user_id, []).append(
            (r.event_id * 60_000_000, r.event_type))
    W = 12 * 3600 * 1_000_000
    want_loops = {}
    for u, seq in per_t.items():
        cnt = 0
        for i, (tv, ty) in enumerate(seq):
            if ty != "view":
                continue
            cnt += sum(1 for t2, ty2 in seq[i + 1:]
                       if ty2 == "purchase" and t2 - tv <= W)
        if cnt:
            want_loops[u] = cnt
    assert {(r.user_id, r.n_matches) for r in loops.collect()} \
        == set(want_loops.items())

    # 12) chunked ≡ unchunked, exactly
    assert {(r.user_id, r.n_matches) for r in chunked.collect()} \
        == {(r.user_id, r.n_matches) for r in fork.collect()}


def test_round9_verbs_walkthrough(spark):
    """docs/migrate.md late-round-9 rows: where() filters anchors,
    optional() equals the sum of its two variants, followed_by_any
    counts every (view, later purchase) pair, and where_rel gates on
    the anchor's value."""
    import tempfile

    from flink_tutorial_broadcast_spark import examples

    root = tempfile.mkdtemp(prefix="migrate_log_r9v_")
    examples.produce_demo_log(root, n_events=120)
    where_df, opt_df, with_df, without_df, any_df, rel_df = \
        examples.run_round9_verbs(spark, root)

    raw = (spark.read.format("ftbs_eventlog").option("path", root)
           .load().collect())
    per: dict = {}
    for r in sorted(raw, key=lambda r: r.event_id):
        per.setdefault(r.user_id, []).append((r.event_type, r.value))

    # 13) where(): skip-past-last alternation over big views
    want_w = {}
    for u, seq in per.items():
        stage = cnt = 0
        for ty, v in seq:
            if stage == 0 and ty == "view" and v >= 40:
                stage = 1
            elif stage == 1 and ty == "purchase":
                cnt, stage = cnt + 1, 0
        if cnt:
            want_w[u] = cnt
    got_w = {r.user_id: r.n_matches for r in where_df.collect()}
    assert got_w == want_w

    # 14) optional() == with-variant + without-variant, per key
    opt = {r.user_id: r.n_matches for r in opt_df.collect()}
    w3 = {r.user_id: r.n_matches for r in with_df.collect()}
    w2 = {r.user_id: r.n_matches for r in without_df.collect()}
    keys = set(w3) | set(w2)
    assert opt == {u: w3.get(u, 0) + w2.get(u, 0) for u in keys
                   if w3.get(u, 0) + w2.get(u, 0) > 0}
    assert opt  # non-vacuous

    # 15) followed_by_any == all (view, later purchase) pairs
    want_a = {}
    for u, seq in per.items():
        views = n = 0
        for ty, _ in seq:
            if ty == "view":
                views += 1
            elif ty == "purchase":
                n += views
        if n:
            want_a[u] = n
    got_a = {r.user_id: r.n_matches for r in any_df.collect()}
    assert got_a == want_a

    # 16) where_rel: purchase must beat its anchor's value
    want_r = {}
    for u, seq in per.items():
        stage = cnt = 0
        av = 0.0
        for ty, v in seq:
            if stage == 0 and ty == "view":
                stage, av = 1, v
            elif stage == 1 and ty == "purchase" and v > av:
                cnt, stage = cnt + 1, 0
        if cnt:
            want_r[u] = cnt
    got_r = {r.user_id: r.n_matches for r in rel_df.collect()}
    assert got_r == want_r
