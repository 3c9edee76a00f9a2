"""Property tests for CEP-pattern, gap-fill, anomaly, and band-filter ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from tests.conftest import SF_SMOKE


def test_sequence_pattern_users_have_all_three_stages(spark, queries):
    df = queries["q_sequence_pattern"](spark, SF_SMOKE)
    assert df.filter(F.col("n_matches") < 1).count() == 0
    # a strict-contiguity match implies the user has all three types
    ev = load(spark, SF_SMOKE, "events")
    stages = (
        ev.filter(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("k"))
        .filter(F.col("k") == 3)
    )
    missing = df.join(stages, "user_id", "left_anti")
    assert missing.count() == 0


def test_cep_followed_by_matches_python_nfa(spark, queries):
    """The engine's codegen fold must equal a driver-side reference run
    of the same skip-past-last-event stage machine, user by user."""
    ev = (load(spark, SF_SMOKE, "events")
          .select("user_id", "ts", "event_id", "event_type").collect())
    code = {"view": 1, "click": 2, "purchase": 3}
    per_user: dict[int, list] = {}
    for r in ev:
        per_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], code.get(r["event_type"], 0)))
    expect = {}
    for uid, rows in per_user.items():
        acc = 0
        for _, _, c in sorted(rows):
            if c == acc % 10 + 1:
                acc = acc + 8 if acc % 10 == 2 else acc + 1
        if acc // 10 > 0:
            expect[uid] = acc // 10
    got = {r["user_id"]: r["n_matches"]
           for r in queries["q_cep_followed_by"](spark, SF_SMOKE).collect()}
    assert got == expect


def test_cep_relaxed_count_dominates_strict(spark, queries):
    """Relaxed contiguity (followedBy) admits every strict-contiguity
    match as a subsequence, and the greedy earliest-match scan is
    maximal for chain patterns — so per user relaxed ≥ strict."""
    strict = {r["user_id"]: r["n_matches"] for r in
              queries["q_sequence_pattern"](spark, SF_SMOKE).collect()}
    relaxed = {r["user_id"]: r["n_matches"] for r in
               queries["q_cep_followed_by"](spark, SF_SMOKE).collect()}
    for uid, n in strict.items():
        assert relaxed.get(uid, 0) >= n


def test_cep_within_bounds_and_pairing(spark, queries):
    df = queries["q_cep_within"](spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 < r["delay_us"] <= 43_200 * 1_000_000
    # one row per view (earliest purchase only), and ids really are
    # view/purchase events of the same user
    assert df.select("view_id").distinct().count() == df.count()
    ev = load(spark, SF_SMOKE, "events")
    v = ev.filter(F.col("event_type") == "view") \
        .select(F.col("event_id").alias("view_id"),
                F.col("user_id").alias("vu"))
    p = ev.filter(F.col("event_type") == "purchase") \
        .select(F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("pu"))
    joined = df.join(v, "view_id").join(p, "purchase_id")
    assert joined.filter((F.col("vu") != F.col("user_id"))
                         | (F.col("pu") != F.col("user_id"))).count() == 0


def test_cep_not_followed_by_partitions_views(spark, queries):
    """Same 12h bound, same universe: every view is either followed by a
    purchase (q_cep_within) or not (q_cep_not_followed_by) — exact
    disjoint partition of the view set."""
    followed = {r["view_id"] for r in
                queries["q_cep_within"](spark, SF_SMOKE).collect()}
    absent = {r["view_id"] for r in
              queries["q_cep_not_followed_by"](spark, SF_SMOKE).collect()}
    all_views = {r["event_id"] for r in
                 load(spark, SF_SMOKE, "events")
                 .filter(F.col("event_type") == "view").collect()}
    assert followed & absent == set()
    assert followed | absent == all_views


def test_cep_followed_by_within_matches_python_machine(spark, queries):
    """The time-bounded automaton must equal a driver-side reference run
    (expiry applied before the transition), and the bounded count can
    never exceed the unbounded one."""
    ev = (load(spark, SF_SMOKE, "events")
          .select("user_id", F.unix_micros("ts").alias("t"),
                  "event_id", "event_type").collect())
    code = {"view": 1, "click": 2, "purchase": 3}
    per_user: dict[int, list] = {}
    for r in ev:
        per_user.setdefault(r["user_id"], []).append(
            (r["t"], r["event_id"], code.get(r["event_type"], 0)))
    w_us = 48 * 3600 * 1_000_000
    expect = {}
    for uid, rows in per_user.items():
        cnt, stage, anchor = 0, 0, 0
        for t, _, c in sorted(rows):
            if stage > 0 and t - anchor > w_us:
                stage = 0
            if stage == 0 and c == 1:
                stage, anchor = 1, t
            elif stage == 1 and c == 2:
                stage = 2
            elif stage == 2 and c == 3:
                stage = 0
                cnt += 1
        if cnt:
            expect[uid] = cnt
    got = {r["user_id"]: r["n_matches"] for r in
           queries["q_cep_followed_by_within"](spark, SF_SMOKE).collect()}
    assert got == expect
    unbounded = {r["user_id"]: r["n_matches"] for r in
                 queries["q_cep_followed_by"](spark, SF_SMOKE).collect()}
    for uid, n in got.items():
        assert n <= unbounded.get(uid, 0)


def test_cep_followed_by_all_matches_python_forking_nfa(spark, queries):
    """Multi-anchor forking NFA (Flink default, NO_SKIP): the engine's
    array-state fold must equal a driver-side reference that keeps the
    literal set of open anchors per stage (expiry before transition);
    and since every single-anchor match is also a forking-NFA match
    inside the same window, per user forking >= single-anchor."""
    ev = (load(spark, SF_SMOKE, "events")
          .select("user_id", F.unix_micros("ts").alias("t"),
                  "event_id", "event_type").collect())
    code = {"view": 1, "click": 2, "purchase": 3}
    per_user: dict[int, list] = {}
    for r in ev:
        per_user.setdefault(r["user_id"], []).append(
            (r["t"], r["event_id"], code.get(r["event_type"], 0)))
    w_us = 48 * 3600 * 1_000_000
    expect = {}
    for uid, rows in per_user.items():
        cnt, s1, s2 = 0, [], []
        for t, _, c in sorted(rows):
            s1 = [a for a in s1 if t - a <= w_us]
            s2 = [a for a in s2 if t - a <= w_us]
            if c == 1:
                s1.append(t)
            elif c == 2:
                s2, s1 = s2 + s1, []
            elif c == 3:
                cnt += len(s2)
                s2 = []
        if cnt:
            expect[uid] = cnt
    got = {r["user_id"]: r["n_matches"] for r in
           queries["q_cep_followed_by_all"](spark, SF_SMOKE).collect()}
    assert got == expect
    single = {r["user_id"]: r["n_matches"] for r in
              queries["q_cep_followed_by_within"](spark, SF_SMOKE)
              .collect()}
    for uid, n in single.items():
        assert got.get(uid, 0) >= n


def test_cep_match_measures_bindings(spark, queries):
    """Per-match bindings: counts agree with q_cep_followed_by, starts
    are views, ends are purchases, numbering is contiguous, spans are
    positive and consistent with the bound event timestamps."""
    rows = queries["q_cep_match_measures"](spark, SF_SMOKE).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    counts = {r["user_id"]: r["n_matches"] for r in
              queries["q_cep_followed_by"](spark, SF_SMOKE).collect()}
    assert {u: len(ms) for u, ms in by_user.items()} == counts
    ev = {r["event_id"]: (r["event_type"], r["ts"]) for r in
          load(spark, SF_SMOKE, "events").collect()}
    for u, ms in by_user.items():
        assert sorted(m["match_no"] for m in ms) == list(
            range(1, len(ms) + 1))
        for m in ms:
            st, et = ev[m["start_event_id"]], ev[m["end_event_id"]]
            assert st[0] == "view" and et[0] == "purchase"
            assert m["span_us"] > 0
            assert int((et[1] - st[1]).total_seconds() * 1e6) \
                == m["span_us"]


def test_cep_quantifier_containment(spark, queries):
    """times(2) matches are oneOrMore matches are followedBy matches —
    user-set containment down the quantifier ladder."""
    times = {r["user_id"] for r in
             queries["q_cep_times"](spark, SF_SMOKE).collect()}
    plus = {r["user_id"] for r in
            queries["q_cep_one_or_more"](spark, SF_SMOKE).collect()}
    relaxed = {r["user_id"] for r in
               queries["q_cep_followed_by"](spark, SF_SMOKE).collect()}
    assert times <= plus <= relaxed


def test_gap_fill_grid_is_dense_and_total_preserving(spark, queries):
    df = queries["q_gap_fill"](spark, SF_SMOKE)
    ev = load(spark, SF_SMOKE, "events")
    n_days = (
        ev.agg(
            (F.datediff(F.to_date(F.max("ts")), F.to_date(F.min("ts"))) + 1)
        ).collect()[0][0]
    )
    n_types = ev.select("event_type").distinct().count()
    assert df.count() == n_days * n_types
    assert df.agg(F.sum("n")).collect()[0][0] == ev.count()


def test_anomaly_zscore_flags_are_beyond_threshold(spark, queries):
    df = queries["q_anomaly_zscore"](spark, SF_SMOKE)
    assert df.count() > 0
    assert df.filter(F.col("z_x100") < 170).count() == 0
    # flagged orders are a strict subset
    assert df.count() < load(spark, SF_SMOKE, "orders").count()


def test_length_band_filter_keeps_interior_mass(spark, queries):
    rows = queries["q_length_band_filter"](spark, SF_SMOKE).collect()
    docs = load(spark, SF_SMOKE, "documents")
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for r in rows:
        # p05..p95 band keeps ~90% of each language
        assert 0.7 * totals[r["lang"]] <= r["n_kept"] <= totals[r["lang"]]
        assert r["lo_band"] <= r["avg_chars"] <= r["hi_band"] + 1


def test_ewma_bounded_by_min_max_of_user_values(spark, queries):
    df = queries["q_ewma"](spark, SF_SMOKE)
    ev = load(spark, SF_SMOKE, "events")
    bounds = ev.groupBy("user_id").agg(F.min("value").alias("lo"),
                                       F.max("value").alias("hi"))
    # a convex combination of the inputs can never leave their range
    bad = (df.join(bounds, "user_id")
           .filter((F.col("ewma") < F.col("lo") - 1e-3)
                   | (F.col("ewma") > F.col("hi") + 1e-3)))
    assert bad.count() == 0
