"""Hypothesis property tests: Spark operator semantics vs brute-force
Python references on randomized inline data (SURVEY.md §5.3).

Each test builds a tiny DataFrame from generated rows and checks the
engine's operator against an independently-coded reference. Example
counts are kept small — every example runs real Spark jobs.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)

# (user_id, minutes-offset, value) event triples
events_strategy = st.lists(
    st.tuples(st.integers(0, 2),
              st.integers(0, 300),
              st.integers(-5, 5)),
    min_size=1, max_size=40)


def _mk_events(spark, rows):
    data = [(u, BASE + dt.timedelta(minutes=m), float(v))
            for u, m, v in rows]
    return spark.createDataFrame(data, "user_id int, ts timestamp, value double")


def _sessions_reference(rows, gap_min=30):
    """Brute-force session windows: sort per user, split on gaps > gap
    (Spark's session_window merges events EXACTLY gap apart — boundary
    found by this very test; the oracle SQL matches)."""
    out = {}
    per_user: dict[int, list] = {}
    for u, m, v in rows:
        per_user.setdefault(u, []).append((m, v))
    for u, evs in per_user.items():
        evs.sort()
        sessions = []
        cur = [evs[0]]
        for m, v in evs[1:]:
            if m - cur[-1][0] > gap_min:
                sessions.append(cur)
                cur = []
            cur.append((m, v))
        sessions.append(cur)
        for s in sessions:
            out[(u, s[0][0])] = (len(s), sum(v for _, v in s))
    return out


@settings(max_examples=12, deadline=None)
@given(rows=events_strategy)
def test_session_window_matches_reference(spark, rows):
    df = _mk_events(spark, rows)
    got = {
        (r["user_id"],
         int((r["start"] - BASE).total_seconds() // 60)):
        (r["n"], r["s"])
        for r in df.groupBy(F.session_window("ts", "30 minutes").alias("w"),
                            "user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .select("user_id", F.col("w.start").alias("start"), "n", "s")
        .collect()
    }
    want = _sessions_reference(rows)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) < 1e-9, k


def _interval_reference(rows, lo=-15, hi=15):
    """All pairs (a, b) of same-user events with tb in [ta+lo, ta+hi]."""
    pairs = set()
    indexed = list(enumerate(rows))
    for i, (ua, ma, _) in indexed:
        for j, (ub, mb, _) in indexed:
            if i != j and ua == ub and lo <= mb - ma <= hi:
                pairs.add((i, j))
    return pairs


@settings(max_examples=12, deadline=None)
@given(rows=events_strategy)
def test_interval_join_matches_reference(spark, rows):
    data = [(i, u, BASE + dt.timedelta(minutes=m))
            for i, (u, m, _) in enumerate(rows)]
    df = spark.createDataFrame(data, "id int, user_id int, ts timestamp")
    a, b = df.alias("a"), df.alias("b")
    got = {
        (r["ia"], r["ib"])
        for r in a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.id") != F.col("b.id"))
            & (F.col("b.ts") >= F.col("a.ts") - F.expr("INTERVAL 15 MINUTES"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 15 MINUTES")))
        .select(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"))
        .collect()
    }
    assert got == _interval_reference(rows)


versions_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 300), st.integers(0, 99)),
    min_size=1, max_size=10,
    unique_by=lambda t: (t[0], t[1]))  # one version per (key, ts)


@settings(max_examples=12, deadline=None)
@given(rows=events_strategy, versions=versions_strategy)
def test_asof_join_matches_merge_asof(spark, rows, versions):
    """The engine's as-of pattern (join + latest-version window filter,
    q_asof_join's shape) must agree with pandas.merge_asof — inclusive
    <= boundary, latest version wins — on random inputs."""
    import pandas as pd

    ev = spark.createDataFrame(
        [(i, u, BASE + dt.timedelta(minutes=m))
         for i, (u, m, _) in enumerate(rows)],
        "id int, user_id int, ts timestamp")
    rv = spark.createDataFrame(
        [(u, BASE + dt.timedelta(minutes=m), v) for u, m, v in versions],
        "r_user int, valid_from timestamp, val int")

    from pyspark.sql.window import Window
    j = ev.join(F.broadcast(rv),
                (ev.user_id == rv.r_user) & (rv.valid_from <= ev.ts))
    w = Window.partitionBy("id").orderBy(F.col("valid_from").desc())
    got = {r["id"]: r["val"]
           for r in j.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") == 1).select("id", "val").collect()}

    left = pd.DataFrame(
        [(i, u, BASE + dt.timedelta(minutes=m))
         for i, (u, m, _) in enumerate(rows)],
        columns=["id", "user_id", "ts"]).sort_values("ts", kind="stable")
    right = pd.DataFrame(
        [(u, BASE + dt.timedelta(minutes=m), v) for u, m, v in versions],
        columns=["user_id", "valid_from", "val"]).sort_values("valid_from")
    merged = pd.merge_asof(left, right, left_on="ts", right_on="valid_from",
                           by="user_id", direction="backward")
    want = {int(r.id): int(r.val) for r in merged.itertuples()
            if pd.notna(r.val)}
    assert got == want
