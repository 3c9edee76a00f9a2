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


# (value, weight) pairs with heavy ties and negatives for two-phase ranking
rank_rows_strategy = st.lists(
    st.tuples(st.integers(-50, 50), st.integers(0, 9)),
    min_size=1, max_size=60)


@given(rank_rows_strategy)
@settings(max_examples=12, deadline=None)
def test_two_phase_global_order_matches_brute_force(spark, rows):
    """two_phase.global_order must equal the single-partition reference:
    exact 1-based global row numbers and inclusive running sums under
    ORDER BY (v ASC, id ASC), for any value distribution (ties,
    negatives, constant columns, single row)."""
    from flink_tutorial_broadcast_spark.operators.two_phase import (
        global_order, ntile_from_rn,
    )
    data = [(i, v, w) for i, (v, w) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, v long, w long")
    got = {
        r["id"]: (r["rn"], r["cum_w"])
        for r in global_order(
            df, F.col("v"), ["id"], n_buckets=7,
            running_sums={"cum_w": F.col("w")},
        ).collect()
    }
    ref = sorted(data, key=lambda t: (t[1], t[0]))
    acc = 0
    for rn0, (i, v, w) in enumerate(ref):
        acc += w
        assert got[i] == (rn0 + 1, acc), (i, got[i], rn0 + 1, acc)
    # ntile arithmetic vs SQL-standard assignment on the same order
    n = len(ref)
    k = 4
    tile = {
        r["id"]: r["t"]
        for r in global_order(df, F.col("v"), ["id"], n_buckets=7)
        .withColumn("t", ntile_from_rn(F.col("rn"), F.lit(n), k))
        .collect()
    }
    base, rem = divmod(n, k)
    want_tiles = [t for t in range(1, k + 1)
                  for _ in range(base + (1 if t <= rem else 0))]
    assert [tile[i] for i, _, _ in ref] == want_tiles[:n]


texts_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d", "e"]),
             min_size=6, max_size=20).map(lambda ws: " ".join(ws)),
    min_size=1, max_size=6)


@given(texts_strategy)
@settings(max_examples=10, deadline=None)
def test_winnowing_selection_matches_reference_on_random_texts(
        spark, texts):
    """Winnowing (k=3, w=4) on randomized low-vocab texts — high shingle
    collision rates stress the distinct-min selection — must match the
    pure-Python reference per document."""
    import hashlib

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    docs = (df.select("doc_id", F.split("text", " ").alias("w"))
            .filter(F.size("w") >= 6)
            .select("doc_id", "w", (F.size("w") - 2).alias("n_grams")))
    idx = F.sequence(F.lit(1), F.col("n_grams"))
    tri = F.transform(idx, lambda i: F.concat_ws(
        " ", F.element_at("w", i), F.element_at("w", i + 1),
        F.element_at("w", i + 2)))
    hashes = F.transform(tri, lambda g: F.conv(
        F.substring(F.md5(g), 1, 12), 16, 10).cast("long"))
    g = docs.select("doc_id", "n_grams",
                    F.posexplode(hashes).alias("pos0", "h")) \
        .select("doc_id", "n_grams", (F.col("pos0") + 1).alias("pos"), "h")
    win = (Window.partitionBy("doc_id").orderBy("pos")
           .rowsBetween(Window.currentRow, 3))
    got = {}
    rows = (g.withColumn("fp", F.min("h").over(win))
            .filter(F.col("pos") <= F.col("n_grams") - 3)
            .select("doc_id", "fp").distinct().collect())
    for r in rows:
        got.setdefault(r.doc_id, set()).add(r.fp)
    for i, t in enumerate(texts):
        w = t.split(" ")
        grams = [" ".join(w[j:j + 3]) for j in range(len(w) - 2)]
        hs = [int(hashlib.md5(x.encode()).hexdigest()[:12], 16)
              for x in grams]
        exp = ({min(hs[j:j + 4]) for j in range(len(hs) - 3)}
               if len(hs) >= 4 else None)
        assert got.get(i) == exp


# --- round-6 operators: repeated-span coverage & power iteration -----

_tok = st.sampled_from(["a", "b", "c"])
_doc = st.lists(_tok, min_size=0, max_size=14)
docs_strategy = st.lists(_doc, min_size=1, max_size=5).flatmap(
    lambda docs: st.sampled_from([0, 1]).map(
        # half the examples append an exact copy of doc 0 so long
        # shared runs (the interesting case for w=8 spans) are common
        lambda dup: docs + ([docs[0]] if dup and docs else [])))


def _write_documents(tmpdir, docs):
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [" ".join(d) for d in docs]
    t = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
        "source": pa.array(["gen"] * len(docs), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, f"{tmpdir}/documents.parquet")
    return tmpdir


def _substr_reference(docs, w=8):
    spans: dict[str, set] = {}
    toks = {}
    for i, d in enumerate(docs):
        t = " ".join(d).split(" ")  # mirror split(text, ' ') exactly
        toks[i] = t
        for s in range(len(t) - w + 1):
            spans.setdefault(" ".join(t[s:s + w]), set()).add(i)
    out = {}
    for i, t in toks.items():
        cov = set()
        for s in range(len(t) - w + 1):
            if len(spans[" ".join(t[s:s + w])]) > 1:
                cov.update(range(s, s + w))
        if cov:
            out[i] = (len(t), len(cov), len(cov) * 1000000 // len(t))
    return out


@settings(max_examples=8, deadline=None)
@given(docs=docs_strategy)
def test_dedup_substr_matches_reference_on_random_docs(
        spark, queries, docs):
    """q_dedup_substr on RANDOM tiny corpora (including empty texts,
    sub-window docs, and exact-copy documents) must equal the
    brute-force repeated-8-gram coverage reference."""
    import tempfile

    sf = _write_documents(tempfile.mkdtemp(prefix="prop_substr_"), docs)
    got = {r["doc_id"]: (r["n_tokens"], r["n_repeated_tokens"],
                         r["repeated_ppm"])
           for r in queries["q_dedup_substr"](spark, sf).collect()}
    assert got == _substr_reference(docs)


_vec = st.lists(st.integers(-4, 4), min_size=3, max_size=3)
vectors_strategy = st.lists(_vec, min_size=2, max_size=5)


@settings(max_examples=8, deadline=None)
@given(vecs=vectors_strategy)
def test_power_iteration_exact_on_random_matrices(spark, queries, vecs):
    """q_power_iteration on RANDOM small integer matrices: the two
    matvec rounds must equal the arbitrary-precision Python (CᵀC)²e₀
    over the same min-max codes (the engine's documented precondition —
    no constant dimension — enforced via assume)."""
    import math
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    from hypothesis import assume

    d = len(vecs[0])
    cols = list(zip(*vecs))
    assume(all(max(c) > min(c) for c in cols))  # non-constant dims

    tmp = tempfile.mkdtemp(prefix="prop_power_")
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([[float(x) for x in v] for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), pa.int32()),
    })
    pq.write_table(t, f"{tmp}/embeddings.parquet")

    mn = [min(c) for c in cols]
    mx = [max(c) for c in cols]
    C = [[min(math.floor((v[j] - mn[j]) * 256 / (mx[j] - mn[j])), 255)
          for j in range(d)] for v in vecs]
    w1 = [sum(r[0] * r[j] for r in C) for j in range(d)]
    u2 = [sum(r[j] * w1[j] for j in range(d)) for r in C]
    w2 = [sum(u2[i] * C[i][j] for i in range(len(C))) for j in range(d)]
    m = max(w2)
    want = {j: (w2[j], w2[j] * 1000000 // m) for j in range(d)}
    got = {r["pos"]: (r["raw"], r["direction_ppm"])
           for r in queries["q_power_iteration"](spark, tmp).collect()}
    assert got == want
