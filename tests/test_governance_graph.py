"""Semantics tests for the governance and graph/set-similarity operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from tests.conftest import SF_SMOKE


def test_scd2_intervals_chain_per_key(spark, queries):
    df = queries["q_scd2_build"](spark, SF_SMOKE).cache()
    # exactly one current version per key
    cur = df.filter(F.col("is_current") == 1).groupBy("user_id").count()
    assert cur.filter(F.col("count") != 1).count() == 0
    # valid_to of version v equals valid_from of version v+1 (interval chain)
    nxt = df.select(
        "user_id",
        (F.col("version") - 1).alias("version"),
        F.col("valid_from").alias("next_from"),
    )
    joined = df.join(nxt, ["user_id", "version"])
    assert joined.filter(F.col("valid_to") != F.col("next_from")).count() == 0
    # closed versions are exactly the non-current ones
    assert (
        df.filter(F.col("valid_to").isNull() != (F.col("is_current") == 1))
        .count() == 0
    )
    df.unpersist()


def test_dq_checks_cover_all_constraints_and_are_clean(spark, queries):
    rows = {r.check_name: r.n_bad
            for r in queries["q_dq_checks"](spark, SF_SMOKE).collect()}
    assert len(rows) == 6
    # the driver fixtures are referentially intact and in-domain
    assert rows["orders_orphan_custkey"] == 0
    assert rows["lineitem_orphan_orderkey"] == 0
    assert rows["orders_dup_orderkey"] == 0


def test_group_sample_cap_bounds_every_stratum(spark, queries):
    df = queries["q_group_sample_cap"](spark, SF_SMOKE)
    per = df.groupBy("lang", "source").count()
    assert per.filter(F.col("count") > 5).count() == 0
    # strata smaller than the cap are kept whole
    docs = load(spark, SF_SMOKE, "documents")
    small = (docs.groupBy("lang", "source").count()
             .filter(F.col("count") <= 5)
             .withColumnRenamed("count", "n_all"))
    kept_small = per.join(small, ["lang", "source"])
    assert kept_small.filter(F.col("count") != F.col("n_all")).count() == 0


def test_zorder_buckets_are_locality_boxes(spark, queries):
    rows = queries["q_zorder_cluster"](spark, SF_SMOKE).collect()
    assert sum(r.n for r in rows) == load(spark, SF_SMOKE, "orders").count()
    for r in rows:
        # top-6 Morton bits fix 3 high bits of each 8-bit dimension:
        # every bucket spans a single 32-wide aligned range in x AND y
        assert r.x_lo >> 5 == r.x_hi >> 5
        assert r.y_lo >> 5 == r.y_hi >> 5


def test_triangles_are_ordered_and_really_closed(spark, queries):
    df = queries["q_triangle_count"](spark, SF_SMOKE).cache()
    assert df.filter(~((F.col("n1") < F.col("n2"))
                       & (F.col("n2") < F.col("n3")))).count() == 0
    assert df.count() == df.distinct().count()
    df.unpersist()


def test_setsim_prefix_filter_is_lossless_vs_naive(spark, queries):
    """The prefix-filtered join returns EXACTLY the naive all-pairs result."""
    df = queries["q_setsim_join"](spark, SF_SMOKE).cache()
    d = (
        load(spark, SF_SMOKE, "documents")
        .select("doc_id", F.split("text", " ").alias("wl"))
        .filter(F.size("wl") >= 2)
        .select("doc_id", F.expr(
            "array_distinct(transform(sequence(1, size(wl) - 1), "
            "i -> concat(element_at(wl, i), '_', element_at(wl, i + 1))))"
        ).alias("t"))
    )
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("t").alias("ta"))
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("t").alias("tb"))
    naive = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            F.size(F.array_intersect("ta", "tb")).cast("long").alias("i"),
            F.size("ta").cast("long").alias("na"),
            F.size("tb").cast("long").alias("nb"))
        .filter(F.col("i") * 10 >= (F.col("na") + F.col("nb") - F.col("i")) * 6)
    )
    assert df.count() == naive.count()
    missing = naive.join(df, ["doc_a", "doc_b"], "left_anti")
    assert missing.count() == 0
    # jaccard bound respected: ppm >= 600000 for every survivor
    assert df.filter(F.col("jacc_ppm") < 600000).count() == 0
    df.unpersist()


def test_domain_mixture_hits_quota_or_exhausts_source(spark, queries):
    df = queries["q_domain_mixture"](spark, SF_SMOKE).cache()
    docs = load(spark, SF_SMOKE, "documents")
    avail = docs.groupBy("source").count().withColumnRenamed("count", "n_avail")
    per = (df.groupBy("source", "n_taken").count()
           .join(avail, "source"))
    # taken count equals the declared quota, and the quota is
    # min(target, availability)
    bad = per.filter(
        (F.col("count") != F.col("n_taken"))
        | (F.col("n_taken") > F.col("n_avail")))
    assert bad.count() == 0
    # determinism: re-running yields the identical selection
    again = queries["q_domain_mixture"](spark, SF_SMOKE)
    assert df.exceptAll(again).count() == 0
    df.unpersist()


def test_table_reconcile_flags_exactly_the_mutated_buckets(spark, queries):
    """Every emitted bucket must contain at least one injected mutation,
    every mutated bucket must be emitted, and the count delta per bucket
    must equal the number of injected deletes in that bucket."""
    out = {r.bucket: r for r in
           queries["q_table_reconcile"](spark, SF_SMOKE).collect()}
    o = load(spark, SF_SMOKE, "orders").select(
        (F.col("o_orderkey") % 256).alias("bucket"),
        (F.col("o_orderkey") % 97 == 0).alias("deleted"),
        (F.col("o_orderkey") % 89 == 0).alias("updated"),
    )
    per_bucket = (o.groupBy("bucket")
                  .agg(F.sum(F.col("deleted").cast("int")).alias("n_del"),
                       F.sum(F.col("updated").cast("int")).alias("n_upd"))
                  .collect())
    mutated = {r.bucket for r in per_bucket if r.n_del or r.n_upd}
    deletes = {r.bucket: r.n_del for r in per_bucket}
    assert set(out) == mutated
    for b, r in out.items():
        assert r.n_local - r.n_remote == deletes[b]
        # updated-only buckets still differ via the checksum digest
        assert r.n_local != r.n_remote or r.cs_delta != 0


def test_mixture_temperature_flattens_toward_uniform(spark, queries):
    rows = queries["q_mixture_temperature"](spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    assert abs(sum(r.p_raw for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.w_temp for r in rows) - 1.0) < 1e-3
    # temperature flattening: every minority source gains weight,
    # every majority source loses it (strictly, unless already uniform)
    n_src = len(rows)
    for r in rows:
        if r.p_raw < 1.0 / n_src:
            assert r.upsample_factor > 1.0, r.source
        elif r.p_raw > 1.0 / n_src:
            assert r.upsample_factor < 1.0, r.source
    # order preserved: tempering never inverts source ranking
    by_p = sorted(rows, key=lambda r: r.p_raw)
    by_w = sorted(rows, key=lambda r: r.w_temp)
    assert [r.source for r in by_p] == [r.source for r in by_w]


def test_pseudonymize_preserves_referential_integrity(spark, queries):
    """Surrogate ids must be collision-free and the surrogate-joined
    order counts must equal the natural-key join counts."""
    from flink_tutorial_broadcast_spark.io import load
    rows = queries["q_pseudonymize"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_sids == r.n_customers, r.segment
        assert len(r.spot_sid) == 64  # sha-256 hex
    want = {
        r["c_mktsegment"]: r["n"]
        for r in load(spark, SF_SMOKE, "orders")
        .join(load(spark, SF_SMOKE, "customer"),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()
    }
    assert {r.segment: r.n_orders for r in rows} == want


def test_k_anonymity_suppresses_small_cells(spark, queries):
    rows = queries["q_k_anonymity"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        if r.status == "suppressed":
            assert r.n_released is None
        else:
            assert r.n_released >= 5


def test_term_redact_masks_every_blocklist_hit(spark, queries):
    """No redacted fingerprint may equal the original text's fingerprint,
    and hit counts must match a direct recount."""
    from flink_tutorial_broadcast_spark.io import load
    out = {r.doc_id: r for r in
           queries["q_term_redact"](spark, SF_SMOKE).collect()}
    assert out
    docs = load(spark, SF_SMOKE, "documents").select(
        "doc_id", "text",
        F.md5("text").alias("orig_fp")).collect()
    import re
    pat = re.compile(r"\b(customer|key|value)\b")
    for d in docs:
        hits = len(pat.findall(d.text))
        if hits:
            assert out[d.doc_id].n_redacted == hits
            assert out[d.doc_id].red_fp != d.orig_fp
        else:
            assert d.doc_id not in out


def test_observed_gate_metrics_match_exact_counts(spark):
    from flink_tutorial_broadcast_spark.operators.governance import (
        observed_quality_gate,
    )
    from flink_tutorial_broadcast_spark.io import load
    from tests.conftest import SF_SMOKE

    out, obs = observed_quality_gate(spark, SF_SMOKE)
    n_out = out.count()  # one job; metrics ride along, no extra scan
    m = obs.get
    docs = load(spark, SF_SMOKE, "documents")
    n_docs = docs.count()
    n_len = docs.filter(F.col("n_chars") >= 100).count()
    assert m["n_seen"] == n_docs
    assert m["n_pass_len"] == n_len
    assert m["n_pass_both"] == n_out
    assert m["n_seen"] >= m["n_pass_len"] >= m["n_pass_both"]


def test_l_diversity_gates_fire_in_order(spark, queries):
    from flink_tutorial_broadcast_spark.io import load
    from tests.conftest import SF_SMOKE

    rows = queries["q_l_diversity"](spark, SF_SMOKE).collect()
    base = (load(spark, SF_SMOKE, "customer")
            .groupBy("c_nationkey", "c_mktsegment")
            .agg(F.count("*").alias("n"),
                 F.countDistinct(
                     F.floor(F.col("c_acctbal") / 2000).cast("long"))
                 .alias("l")).collect())
    exact = {(r.c_nationkey, r.c_mktsegment): (r.n, r.l) for r in base}
    assert len(rows) == len(exact)
    for r in rows:
        n, l = exact[(r.c_nationkey, r.c_mktsegment)]
        if n < 5:
            assert r.status == "suppressed_k" and r.n_released is None
        elif l < 3:
            assert r.status == "suppressed_l" and r.n_released is None
        else:
            assert r.status == "released" and r.n_released == n


def test_setsim_tid_rank_is_df_tok_order(spark):
    """r14: q_setsim_join replaced shingle STRINGS with dense integer
    ranks. The whole rewrite is exact iff the rank order equals the old
    (document frequency, token) struct-sort order — pin that bijection
    directly against the string pipeline on the smoke fixture."""
    from pyspark.sql import functions as F

    from flink_tutorial_broadcast_spark.io import load
    from tests.conftest import SF_SMOKE

    d = (load(spark, SF_SMOKE, "documents")
         .select("doc_id", F.split("text", " ").alias("wl"))
         .filter(F.size("wl") >= 2)
         .select("doc_id", F.expr(
             "array_distinct(transform(sequence(1, size(wl) - 1), "
             "i -> concat(element_at(wl, i), '_', "
             "element_at(wl, i + 1))))").alias("toks")))
    tok = d.select("doc_id", F.explode("toks").alias("tok"))
    dfreq = tok.groupBy("tok").agg(F.count("*").alias("df"))
    vocab = (dfreq.coalesce(1).sortWithinPartitions("df", "tok")
             .withColumn("tid", F.monotonically_increasing_id()))
    rows = vocab.orderBy("tid").collect()
    # ids are dense 0..|vocab|-1 and tid order IS (df, tok) order
    assert [r["tid"] for r in rows] == list(range(len(rows)))
    assert [(r["df"], r["tok"]) for r in rows] \
        == sorted((r["df"], r["tok"]) for r in rows)
    # per-doc: sort_array over tids == the old (df, tok) struct sort
    ti = (tok.join(F.broadcast(vocab), "tok")
          .groupBy("doc_id")
          .agg(F.sort_array(F.collect_list("tid")).alias("tids")))
    old = (tok.join(dfreq, "tok")
           .groupBy("doc_id")
           .agg(F.array_sort(
               F.collect_list(F.struct("df", "tok"))).alias("ord")))
    tid_of = {r["tok"]: r["tid"] for r in rows}
    got = {r["doc_id"]: list(r["tids"]) for r in ti.collect()}
    want = {r["doc_id"]: [tid_of[x["tok"]] for x in r["ord"]]
            for r in old.collect()}
    assert got == want
