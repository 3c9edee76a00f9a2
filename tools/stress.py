"""Stress harness: run engine shapes at ~16× the largest fixture
(≈9.6M lineitem rows, ≈1.6M events) to show headroom beyond sf0.1 and
report per-row throughput. Input is the read-only sf0.1 fixture unioned
k× with perturbed keys — no fixture files are created or modified.

Usage: python tools/stress.py [k]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_tutorial_broadcast_spark.io import load  # noqa: E402
from flink_tutorial_broadcast_spark.session import get_spark  # noqa: E402
from flink_tutorial_broadcast_spark.sources.rules import rules_df  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def amplify(df, key_cols, k: int):
    """k copies with shifted keys so join/group cardinalities scale too."""
    rep = df.crossJoin(F.broadcast(
        df.sparkSession.range(k).select(F.col("id").alias("__rep"))))
    out = rep
    for c in key_cols:
        out = out.withColumn(c, F.col(c) + F.col("__rep") * 10_000_000)
    return out.drop("__rep")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark("stress")
    spark.sparkContext.setLogLevel("ERROR")

    li = amplify(load(spark, SF_DIR, "lineitem"), ["l_orderkey"], k)
    o = amplify(load(spark, SF_DIR, "orders"), ["o_orderkey"], k)
    ev = amplify(load(spark, SF_DIR, "events"), ["event_id"], k)
    n_li, n_ev = li.count(), ev.count()

    results = {}

    t0 = time.time()
    (li.join(o, li.l_orderkey == o.o_orderkey)
     .groupBy("o_orderstatus")
     .agg(F.count("*").alias("n"), F.sum("l_extendedprice").alias("s"))
     ).count()
    results["join_agg"] = {
        "rows": n_li, "sec": round(time.time() - t0, 2),
        "mrows_per_s": round(n_li / (time.time() - t0) / 1e6, 1)}

    t0 = time.time()
    rules = rules_df(spark)
    (ev.join(F.broadcast(rules),
             (ev.event_type == rules.rule_event_type)
             & (ev.value > rules.threshold))
     .groupBy(F.date_trunc("hour", "ts"), "event_type")
     .agg(F.count("*"), F.sum("value"))
     ).count()
    results["broadcast_rule_join"] = {
        "rows": n_ev, "sec": round(time.time() - t0, 2),
        "mrows_per_s": round(n_ev / (time.time() - t0) / 1e6, 1)}

    t0 = time.time()
    li.groupBy(F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber"))
               .alias("h")).agg(F.min("l_partkey")).count()
    results["exact_dedup_md5"] = {
        "rows": n_li, "sec": round(time.time() - t0, 2),
        "mrows_per_s": round(n_li / (time.time() - t0) / 1e6, 1)}

    # engine-path keying (q_dedup_exact_fast): long keys, one-pass hash
    t0 = time.time()
    li.groupBy(F.xxhash64("l_orderkey", "l_linenumber").alias("h")) \
      .agg(F.min("l_partkey")).count()
    results["exact_dedup_xxhash"] = {
        "rows": n_li, "sec": round(time.time() - t0, 2),
        "mrows_per_s": round(n_li / (time.time() - t0) / 1e6, 1)}

    # EWMA fold (q_ewma): per-key sorted-array aggregate, all codegen
    t0 = time.time()
    arr = F.sort_array(F.collect_list(F.struct("ts", "event_id", "value")))
    fold = F.aggregate(
        arr, F.lit(None).cast("double"),
        lambda acc, x: F.coalesce(F.lit(0.3) * x["value"]
                                  + F.lit(0.7) * acc, x["value"]))
    ev.groupBy("user_id").agg(fold.alias("ewma")).count()
    results["ewma_fold"] = {
        "rows": n_ev, "sec": round(time.time() - t0, 2),
        "mrows_per_s": round(n_ev / (time.time() - t0) / 1e6, 1)}

    # incremental partial-agg merge (q_incremental_agg): two-level agg
    t0 = time.time()
    (ev.groupBy(F.to_date("ts").alias("day"), "event_type")
     .agg(F.count("*").alias("pn"), F.sum("value").alias("psum"))
     .groupBy("event_type")
     .agg(F.sum("pn"), F.sum("psum"))).count()
    results["incremental_agg"] = {
        "rows": n_ev, "sec": round(time.time() - t0, 2),
        "mrows_per_s": round(n_ev / (time.time() - t0) / 1e6, 1)}

    # per-key window rank over the amplified fact (q_rank shape)
    t0 = time.time()
    from pyspark.sql.window import Window
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    o.withColumn("rn", F.row_number().over(w)) \
     .filter(F.col("rn") <= 3).count()
    results["window_topn"] = {
        "rows": o.count(), "sec": round(time.time() - t0, 2),
        "mrows_per_s": round(o.count() / (time.time() - t0) / 1e6, 1)}

    # OHLC bars (q_ohlc shape): single partial+final agg, arg-min/max keys
    t0 = time.time()
    ord_key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 10, "0"))
    (ev.select("event_type", F.date_trunc("day", "ts").alias("day"),
               "value", ord_key.alias("ord"))
     .groupBy("event_type", "day")
     .agg(F.min_by("value", F.col("ord")), F.max("value"),
          F.min("value"), F.max_by("value", F.col("ord")),
          F.count("*"))).count()
    results["ohlc_bars"] = {
        "rows": n_ev, "sec": round(time.time() - t0, 2),
        "mrows_per_s": round(n_ev / (time.time() - t0) / 1e6, 1)}

    # int8 quantization (q_embed_quantize shape): long-form codes
    emb = amplify(load(spark, SF_DIR, "embeddings"), ["vec_id"], k)
    n_cells = emb.count() * 64
    t0 = time.time()
    x = (emb.select("vec_id", F.posexplode("embedding").alias("pos", "vf"))
         .select("vec_id", "pos", F.col("vf").cast("double").alias("v")))
    stats = x.groupBy("pos").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    (x.join(F.broadcast(stats), "pos")
     .select(F.least(F.floor((F.col("v") - F.col("mn")) * 256
                             / (F.col("mx") - F.col("mn"))), F.lit(255))
             .alias("code"))
     .agg(F.sum("code"))).count()
    results["embed_quantize"] = {
        "rows": n_cells, "sec": round(time.time() - t0, 2),
        "mrows_per_s": round(n_cells / (time.time() - t0) / 1e6, 1)}

    # documents: dedup exact texts FIRST (the fixture has duplicate
    # groups by design; amplifying them k× would grow true-duplicate
    # PAIRS k²× and measure that blowup, not the operator), then
    # amplify with a per-replica suffix on EVERY token so the k copies
    # share zero vocabulary — near-dup pairs stay within-replica and
    # candidate counts scale k×, not k²×
    docs = (load(spark, SF_DIR, "documents")
            .dropDuplicates(["text"]))
    dr = (docs.crossJoin(F.broadcast(
            spark.range(k).select(F.col("id").alias("__rep"))))
          .select((F.col("doc_id") + F.col("__rep") * 10_000_000)
                  .alias("doc_id"),
                  F.array_join(F.transform(
                      F.split("text", " "),
                      lambda x: F.concat(
                          x, F.lit("#"), F.col("__rep").cast("string"))),
                      " ").alias("text"),
                  "lang"))
    n_docs = dr.count()

    # sequence packing (q_pack_sequences shape)
    t0 = time.time()
    from pyspark.sql.window import Window as W2
    win = (W2.partitionBy("lang").orderBy("doc_id")
           .rowsBetween(W2.unboundedPreceding, W2.currentRow))
    (dr.select("doc_id", "lang", F.size(F.split("text", " ")).alias("nw"))
     .withColumn("cum", F.sum("nw").over(win))
     .select(F.expr("(cum - 1) div 256").alias("seq_end"))
     .agg(F.max("seq_end"))).count()
    results["pack_sequences"] = {
        "rows": n_docs, "sec": round(time.time() - t0, 2),
        "mrows_per_s": round(n_docs / (time.time() - t0) / 1e6, 1)}

    # bigram repetition profile (q_repetition_profile shape)
    t0 = time.time()
    bg = dr.select(
        "doc_id",
        F.explode(F.expr(
            "transform(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),"
            " (x, i) -> concat(x, ' ', split(text, ' ')[i + 1]))")).alias("b"))
    (bg.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
     .groupBy("doc_id").agg(F.sum("c"), F.count("*"), F.max("c"))).count()
    results["repetition_bigrams"] = {
        "rows": n_docs, "sec": round(time.time() - t0, 2),
        "mrows_per_s": round(n_docs / (time.time() - t0) / 1e6, 1)}

    # prefix-filtered set-similarity self-join (q_setsim_join shape)
    t0 = time.time()
    d = dr.select("doc_id", F.array_distinct(F.split("text", " ")).alias("t"))
    tok = d.select("doc_id", F.explode("t").alias("tok"))
    dfreq = tok.groupBy("tok").agg(F.count("*").alias("df"))
    prefix = (
        tok.join(dfreq, "tok")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "tok"))).alias("o"),
             F.count("*").alias("n"))
        .select("doc_id", F.explode(F.expr(
            "slice(transform(o, x -> x.tok), 1,"
            " CAST(n - ((6 * n + 9) div 10) + 1 AS INT))")).alias("tok")))
    cand = (prefix.alias("pa").join(prefix.alias("pb"), "tok")
            .filter(F.col("pa.doc_id") < F.col("pb.doc_id"))
            .select(F.col("pa.doc_id").alias("a"),
                    F.col("pb.doc_id").alias("b")).distinct())
    n_cand = cand.count()
    results["setsim_prefix_join"] = {
        "rows": n_docs, "candidates": n_cand,
        "sec": round(time.time() - t0, 2),
        "mrows_per_s": round(n_docs / (time.time() - t0) / 1e6, 2)}

    # unigram-LM scoring (q_unigram_lm_score shape, round 2): tokenize
    # scan shared by vocab + scoring join; rows = exploded token count
    t0 = time.time()
    toks = dr.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    vocab = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = toks.agg(F.count("*").alias("total"))
    (toks.join(vocab, "token").crossJoin(F.broadcast(total))
     .groupBy("doc_id")
     .agg(F.avg(F.log("cnt") - F.log("total")))).count()
    n_toks = toks.count()
    results["unigram_lm_score"] = {
        "rows": n_toks, "sec": round(time.time() - t0, 2),
        "mrows_per_s": round(n_toks / (time.time() - t0) / 1e6, 1)}

    # sample-then-verify heavy hitters (q_heavy_hitters shape, round 2)
    t0 = time.time()
    sample = toks.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "4")
    ns = sample.agg(F.count("*").alias("n_sample"))
    cand_hh = (sample.crossJoin(F.broadcast(ns))
               .groupBy("token", "n_sample").agg(F.count("*").alias("c"))
               .filter(F.col("c") >= 0.001 * F.col("n_sample"))
               .select("token"))
    toks.join(F.broadcast(cand_hh), "token") \
        .groupBy("token").agg(F.count("*")).count()
    results["heavy_hitters"] = {
        "rows": n_toks, "sec": round(time.time() - t0, 2),
        "mrows_per_s": round(n_toks / (time.time() - t0) / 1e6, 1)}

    # anti-entropy bucket digests (q_table_reconcile shape, round 2):
    # both copies digested + compared; rows = 2× the table
    t0 = time.time()
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    digest = (o.select((F.col("o_orderkey") % 4096).alias("bucket"),
                       (F.col("o_orderkey") * 31 + cents).alias("cs"))
              .groupBy("bucket")
              .agg(F.count("*").alias("n"), F.sum("cs").alias("cs_sum")))
    d2 = (o.filter(F.col("o_orderkey") % 97 != 0)
          .select((F.col("o_orderkey") % 4096).alias("bucket"),
                  (F.col("o_orderkey") * 31 + cents).alias("cs"))
          .groupBy("bucket")
          .agg(F.count("*").alias("n2"), F.sum("cs").alias("cs2")))
    digest.join(d2, "bucket", "full_outer") \
          .filter((F.col("n") != F.col("n2"))
                  | (F.col("cs_sum") != F.col("cs2"))).count()
    n_ord = o.count()
    results["reconcile_digests"] = {
        "rows": 2 * n_ord, "sec": round(time.time() - t0, 2),
        "mrows_per_s": round(2 * n_ord / (time.time() - t0) / 1e6, 1)}

    # --- round-3 shapes -------------------------------------------------
    docs = amplify(load(spark, SF_DIR, "documents"), ["doc_id"], k)
    n_docs = docs.count()

    # count-min sketch over the k×-amplified token stream: the sketch agg
    # stays 192 rows no matter how large the corpus grows
    t0 = time.time()
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    seeds = F.array(F.lit("s1"), F.lit("s2"), F.lit("s3"))
    (toks.select("token", F.explode(seeds).alias("seed"))
     .withColumn("bucket",
                 F.conv(F.substring(F.md5(F.concat("seed", "token")), 1, 8),
                        16, 10).cast("long") % 64)
     .groupBy("seed", "bucket").agg(F.count("*").alias("cnt"))).count()
    n_tok = 3 * toks.count()
    results["cms_sketch"] = {
        "rows": n_tok, "sec": round(time.time() - t0, 2),
        "mrows_per_s": round(n_tok / (time.time() - t0) / 1e6, 1)}

    # two-phase global ordering (curriculum interleave) on the amplified
    # corpus: within-source rank + bucket-histogram global position
    from pyspark.sql import Window

    from flink_tutorial_broadcast_spark.operators.two_phase import (
        global_order,
    )
    t0 = time.time()
    r = docs.select("doc_id", "source").withColumn(
        "rank_in_source",
        F.row_number().over(Window.partitionBy("source").orderBy("doc_id")))
    global_order(r, F.col("rank_in_source"), ["source", "doc_id"],
                 out_rn="position").count()
    results["curriculum_two_phase"] = {
        "rows": n_docs, "sec": round(time.time() - t0, 2),
        "mrows_per_s": round(n_docs / (time.time() - t0) / 1e6, 1)}

    # per-source token-budget cap: source-partitioned running sum
    t0 = time.time()
    wcap = (Window.partitionBy("source").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, 0))
    (docs.select("source", "doc_id",
                 F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
     .withColumn("cum", F.sum("n_tokens").over(wcap))
     .filter(F.col("cum") <= 800)).count()
    results["domain_token_cap"] = {
        "rows": n_docs, "sec": round(time.time() - t0, 2),
        "mrows_per_s": round(n_docs / (time.time() - t0) / 1e6, 1)}

    print(json.dumps({"k": k, "results": results}))


if __name__ == "__main__":
    main()
