"""ANN accuracy/cost table: recall@5 of every approximate rung vs the
exact float brute-force top-5, at a chosen scale (VERDICT r4 task 8 —
record the ladder's accuracy/cost trade as numbers, not prose).

Usage:
    python tools/ann_recall.py [sf_dir]        # default /root/testdata/sf0.1

Prints one JSON line:
    {"sf_dir": ..., "n_probes": ..., "recall_at_5": {rung: r, ...},
     "pair_recall": {"sign_lsh": r, "minhash": r}}

recall@5 = |approx∩exact| / |exact| over (probe, neighbor) pairs, exact
= q_knn_bruteforce (float cosine). PQ/IVF-PQ search integer-quantized
code space, so part of their miss rate is quantization, not indexing —
their in-space floors are pinned separately in tests. Pair recall for
the near-dup LSH rungs uses their own exact counterpart's pair set
(sign-LSH vs q_dedup_embed cosine pairs; MinHash vs exact Jaccard
pairs) since they return pairs, not top-k."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_tutorial_broadcast_spark import load_all_queries  # noqa: E402
from flink_tutorial_broadcast_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--knn-only"]
    knn_only = "--knn-only" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    q = load_all_queries()
    spark = get_spark("ann_recall")
    spark.sparkContext.setLogLevel("ERROR")

    def knn_pairs(key, probe_col, vec_col):
        return {(r[probe_col], r[vec_col])
                for r in q[key](spark, sf_dir).collect()}

    exact = knn_pairs("q_knn_bruteforce", "p_id", "vec_id")
    recall = {}
    for key, probe_col in (("q_knn_vectorized", "p_id"),
                           ("q_knn_ivf", "p_id"),
                           ("q_knn_pq", "probe_id"),
                           ("q_knn_ivfpq", "probe_id")):
        approx = knn_pairs(key, probe_col, "vec_id")
        recall[key] = round(len(approx & exact) / len(exact), 3)

    # in-code-space ground truth for the PQ rungs: exact L2 top-5 over
    # the SAME 256-level per-dimension integer codes PQ quantizes —
    # separates indexing loss (what the index controls) from
    # quantization loss (what int8 storage costs regardless of index)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flink_tutorial_broadcast_spark.io import load

    x = (load(spark, sf_dir, "embeddings")
         .select("vec_id", F.posexplode("embedding").alias("pos", "vf"))
         .select("vec_id", "pos", F.col("vf").cast("double").alias("v")))
    st = x.groupBy("pos").agg(F.min("v").alias("mn"),
                              F.max("v").alias("mx"))
    codes = (x.join(F.broadcast(st), "pos")
             .select("vec_id", "pos",
                     F.least(F.floor((F.col("v") - F.col("mn")) * 256
                                     / (F.col("mx") - F.col("mn"))),
                             F.lit(255)).cast("long").alias("code")))
    probes = codes.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("p"), "pos", F.col("code").alias("pc"))
    d = (codes.join(probes, "pos").filter(F.col("vec_id") != F.col("p"))
         .groupBy("p", "vec_id")
         .agg(F.sum((F.col("code") - F.col("pc")) ** 2).alias("d")))
    w = Window.partitionBy("p").orderBy("d", "vec_id")
    int_exact = {(r["p"], r["vec_id"]) for r in
                 d.withColumn("rn", F.row_number().over(w))
                 .filter(F.col("rn") <= 5).collect()}
    in_code_space = {
        key: round(len(knn_pairs(key, "probe_id", "vec_id") & int_exact)
                   / len(int_exact), 3)
        for key in ("q_knn_pq", "q_knn_ivfpq")
    }

    if knn_only:
        print(json.dumps({
            "sf_dir": sf_dir,
            "n_exact_pairs": len(exact),
            "recall_at_5": recall,
            "recall_at_5_in_code_space": in_code_space,
        }))
        return

    def dedup_pairs(key):
        return {(r["vec_a"], r["vec_b"]) for r in
                q[key](spark, sf_dir).collect()}

    def jac_pairs(key):
        return {(r["doc_a"], r["doc_b"]) for r in
                q[key](spark, sf_dir).collect()}

    def ratio(approx: set, truth: set):
        # None, not 0.0, when the ground-truth pair set is empty at this
        # scale (the seeded near-dups are an sf0.01 fixture property)
        return round(len(approx & truth) / len(truth), 3) if truth else None

    exact_cos = dedup_pairs("q_dedup_embed")
    lsh_cos = dedup_pairs("q_dedup_embed_lsh_portable")
    exact_jac = jac_pairs("q_dedup_near")
    mh_jac = jac_pairs("q_dedup_minhash_portable")
    pair_recall = {
        "q_dedup_embed_lsh_portable": ratio(lsh_cos, exact_cos),
        "q_dedup_minhash_portable": ratio(mh_jac, exact_jac),
    }

    print(json.dumps({
        "sf_dir": sf_dir,
        "n_exact_pairs": len(exact),
        "recall_at_5": recall,
        "recall_at_5_in_code_space": in_code_space,
        "pair_recall": pair_recall,
    }))


if __name__ == "__main__":
    main()
