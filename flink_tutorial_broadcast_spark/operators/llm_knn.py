"""Embedding similarity search (SURVEY.md §2.K3; split from llm_ops.py
in round 5, keys and behavior unchanged): brute-force cosine top-k (the
correctness baseline), the Arrow+numpy vectorized form (partition-local
top-k, O(partitions·k) shuffle), IVF cell routing, label-filtered ANN,
and hard-negative mining. The PQ / IVF-PQ compression rungs live in
vector_compress.py.

Scale rules: probes broadcast, corpus never reshuffles; per-row norms
hoisted out of per-pair loops.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_tutorial_broadcast_spark.io import load
from flink_tutorial_broadcast_spark.registry import query

# --- embedding similarity search (K3) ---------------------------------------

_N_PROBES = 10
_TOP_K = 5


def _dot(a, b):
    """Sequential double-precision dot product of two float arrays — the
    same left-fold order DuckDB's list loop uses, so values are
    bit-identical across engines."""
    pairs = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(pairs, F.lit(0.0), lambda acc, x: acc + x)


def _cosine(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


@query(
    "q_knn_bruteforce",
    oracle=f"""
    WITH dbl AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), probes AS (
      SELECT vec_id AS p_id, emb AS p_emb FROM dbl WHERE vec_id < {_N_PROBES}
    ), pairs AS (
      SELECT p.p_id, e.vec_id,
             list_dot_product(e.emb, p.p_emb)
               / (sqrt(list_dot_product(e.emb, e.emb))
                  * sqrt(list_dot_product(p.p_emb, p.p_emb))) AS cos
      FROM probes p CROSS JOIN dbl e
      WHERE e.vec_id <> p.p_id
    ), ranked AS (
      SELECT p_id, vec_id, cos,
             row_number() OVER (PARTITION BY p_id
                                ORDER BY cos DESC, vec_id) AS rn
      FROM pairs
    )
    SELECT p_id, vec_id, ROUND(cos, 6) AS cos_sim, rn
    FROM ranked WHERE rn <= {_TOP_K}
    """,
)
def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 brute-force cosine top-k: 10 probe vectors × full corpus.

    The probe side broadcasts (corpus never shuffles). Exactness is
    unchanged from the array-fold form (r13, guide §4.2): every dot
    product and norm is a float64 np.cumsum along the vector axis — the
    SAME sequential left-fold the JVM aggregate()/zip_with expression
    and DuckDB's list loop evaluate, so every cos is bit-identical to
    the previous implementation — but the fold runs vectorized over
    Arrow batches instead of per-pair interpreted lambda evaluation
    (HigherOrderFunctions never enter whole-stage codegen; measured
    ~1.0 s → ~0.65 s at sf0.1). Each batch emits only its local top-k
    rows per probe (a superset of the global top-k by construction), so
    the window pass ranks O(batches × probes × k) skinny rows, not
    |corpus| × |probes| pairs — the shuffle is corpus-size-independent.
    This stays the exact baseline the IVF/LSH paths are measured
    against. At 100 TB the corpus stays partition-local — cost is one
    scan per probe batch.
    """
    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings")
    # probe matrix: N_PROBES × 64 floats — driver-side collect of a
    # bounded dim table (KB), the pandas analogue of F.broadcast
    probe_rows = sorted(
        emb.filter(F.col("vec_id") < _N_PROBES)
        .select("vec_id", "embedding").collect(),
        key=lambda r: r["vec_id"])
    p_ids = np.array([r["vec_id"] for r in probe_rows], dtype=np.int64)
    p_mat = np.array([r["embedding"] for r in probe_rows], dtype=np.float64)
    # sequential left-fold norm: cumsum's last element == the SQL fold
    p_norm = np.sqrt(np.cumsum(p_mat * p_mat, axis=1)[:, -1])

    def topk_cos_batches(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            c_mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            c_norm = np.sqrt(np.cumsum(c_mat * c_mat, axis=1)[:, -1])
            vec_ids = pdf["vec_id"].to_numpy()
            out_p, out_v, out_c = [], [], []
            for j, p_id in enumerate(p_ids):
                # elementwise product then cumsum — the exact left-fold
                # order of aggregate(zip_with(...)) / DuckDB's loop
                dots = np.cumsum(c_mat * p_mat[j], axis=1)[:, -1]
                cos = dots / (c_norm * p_norm[j])
                keep = vec_ids != p_id
                k = min(_TOP_K, int(keep.sum()))
                if k <= 0:
                    continue
                cs, vs = cos[keep], vec_ids[keep]
                order = np.lexsort((vs, -cs))[:k]  # (cos DESC, vec_id ASC)
                out_p.extend([p_id] * k)
                out_v.extend(vs[order].tolist())
                out_c.extend(cs[order].tolist())
            yield pd.DataFrame({"p_id": np.array(out_p, dtype=np.int64),
                                "vec_id": np.array(out_v, dtype=np.int64),
                                "cos": np.array(out_c, dtype=np.float64)})

    local = emb.select("vec_id", "embedding").mapInPandas(
        topk_cos_batches, "p_id long, vec_id long, cos double")
    w = Window.partitionBy("p_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        local.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("p_id", "vec_id", F.round("cos", 6).alias("cos_sim"), "rn")
    )


@query(
    "q_knn_vectorized",
    oracle=f"""
    WITH dbl AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), probes AS (
      SELECT vec_id AS p_id, emb AS p_emb FROM dbl WHERE vec_id < {_N_PROBES}
    ), pairs AS (
      SELECT p.p_id, e.vec_id,
             list_dot_product(e.emb, p.p_emb)
               / (sqrt(list_dot_product(e.emb, e.emb))
                  * sqrt(list_dot_product(p.p_emb, p.p_emb))) AS cos
      FROM probes p CROSS JOIN dbl e
      WHERE e.vec_id <> p.p_id
    ), ranked AS (
      SELECT p_id, vec_id, cos,
             row_number() OVER (PARTITION BY p_id
                                ORDER BY cos DESC, vec_id) AS rn
      FROM pairs
    )
    SELECT p_id, vec_id, ROUND(cos, 6) AS cos_sim, rn
    FROM ranked WHERE rn <= {_TOP_K}
    """,
)
def q_knn_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 vectorized exact top-k — the 100 TB hot path for brute-force.

    Same semantics as q_knn_bruteforce, different physical strategy:
    the tiny probe matrix ships to every partition; each Arrow batch does
    ONE numpy float64 matmul (corpus_batch × probes) and emits only its
    partition-local top-k rows per probe; a final window pass reduces
    npartitions×k candidates to the global top-k. Shuffled volume is
    O(partitions × probes × k) — independent of corpus size — and the
    per-row cost is BLAS, ~dims× cheaper than the per-element array fold.
    Oracle-parity note: float64 matmul vs the oracle's sequential fold
    differ by ~1e-15; both sides round to 6 decimals.
    """
    import numpy as np

    emb = load(spark, sf_dir, "embeddings")
    # probe matrix: N_PROBES × 64 floats — driver-side collect of a
    # bounded dim table (KB), the pandas analogue of F.broadcast
    probe_rows = sorted(
        emb.filter(F.col("vec_id") < _N_PROBES)
        .select("vec_id", "embedding").collect(),
        key=lambda r: r["vec_id"])
    p_ids = np.array([r["vec_id"] for r in probe_rows])
    p_mat = np.array([r["embedding"] for r in probe_rows], dtype=np.float64)
    p_norm = np.sqrt((p_mat * p_mat).sum(axis=1))

    def topk_per_batch(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            c_mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            c_norm = np.sqrt((c_mat * c_mat).sum(axis=1))
            cos = (c_mat @ p_mat.T) / np.outer(c_norm, p_norm)
            vec_ids = pdf["vec_id"].to_numpy()
            out = {"p_id": [], "vec_id": [], "cos": []}
            for j, p_id in enumerate(p_ids):
                col = cos[:, j]
                mask = vec_ids != p_id          # exclude self-match
                idx = np.nonzero(mask)[0]
                if idx.size > _TOP_K:           # partition-local top-k
                    idx = idx[np.argpartition(-col[idx], _TOP_K)[:_TOP_K + 1]]
                out["p_id"].extend([p_id] * idx.size)
                out["vec_id"].extend(vec_ids[idx])
                out["cos"].extend(col[idx])
            yield pd.DataFrame(out)

    local = emb.select("vec_id", "embedding").mapInPandas(
        topk_per_batch, "p_id long, vec_id long, cos double")
    w = Window.partitionBy("p_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        local.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("p_id", "vec_id", F.round("cos", 6).alias("cos_sim"), "rn")
    )


_IVF_K = 8       # number of centroids
_IVF_NPROBE = 2  # clusters searched per probe


_IVF_COS = ("list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
            " * sqrt(list_dot_product({b}, {b})))")


def _ivf_assigned(spark: SparkSession, sf_dir: str, emb, cents) -> DataFrame:
    """The IVF index: every vector routed to its nearest centroid, with
    its norm hoisted, parked once per fixture file as cluster-partitioned
    parquet (see q_knn_ivf's docstring note)."""
    import os

    from flink_tutorial_broadcast_spark.operators.vector_compress import (
        _artifact_entry,
    )
    e = _artifact_entry(sf_dir)
    if "ivf" not in e:
        ass_w = Window.partitionBy("vec_id").orderBy(
            F.col("c_cos").desc(), F.col("c_id"))
        built = (
            emb.crossJoin(F.broadcast(cents))
            .select("vec_id", "embedding", "c_id",
                    _cosine(F.col("embedding"), F.col("c_emb"))
                    .alias("c_cos"))
            .withColumn("arn", F.row_number().over(ass_w))
            .filter(F.col("arn") == 1)
            .select("vec_id", "embedding", F.col("c_id").alias("cluster"),
                    F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                    .alias("norm"))
        )
        path = os.path.join(e["dir"], "ivf")
        built.write.partitionBy("cluster").parquet(path)
        e["ivf"] = path
    return spark.read.parquet(e["ivf"])



@query(
    "q_knn_ivf",
    # round-3 promotion from rows-only: every step (cosine folds, argmax
    # by identical doubles, integer routing) is engine-portable, so the
    # full IVF pipeline hash-matches an independent engine
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    cents AS (
      SELECT vec_id AS c_id, e AS c FROM emb WHERE vec_id < 8
    ),
    assigned AS (
      SELECT vec_id, e, cluster FROM (
        SELECT m.vec_id, m.e, ct.c_id AS cluster,
               row_number() OVER (PARTITION BY m.vec_id
                 ORDER BY {_IVF_COS.format(a='m.e', b='ct.c')} DESC,
                          ct.c_id) AS arn
        FROM emb m CROSS JOIN cents ct
      ) WHERE arn = 1
    ),
    probes AS (
      SELECT vec_id AS p_id, e AS p_emb FROM assigned WHERE vec_id < 10
    ),
    probe_clusters AS (
      SELECT p_id, p_emb, cluster FROM (
        SELECT p.p_id, p.p_emb, ct.c_id AS cluster,
               row_number() OVER (PARTITION BY p.p_id
                 ORDER BY {_IVF_COS.format(a='p.p_emb', b='ct.c')} DESC,
                          ct.c_id) AS prn
        FROM probes p CROSS JOIN cents ct
      ) WHERE prn <= 2
    ),
    pairs AS (
      SELECT pc.p_id, a.vec_id,
             {_IVF_COS.format(a='a.e', b='pc.p_emb')} AS cos
      FROM probe_clusters pc JOIN assigned a ON a.cluster = pc.cluster
      WHERE a.vec_id <> pc.p_id
    )
    SELECT p_id, vec_id, ROUND(cos, 6) AS cos_sim, rn
    FROM (
      SELECT p_id, vec_id, cos,
             row_number() OVER (PARTITION BY p_id
               ORDER BY cos DESC, vec_id) AS rn
      FROM pairs
    ) WHERE rn <= 5
    """,
)
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 IVF-style ANN: bucket the corpus by nearest of 8 fixed centroids
    (deterministically the first 8 vectors), search only the nprobe=2
    closest buckets per probe.

    The scale story: corpus partitioned by centroid_id; a probe touches
    nprobe/K of the data. Recall@5 vs q_knn_bruteforce asserted in tests.
    """
    emb = load(spark, sf_dir, "embeddings")
    cents = (
        emb.filter(F.col("vec_id") < _IVF_K)
        .select(F.col("vec_id").alias("c_id"),
                F.col("embedding").alias("c_emb"))
    )
    # The assignment is a deterministic function of the fixture file, so
    # it is BUILT once and parked as cell-partitioned parquet (the real
    # stored-index layout — the same per-fixture artifact cache the
    # PQ/IVF-PQ keys use, VERDICT r5 task 6): repeated sweep/bench reps
    # read the index instead of re-routing the corpus, and the
    # partitionBy(cluster) layout is what a 100 TB deployment would ship
    # (probe joins prune cells). Reload is bit-identical (doubles stored
    # and read back), so oracle hashes are unchanged.
    assigned = _ivf_assigned(spark, sf_dir, emb, cents)
    # probes search their nprobe nearest clusters
    probes = assigned.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("p_id"), F.col("embedding").alias("p_emb"),
        F.col("norm").alias("p_norm"))
    pw = Window.partitionBy("p_id").orderBy(F.col("pc_cos").desc(),
                                            F.col("c_id"))
    probe_clusters = (
        probes.crossJoin(F.broadcast(cents))
        .select("p_id", "p_emb", "p_norm", "c_id",
                _cosine(F.col("p_emb"), F.col("c_emb")).alias("pc_cos"))
        .withColumn("prn", F.row_number().over(pw))
        .filter(F.col("prn") <= _IVF_NPROBE)
        .select("p_id", "p_emb", "p_norm", F.col("c_id").alias("cluster"))
    )
    pairs = (
        probe_clusters.join(assigned, "cluster")
        .filter(F.col("vec_id") != F.col("p_id"))
        .select("p_id", "vec_id",
                (_dot(F.col("embedding"), F.col("p_emb"))
                 / (F.col("norm") * F.col("p_norm"))).alias("cos"))
    )
    w = Window.partitionBy("p_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("p_id", "vec_id", F.round("cos", 6).alias("cos_sim"), "rn")
    )


@query(
    "q_embed_norm_stats",
    oracle="""
    WITH dbl AS (
      SELECT label,
             sqrt(list_dot_product(
               list_transform(embedding, x -> CAST(x AS DOUBLE)),
               list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS norm
      FROM embeddings
    )
    SELECT label, COUNT(*) AS n_vecs,
           ROUND(AVG(norm), 6) AS avg_norm,
           ROUND(MIN(norm), 6) AS min_norm,
           ROUND(MAX(norm), 6) AS max_norm
    FROM dbl GROUP BY 1
    """,
)
def q_embed_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3/K5 multimodal-column stats: L2-norm distribution per label."""
    emb = load(spark, sf_dir, "embeddings")
    norm = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    return (
        emb.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(F.count("*").alias("n_vecs"),
             F.round(F.avg("norm"), 6).alias("avg_norm"),
             F.round(F.min("norm"), 6).alias("min_norm"),
             F.round(F.max("norm"), 6).alias("max_norm"))
    )


# --- embedding-cosine near-dup (K2; mandate item) ---------------------------


@query(
    "q_knn_filtered",
    oracle=f"""
    WITH dbl AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), probes AS (
      SELECT vec_id AS p_id, label AS p_label, emb AS p_emb
      FROM dbl WHERE vec_id < {_N_PROBES}
    ), pairs AS (
      SELECT p.p_id, e.vec_id,
             list_dot_product(e.emb, p.p_emb)
               / (sqrt(list_dot_product(e.emb, e.emb))
                  * sqrt(list_dot_product(p.p_emb, p.p_emb))) AS cos
      FROM probes p JOIN dbl e ON e.label = p.p_label
      WHERE e.vec_id <> p.p_id
    ), ranked AS (
      SELECT p_id, vec_id, cos,
             row_number() OVER (PARTITION BY p_id
                                ORDER BY cos DESC, vec_id) AS rn
      FROM pairs
    )
    SELECT p_id, vec_id, ROUND(cos, 6) AS cos_sim, rn
    FROM ranked WHERE rn <= {_TOP_K}
    """,
)
def q_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED similarity search: top-k among vectors sharing the
    probe's label (metadata-constrained ANN — "nearest neighbors WHERE
    label = X", the shape every production vector store must serve).
    The constraint enters as the JOIN KEY, so the filter prunes BEFORE
    any distance is computed — pre-filtering, not post-filtering, which
    at 100 TB is the difference between scanning one label's partition
    and scanning the corpus then discarding 90% of the arithmetic.
    Layout twin: partition the corpus BY label and this is a
    partition-pruned local scan per probe."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("norm"))
    probes = (
        emb.filter(F.col("vec_id") < _N_PROBES)
        .select(F.col("vec_id").alias("p_id"),
                F.col("label").alias("p_label"),
                F.col("embedding").alias("p_emb"),
                F.col("norm").alias("p_norm"))
    )
    pairs = (
        emb.join(F.broadcast(probes), emb.label == probes.p_label)
        .filter(F.col("vec_id") != F.col("p_id"))
        .select("p_id", "vec_id",
                (_dot(F.col("embedding"), F.col("p_emb"))
                 / (F.col("norm") * F.col("p_norm"))).alias("cos"))
    )
    w = Window.partitionBy("p_id").orderBy(
        F.col("cos").desc(), F.col("vec_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("p_id", "vec_id", F.round("cos", 6).alias("cos_sim"), "rn")
    )


@query(
    "q_hard_negatives",
    oracle=f"""
    WITH dbl AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), probes AS (
      SELECT vec_id AS p_id, label AS p_label, emb AS p_emb
      FROM dbl WHERE vec_id < {_N_PROBES}
    ), pairs AS (
      SELECT p.p_id, e.vec_id, e.label,
             list_dot_product(e.emb, p.p_emb)
               / (sqrt(list_dot_product(e.emb, e.emb))
                  * sqrt(list_dot_product(p.p_emb, p.p_emb))) AS cos
      FROM probes p CROSS JOIN dbl e
      WHERE e.label <> p.p_label
    ), ranked AS (
      SELECT p_id, vec_id, label, cos,
             row_number() OVER (PARTITION BY p_id
                                ORDER BY cos DESC, vec_id) AS rn
      FROM pairs
    )
    SELECT p_id, vec_id, label AS neg_label, ROUND(cos, 6) AS cos_sim, rn
    FROM ranked WHERE rn <= 3
    """,
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: for each anchor embedding, the
    top-3 most-similar vectors carrying a DIFFERENT label — the
    near-miss negatives that make contrastive/embedding training
    converge (random negatives are too easy; hard negatives sit near
    the decision boundary by construction). Same physical family as
    q_knn_bruteforce — anchors broadcast, corpus never shuffles, cosine
    as a codegen'd array fold, per-anchor rank-filter — with the label
    INEQUALITY evaluated before the distance so same-class rows drop at
    the join, not after scoring. The 100 TB path swaps the scan for the
    IVF/LSH candidate stream exactly as q_knn_ivf does for plain kNN."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("norm"))
    probes = (
        emb.filter(F.col("vec_id") < _N_PROBES)
        .select(F.col("vec_id").alias("p_id"),
                F.col("label").alias("p_label"),
                F.col("embedding").alias("p_emb"),
                F.col("norm").alias("p_norm"))
    )
    pairs = (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("label") != F.col("p_label"))
        .select("p_id", "vec_id", "label",
                (_dot(F.col("embedding"), F.col("p_emb"))
                 / (F.col("norm") * F.col("p_norm"))).alias("cos"))
    )
    w = Window.partitionBy("p_id").orderBy(F.col("cos").desc(),
                                           F.col("vec_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_id", "vec_id", F.col("label").alias("neg_label"),
                F.round("cos", 6).alias("cos_sim"), "rn")
    )

