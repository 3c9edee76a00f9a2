"""Embedding compression operators: int8 scalar quantization and
random-projection dimensionality reduction.

The storage layer of the similarity-search stack (K3/K5): quantization
cuts vector storage 4× before ANN indexing, and sign random projection
(Achlioptas-style ±1 matrix) shrinks 64-dim embeddings to 16 dims while
approximately preserving inner products — the cheap preprocessing in
front of LSH/IVF at 100 TB.

Determinism discipline: the quantization CODES are produced with
integer-exact arithmetic only (floor + clamp — no round-half ties, no
float output), so the compressed representation hashes identically on
any engine. The projection uses a closed-form integer sign matrix
(no RNG state to ship) and rounds its float sums like every other
float aggregate in the engine.

Scale notes:
- Quantize: per-dim stats are a 64-row aggregate broadcast back; the
  code computation is one narrow long-form pass (posexplode →
  broadcast-join → project). At 100 TB the same plan holds — the
  fact side never shuffles (the only exchange carries 64 rows).
- Projection: the relational long form exists to be oracle-checkable;
  the production path for dense matmul is the Arrow/numpy kernel
  already shipped as q_knn_vectorized (mapInPandas, partition-local
  BLAS) — same math, engine-side batching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from flink_tutorial_broadcast_spark.registry import query


@query(
    "q_embed_quantize",
    oracle="""
    WITH x AS (
      SELECT vec_id, i.range AS pos,
             CAST(embedding[CAST(i.range AS INT) + 1] AS DOUBLE) AS v
      FROM embeddings, range(64) i
    ), stats AS (
      SELECT pos, MIN(v) AS mn, MAX(v) AS mx FROM x GROUP BY pos
    )
    SELECT x.vec_id, x.pos,
           CAST(LEAST(FLOOR((x.v - s.mn) * 256 / (s.mx - s.mn)), 255)
                AS BIGINT) AS code
    FROM x JOIN stats s ON x.pos = s.pos
    """,
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column: per-dimension
    min/max ranges (the codebook) map each float to a 0..255 code —
    4× storage cut before ANN indexing, emitted long-form
    (vec_id, pos, code) as the compressed representation itself.

    floor + clamp, never round: no half-way ties, integer output only,
    so codes are bit-identical across engines. The codebook is a 64-row
    aggregate joined back via broadcast — the embedding side never
    shuffles. Reconstruction error is bounded by construction at
    (mx-mn)/256 per dimension (asserted in tests).
    """
    x = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id",
                F.posexplode("embedding").alias("pos", "vf"))
        .select("vec_id", "pos", F.col("vf").cast("double").alias("v"))
    )
    stats = x.groupBy("pos").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    return (
        x.join(F.broadcast(stats), "pos")
        .select(
            "vec_id", "pos",
            F.least(
                F.floor((F.col("v") - F.col("mn")) * 256
                        / (F.col("mx") - F.col("mn"))),
                F.lit(255),
            ).cast("bigint").alias("code"),
        )
    )


@query(
    "q_random_projection",
    oracle="""
    WITH x AS (
      SELECT vec_id, i.range AS pos,
             CAST(embedding[CAST(i.range AS INT) + 1] AS DOUBLE) AS v
      FROM embeddings, range(64) i
    ), proj AS (
      SELECT x.vec_id, j.range AS out_dim,
             SUM(CASE WHEN ((x.pos * 37 + j.range * 101) % 7) % 2 = 0
                      THEN x.v ELSE -x.v END) AS s
      FROM x, range(16) j
      GROUP BY 1, 2
    )
    SELECT vec_id, out_dim, ROUND(s / 8.0, 4) + 0.0 AS y
    FROM proj
    """,
)
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign random projection 64 → 16 dims (Achlioptas ±1 matrix,
    scaled 1/√64): the Johnson–Lindenstrauss preprocessing that shrinks
    vectors before LSH banding or brute-force rescoring.

    The sign matrix is a closed-form integer function of (in_dim,
    out_dim) — no RNG state to broadcast, any worker (or engine)
    regenerates it identically. Long form keeps the whole op in
    hash aggregates (partial+final; the ×16 fan-out happens after the
    scan, never re-reading input); the dense-matmul production twin is
    the Arrow/numpy kernel of q_knn_vectorized.
    """
    x = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("pos", "vf"))
        .select("vec_id", "pos", F.col("vf").cast("double").alias("v"))
    )
    expanded = x.select(
        "vec_id", "pos", "v",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("out_dim"),
    )
    signed = expanded.select(
        "vec_id", "out_dim",
        F.when(((F.col("pos") * 37 + F.col("out_dim") * 101) % 7) % 2 == 0,
               F.col("v")).otherwise(-F.col("v")).alias("sv"),
    )
    return (
        signed.groupBy("vec_id", "out_dim")
        .agg(F.round(F.sum("sv") / 8.0, 4).alias("y"))
    )


@query(
    "q_dedup_vectors",
    oracle="""
    WITH g AS (
      SELECT MIN(vec_id) AS keeper, COUNT(*) AS n
      FROM embeddings GROUP BY embedding
    )
    SELECT COUNT(*) AS n_unique_vectors,
           CAST(SUM(n - 1) AS BIGINT) AS n_exact_dupes,
           CAST(SUM(keeper) AS BIGINT) AS keeper_checksum
    FROM g
    """,
)
def q_dedup_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vector dedup: GROUP BY the embedding ARRAY itself —
    byte-identical float32 vectors collapse to one keeper (min vec_id).
    Proves the engine's complex-type grouping path (array columns as
    hash-aggregate keys, no serialization detour) — the cheapest dedup
    tier for embedding stores, run before any approximate near-dup. At
    100 TB, group instead by xxhash64 of the vector bytes first and
    verify within hash buckets (same two-tier shape as exact text
    dedup)."""
    e = load(spark, sf_dir, "embeddings")
    g = e.groupBy("embedding").agg(
        F.min("vec_id").alias("keeper"), F.count("*").alias("n")
    )
    return g.agg(
        F.count("*").alias("n_unique_vectors"),
        F.sum(F.col("n") - 1).cast("long").alias("n_exact_dupes"),
        F.sum("keeper").alias("keeper_checksum"),
    )


@query(
    "q_dedup_vectors_bucketed",
    oracle="""
    WITH g AS (
      SELECT MIN(vec_id) AS keeper, COUNT(*) AS n
      FROM embeddings GROUP BY embedding
    )
    SELECT COUNT(*) AS n_unique_vectors,
           CAST(SUM(n - 1) AS BIGINT) AS n_exact_dupes,
           CAST(SUM(keeper) AS BIGINT) AS keeper_checksum
    FROM g
    """,
)
def q_dedup_vectors_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-tier exact vector dedup — the 100 TB shape promised by
    q_dedup_vectors' docstring, now a first-class operator. Tier 1
    computes an 8-byte ``xxhash64(embedding)`` bucket; tier 2 groups by
    (bucket, embedding), so identical vectors collapse exactly and a
    hash COLLISION (two different vectors, same bucket) still yields
    two distinct groups — correctness never depends on the hash being
    injective. The aggregate comparator gets a cheap fast path: rows in
    different buckets short-circuit on the first 8 bytes instead of
    comparing 256-byte float arrays, and the sort/shuffle ordering keys
    lead with the long. Oracle is the direct group-by-vector SQL; a
    pytest case additionally pins bucket-tier ≡ direct-group row for
    row (tests/test_vector_compress.py)."""
    e = load(spark, sf_dir, "embeddings")
    bucketed = e.withColumn("bucket", F.xxhash64("embedding"))
    g = bucketed.groupBy("bucket", "embedding").agg(
        F.min("vec_id").alias("keeper"), F.count("*").alias("n")
    )
    return g.agg(
        F.count("*").alias("n_unique_vectors"),
        F.sum(F.col("n") - 1).cast("long").alias("n_exact_dupes"),
        F.sum("keeper").alias("keeper_checksum"),
    )
