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


_PQ_M = 8          # subspaces (64 dims -> 8 sub-vectors of 8 dims)
_PQ_SUBDIM = 8
_PQ_K = 16         # centroids per subspace
_PQ_PROBES = 5     # query vectors: vec_id < 5
_PQ_TOPK = 5

# Trained-artifact cache (VERDICT r5 task 6): q_knn_pq and q_knn_ivfpq
# share one training pipeline (int codes -> seeded codebook -> one Lloyd
# round -> final assignment), and sweeps/bench reps re-invoke each key
# several times. The artifacts are DETERMINISTIC functions of the
# fixture file, so they are trained once and parked as parquet keyed by
# (path, mtime, size) — any rewrite of the fixture retrains. Keyed on
# the file, not the SparkSession: parquet outlives sessions, and
# release_cached_blocks() between sweep queries would kill cached or
# locally-checkpointed plans but cannot touch these files.
_PQ_ARTIFACTS: dict[tuple, dict[str, str]] = {}


def _purge_pq_artifacts() -> None:
    """Remove every parked artifact dir (registered atexit below so
    repeated sweep/bench/gate processes don't grow /tmp unboundedly)."""
    import shutil

    for e in _PQ_ARTIFACTS.values():
        shutil.rmtree(e["dir"], ignore_errors=True)
    _PQ_ARTIFACTS.clear()


def _artifact_entry(sf_dir: str) -> dict:
    """The per-fixture artifact slot: {dir, codes?, cents?, pq?} keyed by
    (path, mtime, size); superseded entries' files are dropped."""
    import atexit
    import os
    import shutil
    import tempfile

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    key = (os.path.abspath(src), st.st_mtime_ns, st.st_size)
    stale = [k for k in _PQ_ARTIFACTS if k[0] == key[0] and k != key]
    for k in stale:
        shutil.rmtree(_PQ_ARTIFACTS.pop(k)["dir"], ignore_errors=True)
    if key not in _PQ_ARTIFACTS:
        if not _PQ_ARTIFACTS:
            atexit.register(_purge_pq_artifacts)
        _PQ_ARTIFACTS[key] = {"dir": tempfile.mkdtemp(prefix="pq_artifacts_")}
    return _PQ_ARTIFACTS[key]


def int_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 256-level min-max integer code table (q_embed_quantize's
    transform) as a per-fixture cached parquet — the shared substrate of
    the PQ/IVF-PQ index AND q_power_iteration's matvec rounds."""
    import os

    e = _artifact_entry(sf_dir)
    if "codes" not in e:
        x = (load(spark, sf_dir, "embeddings")
             .select("vec_id", F.posexplode("embedding").alias("pos", "vf"))
             .select("vec_id", "pos",
                     F.col("vf").cast("double").alias("v")))
        stats = x.groupBy("pos").agg(F.min("v").alias("mn"),
                                     F.max("v").alias("mx"))
        codes = (x.join(F.broadcast(stats), "pos")
                 .select("vec_id", "pos",
                         F.least(F.floor((F.col("v") - F.col("mn")) * 256
                                         / (F.col("mx") - F.col("mn"))),
                                 F.lit(255)).cast("long").alias("code")))
        path = os.path.join(e["dir"], "codes")
        codes.write.parquet(path)
        e["codes"] = path
    return spark.read.parquet(e["codes"])


def _pq_trained(spark: SparkSession, sf_dir: str):
    """Return (codes, cents, pq) DataFrames — the cached int codes, the
    Lloyd-refined per-subspace codebook, and the final PQ code
    assignment — training at most once per fixture file."""
    import os

    codes = int_codes(spark, sf_dir)
    e = _artifact_entry(sf_dir)
    if "pq" not in e:
        sub = codes.select(
            "vec_id",
            (F.col("pos") / _PQ_SUBDIM).cast("int").alias("m"),
            (F.col("pos") % _PQ_SUBDIM).alias("j"), "code")
        cents0 = (sub.filter(F.col("vec_id") < _PQ_K)
                  .select(F.col("vec_id").alias("cid"), "m", "j",
                          F.col("code").alias("ccode")))
        sqdiff = (F.col("code") - F.col("ccode")) ** 2
        # one integer-exact Lloyd round (seeded init, integer-div
        # recenter, empty clusters keep their seed)
        asg0_dist = (sub.join(F.broadcast(cents0), ["m", "j"])
                     .groupBy("vec_id", "m", "cid")
                     .agg(F.sum(sqdiff).cast("long").alias("d")))
        asg0 = (asg0_dist.groupBy("vec_id", "m")
                .agg(F.min(F.struct("d", "cid")).alias("best"))
                .select("vec_id", "m", F.col("best.cid").alias("cid")))
        upd = (asg0.join(sub, ["vec_id", "m"])
               .groupBy("m", "cid", "j")
               .agg(F.expr("sum(code) div count(*)").alias("ccode1")))
        # checkpoint: cents feeds the final assignment AND its own
        # parquet write — without it the Lloyd subtree evaluates twice
        cents = (cents0.join(upd, ["m", "cid", "j"], "left")
                 .select("cid", "m", "j",
                         F.coalesce("ccode1", "ccode").alias("ccode"))
                 .localCheckpoint())
        asg_dist = (sub.join(F.broadcast(cents), ["m", "j"])
                    .groupBy("vec_id", "m", "cid")
                    .agg(F.sum(sqdiff).cast("long").alias("d")))
        pq = (asg_dist.groupBy("vec_id", "m")
              .agg(F.min(F.struct("d", "cid")).alias("best"))
              .select("vec_id", "m", F.col("best.cid").alias("cid")))

        e["cents"] = os.path.join(e["dir"], "cents")
        e["pq"] = os.path.join(e["dir"], "pq")
        cents.coalesce(1).write.parquet(e["cents"])
        pq.write.parquet(e["pq"])
    return (codes,
            spark.read.parquet(e["cents"]),
            spark.read.parquet(e["pq"]))


@query(
    "q_knn_pq",
    oracle=f"""
    WITH x AS (
      SELECT vec_id, i.range AS pos,
             CAST(embedding[CAST(i.range AS INT) + 1] AS DOUBLE) AS v
      FROM embeddings, range(64) i
    ), stats AS (
      SELECT pos, MIN(v) AS mn, MAX(v) AS mx FROM x GROUP BY pos
    ), codes AS (
      SELECT x.vec_id, x.pos,
             CAST(LEAST(FLOOR((x.v - s.mn) * 256 / (s.mx - s.mn)), 255)
                  AS BIGINT) AS code
      FROM x JOIN stats s ON x.pos = s.pos
    ), cents0 AS (
      SELECT vec_id AS cid, pos // {_PQ_SUBDIM} AS m,
             pos % {_PQ_SUBDIM} AS j, code AS ccode
      FROM codes WHERE vec_id < {_PQ_K}
    ), sub AS (
      SELECT vec_id, pos // {_PQ_SUBDIM} AS m,
             pos % {_PQ_SUBDIM} AS j, code
      FROM codes
    ), asg0_dist AS (
      SELECT s.vec_id, s.m, c.cid,
             SUM((s.code - c.ccode) * (s.code - c.ccode)) AS d
      FROM sub s JOIN cents0 c ON s.m = c.m AND s.j = c.j
      GROUP BY 1, 2, 3
    ), asg0 AS (
      SELECT vec_id, m, cid FROM (
        SELECT vec_id, m, cid,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY d, cid) AS rn
        FROM asg0_dist) WHERE rn = 1
    ), upd AS (
      SELECT a.m, a.cid, s.j, SUM(s.code) // COUNT(*) AS ccode
      FROM asg0 a JOIN sub s ON s.vec_id = a.vec_id AND s.m = a.m
      GROUP BY 1, 2, 3
    ), cents AS (
      SELECT c0.cid, c0.m, c0.j,
             COALESCE(u.ccode, c0.ccode) AS ccode
      FROM cents0 c0 LEFT JOIN upd u
        ON u.m = c0.m AND u.cid = c0.cid AND u.j = c0.j
    ), asg_dist AS (
      SELECT s.vec_id, s.m, c.cid,
             SUM((s.code - c.ccode) * (s.code - c.ccode)) AS d
      FROM sub s JOIN cents c ON s.m = c.m AND s.j = c.j
      GROUP BY 1, 2, 3
    ), pq AS (
      SELECT vec_id, m, cid FROM (
        SELECT vec_id, m, cid,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY d, cid) AS rn
        FROM asg_dist) WHERE rn = 1
    ), dtab AS (
      SELECT s.vec_id AS probe_id, s.m, c.cid,
             SUM((s.code - c.ccode) * (s.code - c.ccode)) AS d
      FROM sub s JOIN cents c ON s.m = c.m AND s.j = c.j
      WHERE s.vec_id < {_PQ_PROBES}
      GROUP BY 1, 2, 3
    ), adc AS (
      SELECT t.probe_id, p.vec_id, SUM(t.d) AS pq_dist
      FROM pq p JOIN dtab t ON p.m = t.m AND p.cid = t.cid
      WHERE p.vec_id <> t.probe_id
      GROUP BY 1, 2
    )
    SELECT probe_id, vec_id, CAST(pq_dist AS BIGINT) AS pq_dist,
           CAST(rnk AS BIGINT) AS rank
    FROM (
      SELECT probe_id, vec_id, pq_dist,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY pq_dist, vec_id) AS rnk
      FROM adc) WHERE rnk <= {_PQ_TOPK}
    """,
)
def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (K3 ladder completion: brute-force →
    vectorized → IVF → sign-LSH → PQ): vectors are int8-quantized
    (q_embed_quantize's exact transform), split into 8 sub-vectors of 8
    dims, and each sub-vector is assigned its nearest of 16 per-subspace
    centroids — the PQ code is 8 small ints per vector, a 32× cut from
    the float embedding. Queries run ADC (asymmetric distance
    computation): a per-probe (subspace × centroid) distance TABLE is
    built once, and each corpus vector's approximate distance is just 8
    table lookups summed — never a touch of the original floats.

    Determinism discipline: the codebook is TRAINED deterministically —
    sampled init (sub-vectors of the first 16 vectors) plus one
    integer-exact Lloyd round (assign on the seeds, recenter at the
    integer-div mean, empty clusters keep their seed — the
    q_kmeans_quantized discipline, which the oracle unrolls); every
    distance is an integer sum of squared int8 diffs, every argmin ties
    on centroid id, top-k ties on vec_id — bit-exact cross-engine, no
    IEEE discipline needed. Recall is data-dependent: the synthetic
    near-random fixture is PQ's worst case (measured recall@5 pinned as
    a floor in tests); on real clustered embeddings the same plan's
    recall rises with the data's intrinsic dimension dropping.

    Scale: corpus work is linear (one assignment pass, one 8-rows-per-
    vector ADC join); the codebook (128 rows) and the ADC distance
    tables (probes × 8 × 16 rows) broadcast; top-k is per-probe
    partitioned. At 100 TB the PQ codes are the stored index (8 bytes a
    vector ≈ 800 GB for 10^11 vectors — memory-resident per executor
    fleet), exactly how IVF-PQ engines lay this out.
    """
    # training (codes -> seeded codebook -> Lloyd round -> assignment)
    # is shared with q_knn_ivfpq and cached per fixture file
    codes, cents, pq = _pq_trained(spark, sf_dir)
    sub = codes.select(
        "vec_id",
        (F.col("pos") / _PQ_SUBDIM).cast("int").alias("m"),
        (F.col("pos") % _PQ_SUBDIM).alias("j"), "code")
    sqdiff = (F.col("code") - F.col("ccode")) ** 2

    dtab = (sub.filter(F.col("vec_id") < _PQ_PROBES)
            .join(F.broadcast(cents), ["m", "j"])
            .groupBy(F.col("vec_id").alias("probe_id"), "m", "cid")
            .agg(F.sum(sqdiff).cast("long").alias("d")))
    adc = (pq.join(F.broadcast(dtab), ["m", "cid"])
           .filter(F.col("vec_id") != F.col("probe_id"))
           .groupBy("probe_id", "vec_id")
           .agg(F.sum("d").alias("pq_dist")))

    from pyspark.sql import Window
    w = Window.partitionBy("probe_id").orderBy("pq_dist", "vec_id")
    return (adc.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= _PQ_TOPK)
            .select("probe_id", "vec_id",
                    F.col("pq_dist").cast("long").alias("pq_dist"),
                    F.col("rank").cast("long").alias("rank")))


_IVFPQ_C = 8        # coarse cells (centroids = int-code vectors 16..23)
_IVFPQ_NPROBE = 2


@query(
    "q_knn_ivfpq",
    oracle=f"""
    WITH x AS (
      SELECT vec_id, i.range AS pos,
             CAST(embedding[CAST(i.range AS INT) + 1] AS DOUBLE) AS v
      FROM embeddings, range(64) i
    ), stats AS (
      SELECT pos, MIN(v) AS mn, MAX(v) AS mx FROM x GROUP BY pos
    ), codes AS (
      SELECT x.vec_id, x.pos,
             CAST(LEAST(FLOOR((x.v - s.mn) * 256 / (s.mx - s.mn)), 255)
                  AS BIGINT) AS code
      FROM x JOIN stats s ON x.pos = s.pos
    ), cents0 AS (
      SELECT vec_id AS cid, pos // {_PQ_SUBDIM} AS m,
             pos % {_PQ_SUBDIM} AS j, code AS ccode
      FROM codes WHERE vec_id < {_PQ_K}
    ), sub AS (
      SELECT vec_id, pos // {_PQ_SUBDIM} AS m,
             pos % {_PQ_SUBDIM} AS j, code
      FROM codes
    ), asg0_dist AS (
      SELECT s.vec_id, s.m, c.cid,
             SUM((s.code - c.ccode) * (s.code - c.ccode)) AS d
      FROM sub s JOIN cents0 c ON s.m = c.m AND s.j = c.j
      GROUP BY 1, 2, 3
    ), asg0 AS (
      SELECT vec_id, m, cid FROM (
        SELECT vec_id, m, cid,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY d, cid) AS rn
        FROM asg0_dist) WHERE rn = 1
    ), upd AS (
      SELECT a.m, a.cid, s.j, SUM(s.code) // COUNT(*) AS ccode
      FROM asg0 a JOIN sub s ON s.vec_id = a.vec_id AND s.m = a.m
      GROUP BY 1, 2, 3
    ), cents AS (
      SELECT c0.cid, c0.m, c0.j,
             COALESCE(u.ccode, c0.ccode) AS ccode
      FROM cents0 c0 LEFT JOIN upd u
        ON u.m = c0.m AND u.cid = c0.cid AND u.j = c0.j
    ), asg_dist AS (
      SELECT s.vec_id, s.m, c.cid,
             SUM((s.code - c.ccode) * (s.code - c.ccode)) AS d
      FROM sub s JOIN cents c ON s.m = c.m AND s.j = c.j
      GROUP BY 1, 2, 3
    ), pq AS (
      SELECT vec_id, m, cid FROM (
        SELECT vec_id, m, cid,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY d, cid) AS rn
        FROM asg_dist) WHERE rn = 1
    ), coarse AS (
      SELECT vec_id - {_PQ_K} AS ccid, pos, code AS kcode
      FROM codes
      WHERE vec_id >= {_PQ_K} AND vec_id < {_PQ_K} + {_IVFPQ_C}
    ), route_rn AS (
      SELECT vec_id, ccid,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY d, ccid) AS rn
      FROM (
        SELECT c.vec_id, k.ccid,
               SUM((c.code - k.kcode) * (c.code - k.kcode)) AS d
        FROM codes c JOIN coarse k ON c.pos = k.pos
        GROUP BY 1, 2)
    ), route AS (
      SELECT vec_id, ccid FROM route_rn WHERE rn = 1
    ), probe_cells AS (
      SELECT vec_id AS probe_id, ccid
      FROM route_rn
      WHERE vec_id < {_PQ_PROBES} AND rn <= {_IVFPQ_NPROBE}
    ), dtab AS (
      SELECT s.vec_id AS probe_id, s.m, c.cid,
             SUM((s.code - c.ccode) * (s.code - c.ccode)) AS d
      FROM sub s JOIN cents c ON s.m = c.m AND s.j = c.j
      WHERE s.vec_id < {_PQ_PROBES}
      GROUP BY 1, 2, 3
    ), cand AS (
      SELECT pc.probe_id, r.vec_id
      FROM probe_cells pc JOIN route r ON pc.ccid = r.ccid
      WHERE r.vec_id <> pc.probe_id
    ), adc AS (
      SELECT cd.probe_id, cd.vec_id, SUM(t.d) AS pq_dist
      FROM cand cd
      JOIN pq p ON p.vec_id = cd.vec_id
      JOIN dtab t ON t.probe_id = cd.probe_id
                 AND t.m = p.m AND t.cid = p.cid
      GROUP BY 1, 2
    )
    SELECT probe_id, vec_id, CAST(pq_dist AS BIGINT) AS pq_dist,
           CAST(rnk AS BIGINT) AS rank
    FROM (
      SELECT probe_id, vec_id, pq_dist,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY pq_dist, vec_id) AS rnk
      FROM adc) WHERE rnk <= {_PQ_TOPK}
    """,
)
def q_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the production ANN layout the PQ docstring promises,
    actually shipped: a coarse quantizer (8 cells, centroids = the
    integer-code vectors 16..23, disjoint from the PQ seeds) routes
    every vector to its nearest cell; queries probe their nprobe=2
    nearest cells and run ADC (the q_knn_pq trained codebook + distance
    tables) ONLY over vectors in those cells. Search cost drops from
    O(corpus) to O(corpus × nprobe / cells) — the pruning is test-
    asserted, as is ADC-distance agreement with the unpruned q_knn_pq
    on shared pairs.

    Everything stays integer (routing argmin, ADC sums, tie-breaks on
    ids) so the whole composed index hash-matches DuckDB. Scale: the
    route pass is one broadcast join + argmin over the corpus (linear,
    shuffle-free on the fact side); cells become partition keys at
    100 TB — probing nprobe cells reads nprobe/cells of the data, the
    partition-pruning story every IVF deployment relies on.
    """
    # training shared with q_knn_pq, cached per fixture file
    codes, cents, pq = _pq_trained(spark, sf_dir)
    sub = codes.select(
        "vec_id",
        (F.col("pos") / _PQ_SUBDIM).cast("int").alias("m"),
        (F.col("pos") % _PQ_SUBDIM).alias("j"), "code")
    sqdiff = (F.col("code") - F.col("ccode")) ** 2

    coarse = (codes.filter((F.col("vec_id") >= _PQ_K)
                           & (F.col("vec_id") < _PQ_K + _IVFPQ_C))
              .select((F.col("vec_id") - _PQ_K).alias("ccid"), "pos",
                      F.col("code").alias("kcode")))
    route_dist = (codes.join(F.broadcast(coarse), "pos")
                  .groupBy("vec_id", "ccid")
                  .agg(F.sum((F.col("code") - F.col("kcode")) ** 2)
                       .cast("long").alias("d")))
    from pyspark.sql import Window
    wr = Window.partitionBy("vec_id").orderBy("d", "ccid")
    route_rn = route_dist.withColumn("rn", F.row_number().over(wr))
    route = route_rn.filter(F.col("rn") == 1).select("vec_id", "ccid")
    probe_cells = (route_rn
                   .filter((F.col("vec_id") < _PQ_PROBES)
                           & (F.col("rn") <= _IVFPQ_NPROBE))
                   .select(F.col("vec_id").alias("probe_id"), "ccid"))

    dtab = (sub.filter(F.col("vec_id") < _PQ_PROBES)
            .join(F.broadcast(cents), ["m", "j"])
            .groupBy(F.col("vec_id").alias("probe_id"), "m", "cid")
            .agg(F.sum(sqdiff).cast("long").alias("d")))
    cand = (route.join(F.broadcast(probe_cells), "ccid")
            .filter(F.col("vec_id") != F.col("probe_id"))
            .select("probe_id", "vec_id"))
    adc = (cand.join(pq, "vec_id")
           .join(F.broadcast(dtab), ["probe_id", "m", "cid"])
           .groupBy("probe_id", "vec_id")
           .agg(F.sum("d").alias("pq_dist")))
    wk = Window.partitionBy("probe_id").orderBy("pq_dist", "vec_id")
    return (adc.withColumn("rank", F.row_number().over(wk))
            .filter(F.col("rank") <= _PQ_TOPK)
            .select("probe_id", "vec_id",
                    F.col("pq_dist").cast("long").alias("pq_dist"),
                    F.col("rank").cast("long").alias("rank")))
