"""Semantics tests for the embedding-compression operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from tests.conftest import SF_CHECK, SF_SMOKE


def _long_form(spark):
    return (
        load(spark, SF_SMOKE, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("pos", "vf"))
        .select("vec_id", "pos", F.col("vf").cast("double").alias("v"))
    )


def test_quantize_codes_in_range_and_reconstruction_bounded(spark, queries):
    codes = queries["q_embed_quantize"](spark, SF_SMOKE)
    emb = load(spark, SF_SMOKE, "embeddings")
    assert codes.count() == emb.count() * 64
    assert codes.filter((F.col("code") < 0) | (F.col("code") > 255)).count() == 0
    # dequantize with the same codebook: |x - x̂| <= cell width
    x = _long_form(spark)
    stats = x.groupBy("pos").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    joined = (codes.join(x, ["vec_id", "pos"]).join(stats, "pos")
              .withColumn("cell", (F.col("mx") - F.col("mn")) / 256)
              .withColumn("xhat",
                          F.col("mn") + (F.col("code") + 0.5) * F.col("cell")))
    bad = joined.filter(
        F.abs(F.col("v") - F.col("xhat")) > F.col("cell") * 0.5001)
    assert bad.count() == 0


def test_quantize_fact_side_never_shuffles(spark, queries):
    plan = (queries["q_embed_quantize"](spark, SF_SMOKE)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    # the only hash exchange feeds the 64-row codebook aggregate
    fact_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "vec_id" in ln
    ]
    assert fact_exchanges == []


def test_random_projection_preserves_norms_on_average(spark, queries):
    proj = queries["q_random_projection"](spark, SF_SMOKE)
    # JL with ±1/√64 entries and 16 output dims: E[‖y‖²] = ‖x‖²·(16/64).
    # Check the corpus-level ratio is within 20% of 0.25.
    py = (proj.groupBy("vec_id").agg(F.sum(F.col("y") * F.col("y")).alias("ny"))
          .agg(F.avg("ny")).collect()[0][0])
    x = _long_form(spark)
    px = (x.groupBy("vec_id").agg(F.sum(F.col("v") * F.col("v")).alias("nx"))
          .agg(F.avg("nx")).collect()[0][0])
    ratio = py / (px * 16.0 / 64.0)
    assert 0.8 < ratio < 1.2
    # exactly 16 output dims per vector
    shape = proj.groupBy("vec_id").count()
    assert shape.filter(F.col("count") != 16).count() == 0


def test_bucketed_vector_dedup_equals_direct_group(spark, queries):
    """Tier-1 hash bucketing must be a pure prefix: (bucket, embedding)
    grouping yields exactly the groups of GROUP BY embedding."""
    direct = queries["q_dedup_vectors"](spark, SF_SMOKE).collect()[0]
    tiered = queries["q_dedup_vectors_bucketed"](spark, SF_SMOKE).collect()[0]
    assert tiered.n_unique_vectors == direct.n_unique_vectors
    assert tiered.n_exact_dupes == direct.n_exact_dupes
    assert tiered.keeper_checksum == direct.keeper_checksum


def test_pq_structure_and_recall_floor(spark, queries):
    """q_knn_pq: per-probe ranks are contiguous 1..5 with non-decreasing
    integer distances and no self matches; ADC recall@5 against exact
    int-code L2 stays above the pinned floor (the synthetic near-random
    fixture is PQ's worst case — the floor documents it)."""
    from pyspark.sql import Window

    rows = queries["q_knn_pq"](spark, SF_SMOKE).collect()
    by_probe: dict[int, list] = {}
    for r in rows:
        assert r["probe_id"] != r["vec_id"]
        by_probe.setdefault(r["probe_id"], []).append(r)
    assert set(by_probe) == set(range(5))
    for ms in by_probe.values():
        ms.sort(key=lambda r: r["rank"])
        assert [m["rank"] for m in ms] == [1, 2, 3, 4, 5]
        dists = [m["pq_dist"] for m in ms]
        assert dists == sorted(dists)
        assert all(isinstance(d, int) and d >= 0 for d in dists)

    # exact top-5 on the same integer codes (ADC's ground truth space)
    x = (load(spark, SF_SMOKE, "embeddings")
         .select("vec_id", F.posexplode("embedding").alias("pos", "vf"))
         .select("vec_id", "pos", F.col("vf").cast("double").alias("v")))
    st = x.groupBy("pos").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
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
    exact = {(r["p"], r["vec_id"]) for r in
             d.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") <= 5).collect()}
    got = {(r["probe_id"], r["vec_id"]) for r in rows}
    assert len(got & exact) >= 4  # measured 6/25 with the trained codebook


def test_ivfpq_prunes_and_agrees_with_pq_on_shared_pairs(spark, queries):
    """IVF-PQ must (a) genuinely prune — every probe's candidate set is
    a strict subset of the corpus (nprobe=2 of 8 cells), (b) compute the
    IDENTICAL ADC distance as unpruned q_knn_pq wherever both report the
    same (probe, vec) pair, and (c) keep per-probe rank contiguity."""
    ivf = queries["q_knn_ivfpq"](spark, SF_SMOKE).collect()
    pq = {(r["probe_id"], r["vec_id"]): r["pq_dist"]
          for r in queries["q_knn_pq"](spark, SF_SMOKE).collect()}
    by_probe: dict[int, list] = {}
    for r in ivf:
        assert r["probe_id"] != r["vec_id"]
        by_probe.setdefault(r["probe_id"], []).append(r)
        key = (r["probe_id"], r["vec_id"])
        if key in pq:  # shared pair -> identical integer ADC distance
            assert pq[key] == r["pq_dist"], key
    assert set(by_probe) == set(range(5))
    for ms in by_probe.values():
        ms.sort(key=lambda r: r["rank"])
        assert [m["rank"] for m in ms] == list(range(1, len(ms) + 1))
        dists = [m["pq_dist"] for m in ms]
        assert dists == sorted(dists)
    # pruning evidence: each probe's top-k distances can only be >= the
    # unpruned top-k at the same rank (candidates are a subset)
    pq_ranked: dict[int, list] = {}
    for (p, _), d in sorted(pq.items(), key=lambda kv: kv[1]):
        pq_ranked.setdefault(p, []).append(d)
    for p, ms in by_probe.items():
        for i, m in enumerate(ms):
            if i < len(pq_ranked.get(p, [])):
                assert m["pq_dist"] >= pq_ranked[p][i]
    # recall floor (BASELINE.md round-5 ANN table): with nprobe=2/8 over
    # the worst-case near-random fixture, IVF-PQ still recovers a pinned
    # share of the UNPRUNED PQ rung's answers — the routing loss bound
    got = {(r["probe_id"], r["vec_id"]) for r in ivf}
    assert len(got & set(pq)) >= 5  # measured 9/25 (0.36) at SF_SMOKE


def test_ann_recall_on_clustered_embeddings(spark, queries, tmp_path):
    """VERDICT r5 task 4 — the ANN ladder on REALISTIC (clustered,
    anisotropic) embeddings, not just the i.i.d.-uniform worst case:
    tools/clustered_embeddings derives a deterministic per-label-centroid
    fixture; on it IVF's cell routing becomes near-lossless (matches the
    data's own cluster structure) while the PQ rungs stay bounded by the
    16-centroid-per-subspace codebook width (BASELINE.md round-6 table:
    widening K 16->256 lifts clustered recall ~4x, so the limit is code
    size, not indexing). Floors pin both behaviors."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.clustered_embeddings import derive

    sf = derive(SF_CHECK, str(tmp_path / "clustered"))

    def pairs(key, probe_col):
        return {(r[probe_col], r["vec_id"])
                for r in queries[key](spark, sf).collect()}

    exact = pairs("q_knn_bruteforce", "p_id")
    assert len(exact) == 50

    # clustered data routes cleanly: IVF (nprobe=2/8) loses (almost)
    # nothing, the vectorized exact rung stays perfect
    assert len(pairs("q_knn_vectorized", "p_id") & exact) == len(exact)
    ivf_recall = len(pairs("q_knn_ivf", "p_id") & exact) / len(exact)
    assert ivf_recall >= 0.8, ivf_recall  # measured 1.0

    # PQ rungs: the 4-bit/subspace codebook floor (measured 0.10); the
    # honest claim is "codebook-width-bound", not "clustered data fixes
    # PQ" — see BASELINE.md round-6 K-sensitivity rows
    pq_recall = len(pairs("q_knn_pq", "probe_id") & exact) / len(exact)
    assert pq_recall >= 0.04, pq_recall
