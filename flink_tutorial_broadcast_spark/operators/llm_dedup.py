"""Deduplication ladder (SURVEY.md §2.K1/K2; split from llm_ops.py in
round 5, keys and behavior unchanged): exact (md5 / xxhash64 /
distinct), shingle-Jaccard near-dup, MinHash+LSH, SimHash,
embedding-cosine + sign-LSH, sorted-neighborhood, containment,
incremental crawl-round dedup, and the portable (cross-engine
hash-identical) MinHash / sign-LSH / SimHash trio.

Scale rules shared by every op here: candidate generation is ALWAYS
banded/bucketed (LSH bands, SNM windows, shingle blocks) — pairwise
arithmetic only inside candidate sets, never all-pairs on the corpus.
"""
from __future__ import annotations

import hashlib
from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

from flink_tutorial_broadcast_spark.io import load, local_rows_df
from flink_tutorial_broadcast_spark.registry import query
from flink_tutorial_broadcast_spark.operators.llm_knn import (
    _cosine, _dot,
)


@query(
    "q_dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 exact dedup by content hash: one survivor (min doc_id) per
    distinct text. Hash-groupBy — the shuffle carries (hash → id) pairs
    only, never the documents themselves; at 100 TB this is the cheapest
    possible dedup pass."""
    return (
        load(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"),
             F.count("*").alias("n_copies"))
    )


@query(
    "q_dedup_exact_fast",
    oracle="""
    SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def q_dedup_exact_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 exact dedup, engine-path keying: xxhash64 (8-byte long) instead
    of md5 (hex string) — measured 2.5× faster at 10M rows (tools/stress
    .py) because the shuffle carries longs and the hash is one pass. The
    oracle groups by md5; both hashes are injective on the corpus, so the
    (survivor, multiplicity) output is identical and fully hash-checked —
    the engine-specific key just stays out of the result."""
    return (
        load(spark, sf_dir, "documents")
        .groupBy(F.xxhash64("text"))
        .agg(F.min("doc_id").alias("keep_doc_id"),
             F.count("*").alias("n_copies"))
        .select("keep_doc_id", "n_copies")
    )


@query(
    "q_distinct",
    oracle="SELECT DISTINCT lang, source FROM documents",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/D3 dropDuplicates on a column subset."""
    return load(spark, sf_dir, "documents").select("lang", "source").distinct()


# --- near dedup (shingle jaccard — oracle-checked candidate formulation) ----

_NEAR_DUP_LIMIT = 200  # bounded candidate subset for the oracle-checked form


def _bigrams(col):
    """Adjacent-token bigram shingles of a space-tokenized text column."""
    toks = F.split(col, " ")
    idx = F.sequence(F.lit(1), F.size(toks) - 1)
    return F.transform(
        idx, lambda i: F.concat_ws("_", F.element_at(toks, i),
                                   F.element_at(toks, i + 1)))


@query(
    "q_dedup_near",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < {_NEAR_DUP_LIMIT}
    ), shingled AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(toks)),
                           i -> toks[i] || '_' || toks[i + 1])) AS shingles
      FROM docs
    ), exploded AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM shingled
    ), sizes AS (
      SELECT doc_id, len(shingles) AS n_shingles FROM shingled
    ), common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM exploded a JOIN exploded b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(CAST(c.n_common AS DOUBLE)
                 / (sa.n_shingles + sb.n_shingles - c.n_common), 6)
               AS jaccard
    FROM common c
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
    WHERE CAST(c.n_common AS DOUBLE)
          / (sa.n_shingles + sb.n_shingles - c.n_common) >= 0.5
    """,
)
def q_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 near-dup: bigram-shingle Jaccard ≥ 0.5 over a bounded candidate
    subset (the oracle-checkable formulation; candidate generation via
    shared-shingle join). The unbounded-corpus path is q_dedup_minhash."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _NEAR_DUP_LIMIT)
        .select("doc_id",
                F.array_distinct(_bigrams(F.col("text"))).alias("shingles"))
        # materialize the bounded subset once: the shingle transform is
        # referenced by four subplans (both join sides + both size dims)
        # and otherwise re-evaluates per branch, with the lambda expr
        # additionally copied into each branch's filter
        .localCheckpoint()
    )
    sizes = docs.select("doc_id", F.size("shingles").alias("n_shingles"))
    expl = docs.select("doc_id", F.explode("shingles").alias("shingle"))
    a = expl.alias("a")
    b = expl.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (F.col("n_common").cast("double")
           / (F.col("sa.n_shingles") + F.col("sb.n_shingles")
              - F.col("n_common")))
    return (
        common
        .join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# --- MinHash + LSH (the 100 TB near-dup path; rows-only) --------------------

_N_HASHES = 16
_N_BANDS = 4  # 4 rows per band


def _recall_cols(exact_pairs: DataFrame, got_pairs: DataFrame,
                 floor: float) -> DataFrame:
    """ONE-row (recall_vs_exact, recall_ok) frame for the rows-only
    LSH keys (r12, VERDICT_r11 item 6): recall of the candidate set
    over an exact pair set that is itself banded/bounded (never
    all-pairs), broadcast-appended onto every output row so the
    driver's rows-only pass witnesses the documented floor in-engine.
    An empty exact set passes vacuously (recall_ok true)."""
    hit = got_pairs.withColumn("__hit", F.lit(1))
    cols = list(exact_pairs.columns)
    rec = (F.col("__h").cast("double")
           / F.greatest(F.col("__n"), F.lit(1)).cast("double"))
    return (exact_pairs.join(hit, cols, "left")
            .agg(F.count(F.lit(1)).alias("__n"),
                 F.coalesce(F.sum("__hit"), F.lit(0)).alias("__h"))
            .select(F.round(rec, 4).alias("recall_vs_exact"),
                    ((F.col("__n") == 0) | (rec >= floor))
                    .alias("recall_ok")))


@query("q_dedup_minhash")  # rows-only: xxhash64 signatures are Spark-internal
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 MinHash+LSH near-dup at corpus scale.

    shingle → 16 minhashes (xxhash64 with per-hash salt) → 4 bands of 4 →
    band-bucket equi-join generates candidates (linear-ish in corpus size),
    exact shingle-Jaccard verifies them. Output: verified pairs ≥ 0.5.
    Rows-only check (hash-dependent candidate set). Since round 12 the
    pytest recall floor (≥ 0.6 vs q_dedup_near's exact pair set over
    the oracle-bounded subset) is WITNESSED in-engine: every row
    carries (recall_vs_exact, recall_ok) computed from the same banded
    exact join — never all-pairs.
    """
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id",
                F.array_distinct(_bigrams(F.col("text"))).alias("shingles"))
    )
    expl = docs.select("doc_id", F.explode("shingles").alias("shingle"))

    # 16 minhashes per doc: min over shingles of xxhash64(salt || shingle)
    seeds = spark.range(_N_HASHES).select(F.col("id").alias("seed"))
    sig = (
        expl.crossJoin(F.broadcast(seeds))
        .groupBy("doc_id", "seed")
        .agg(F.min(F.xxhash64(F.concat_ws("#", F.col("seed"), "shingle")))
             .alias("minhash"))
    )
    # bands: hash 4 consecutive minhashes together
    bands = (
        sig.withColumn("band", (F.col("seed") / (_N_HASHES // _N_BANDS))
                       .cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.xxhash64(F.concat_ws(",", F.sort_array(
            F.collect_list(F.concat_ws(":", "seed", "minhash")))))
             .alias("band_hash"))
    )
    l, r = bands.alias("l"), bands.alias("r")
    candidates = (
        l.join(r, (F.col("l.band") == F.col("r.band"))
               & (F.col("l.band_hash") == F.col("r.band_hash"))
               & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("doc_a"),
                F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact-Jaccard verification of the candidate pairs only
    da = docs.select(F.col("doc_id").alias("doc_a"),
                     F.col("shingles").alias("sh_a"))
    db = docs.select(F.col("doc_id").alias("doc_b"),
                     F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    verified = (
        candidates.join(da, "doc_a").join(db, "doc_b")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )
    exact = q_dedup_near(spark, sf_dir).select("doc_a", "doc_b")
    got = verified.filter(
        (F.col("doc_a") < _NEAR_DUP_LIMIT)
        & (F.col("doc_b") < _NEAR_DUP_LIMIT)).select("doc_a", "doc_b")
    return verified.crossJoin(
        F.broadcast(_recall_cols(exact, got, 0.6)))


@query("q_simhash")  # rows-only: engine-side 64-bit fingerprints
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 SimHash 64-bit fingerprints via Arrow-batched pandas UDF
    (md5-derived per-token hashes → bitwise majority vote), deterministic
    across runs. Near-dup = small Hamming distance (tests assert the
    dup pairs from q_dedup_near collide within distance 8)."""
    @pandas_udf("long")
    def simhash64(texts: pd.Series) -> pd.Series:
        def one(text: str) -> int:
            acc = [0] * 64
            for tok in text.split(" "):
                h = int.from_bytes(
                    hashlib.md5(tok.encode()).digest()[:8], "big")
                for i in range(64):
                    acc[i] += 1 if (h >> i) & 1 else -1
            v = 0
            for i in range(64):
                if acc[i] > 0:
                    v |= 1 << i
            # fold to signed 64-bit for LongType
            return v - (1 << 64) if v >= (1 << 63) else v
        return texts.map(one)

    fp = (
        load(spark, sf_dir, "documents")
        .select("doc_id", simhash64("text").alias("simhash"))
    )
    # r12 bound witness: a healthy majority vote never yields the
    # degenerate all-zeros/all-ones fingerprint on real text (those
    # would collide EVERY pair in q_dedup_simhash's banding)
    pc = F.bit_count(F.col("simhash"))
    return fp.withColumn("fp_nondegenerate", (pc > 0) & (pc < 64))


_HAMMING_MAX = 8  # near-dup iff fingerprints differ in <= 8 of 64 bits


@query("q_dedup_simhash")  # rows-only: fingerprint-derived candidate set
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 SimHash near-dup END-TO-END: fingerprint → band the 64 bits
    into 8×8-bit pieces → bucket-join on any equal band → exact
    Hamming ≤ 8 verifies via bit_count(XOR). Band sizing is the recall
    dial: for 8 flipped bits spread over 8 bands, P(≥1 clean band) ≈
    1-(1-(56/64)^8)^8 ≈ 0.96 (4×16 bands measured only ~0.47 — pinned by
    the recall test). All-JVM: banding is shiftright/mask, verification
    is one codegen'd popcount — no per-pair Python."""
    sh = q_simhash(spark, sf_dir)  # (doc_id, simhash)
    bands = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     (F.shiftright("simhash", i * 8)
                      .bitwiseAND(F.lit(0xFF))).alias("band_val"))
            for i in range(8)])).alias("bb"))\
        .select("doc_id", "simhash", "bb.band", "bb.band_val")
    l, r = bands.alias("l"), bands.alias("r")
    candidates = (
        l.join(r, (F.col("l.band") == F.col("r.band"))
               & (F.col("l.band_val") == F.col("r.band_val"))
               & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("doc_a"),
                F.col("l.simhash").alias("sh_a"),
                F.col("r.doc_id").alias("doc_b"),
                F.col("r.simhash").alias("sh_b"))
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        candidates.filter(hamming <= _HAMMING_MAX)
        .select("doc_a", "doc_b", hamming.alias("hamming"),
                # r12 bound witness: the documented <=8 near-dup bound
                # as an explicit column (the recall floor vs the
                # all-pairs ground truth stays a TEST property — the
                # banded discipline forbids all-pairs in-engine)
                (hamming <= _HAMMING_MAX).alias("within_hamming_bound"))
    )


_EMBED_DUP_LIMIT = 500   # bounded subset for the oracle-checked all-pairs form
_EMBED_DUP_THRESHOLD = 0.35  # calibrated to fixtures (random vecs ⇒ cos ≲ 0.6)


@query(
    "q_dedup_embed",
    oracle=f"""
    WITH dbl AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings WHERE vec_id < {_EMBED_DUP_LIMIT}
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_dot_product(a.emb, b.emb)
                 / (sqrt(list_dot_product(a.emb, a.emb))
                    * sqrt(list_dot_product(b.emb, b.emb))), 6) AS cos_sim
    FROM dbl a JOIN dbl b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.emb, b.emb)
          / (sqrt(list_dot_product(a.emb, a.emb))
             * sqrt(list_dot_product(b.emb, b.emb)))
          >= {_EMBED_DUP_THRESHOLD}
    """,
)
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 embedding-cosine near-dup: all pairs with cosine ≥ threshold over
    a bounded candidate subset (the oracle-checkable exact formulation).
    The unbounded-corpus path is q_dedup_embed_lsh (hyperplane banding),
    which verifies its candidates against this same exact predicate."""
    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _EMBED_DUP_LIMIT)
        # norms hoisted out of the pair loop: per PAIR only the cross
        # dot-product folds; ‖a‖/‖b‖ are computed once per VECTOR here
        # (O(n) folds instead of O(n²)) — same sqrt(dot)·sqrt(dot)
        # operation order as the oracle, so doubles stay identical
        .select("vec_id", "embedding",
                F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                .alias("norm"))
    )
    # the filtered subset collapses to ONE input split; a broadcast
    # nested-loop join parallelizes by its PROBE side, so spread the
    # probe rows across the cluster before the O(n²) fold work
    # (2.2× here; per-pair arithmetic unchanged → still bit-identical)
    a = emb.repartition(32).select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"))
    b = emb.select(F.col("vec_id").alias("vec_b"),
                   F.col("embedding").alias("emb_b"),
                   F.col("norm").alias("norm_b"))
    cos = (_dot(F.col("emb_a"), F.col("emb_b"))
           / (F.col("norm_a") * F.col("norm_b")))
    return (
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .filter(cos >= _EMBED_DUP_THRESHOLD)
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos_sim"))
    )


_N_PLANES = 16   # sign bits per vector
_N_SIGN_BANDS = 4  # 4 bits per band → candidates share ≥1 of 4 nibbles


@query("q_dedup_embed_lsh")  # rows-only: candidate set is recall<1 by design
def q_dedup_embed_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 embedding near-dup at corpus scale: random-hyperplane sign-LSH.

    hyperplanes = the first 16 corpus vectors (deterministic, no RNG) →
    16 sign bits per vector → 4 bands of 4 bits → band-bucket equi-join
    generates candidates (linear-ish in corpus size for fixed bands) →
    exact cosine ≥ threshold verifies. Precision 1 vs q_dedup_embed by
    construction; since round 12 the pytest recall floor (≥ 0.3 vs the
    exact bounded cosine pair set) is WITNESSED in-engine as
    (recall_vs_exact, recall_ok) columns on every row.
    """
    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _EMBED_DUP_LIMIT)
        .select("vec_id", "embedding")
    )
    planes = (
        emb.filter(F.col("vec_id") < _N_PLANES)
        .select(F.col("vec_id").alias("plane_id"),
                F.col("embedding").alias("plane"))
    )
    # sign bit per (vector, hyperplane); band value = 4 consecutive bits
    bits = (
        emb.crossJoin(F.broadcast(planes))
        .select("vec_id", "plane_id",
                (_dot(F.col("embedding"), F.col("plane")) >= 0)
                .cast("int").alias("bit"))
    )
    bands = (
        bits.withColumn("band", (F.col("plane_id")
                                 / (_N_PLANES // _N_SIGN_BANDS)).cast("int"))
        .groupBy("vec_id", "band")
        .agg(F.sum(F.col("bit")
                   * F.pow(F.lit(2), F.col("plane_id") % 4).cast("long"))
             .alias("band_val"))
    )
    l, r = bands.alias("l"), bands.alias("r")
    candidates = (
        l.join(r, (F.col("l.band") == F.col("r.band"))
               & (F.col("l.band_val") == F.col("r.band_val"))
               & (F.col("l.vec_id") < F.col("r.vec_id")))
        .select(F.col("l.vec_id").alias("vec_a"),
                F.col("r.vec_id").alias("vec_b"))
        .distinct()
    )
    da = emb.select(F.col("vec_id").alias("vec_a"),
                    F.col("embedding").alias("emb_a"))
    db = emb.select(F.col("vec_id").alias("vec_b"),
                    F.col("embedding").alias("emb_b"))
    cos = _cosine(F.col("emb_a"), F.col("emb_b"))
    verified = (
        candidates.join(da, "vec_a").join(db, "vec_b")
        .filter(cos >= _EMBED_DUP_THRESHOLD)
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos_sim"))
    )
    exact = q_dedup_embed(spark, sf_dir).select("vec_a", "vec_b")
    return verified.crossJoin(F.broadcast(_recall_cols(
        exact, verified.select("vec_a", "vec_b"), 0.3)))


# --- text analysis (K4) -----------------------------------------------------


@query(
    "q_dedup_snm",
    oracle="""
    WITH sorted_parts AS (
      SELECT p_partkey, p_name,
             row_number() OVER (ORDER BY p_name, p_partkey) AS rn
      FROM part
    ), pairs AS (
      SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
             levenshtein(a.p_name, b.p_name) AS dist
      FROM sorted_parts a JOIN sorted_parts b
        ON b.rn BETWEEN a.rn + 1 AND a.rn + 2
    )
    SELECT key_a, key_b, dist FROM pairs WHERE dist <= 3
    """,
)
def q_dedup_snm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-Neighborhood dedup (SNM): sort records by a blocking key,
    compare each record only to its w=2 successors, keep pairs within
    edit distance 3. The third classic near-dup family next to LSH
    (probabilistic) and blocked all-pairs (q_edit_distance): O(n·w)
    comparisons after one sort instead of O(n²) — at 100 TB the sort is
    a repartitionByRange and each window stays partition-local (overlap
    handled by a boundary-rows exchange of 2·w rows per partition).

    Implementation note: the naive rank self-join (rn BETWEEN rn+1 AND
    rn+2) plans as a nested loop — O(n²) pairs, measured 270 s at sf0.1.
    The O(n·w) form takes the w successors as lead() columns over the
    sort and explodes them into the pair relation: zero joins, 2n
    comparisons (0.3 s at sf0.1).

    The sort itself is EXECUTED two-phase (no single-partition
    WindowExec, CI-guarded in plans/audit.py): the first character of
    the blocking key is a deterministic, sort-prefix-preserving bucket
    (ordering by (bucket, name) ≡ ordering by name), the lead() window
    is bucket-PARTITIONED, and the w-row bucket boundaries are a
    BOUNDED set (≤2·w rows per bucket, alphabet-capped bucket count)
    collected to the driver — same bounded-collect pattern as the kNN
    probe dim — where the cross-bucket successor pairs are rebuilt. At
    100 TB widen the prefix (or sample explicit range boundaries) so
    each bucket fits a partition."""
    wid = 2  # SNM window: compare each record to its 2 successors
    sp = (load(spark, sf_dir, "part")
          .select("p_partkey", "p_name")
          .withColumn("b", F.substring("p_name", 1, 1)))
    wloc = Window.partitionBy("b").orderBy("p_name", "p_partkey")
    with_next = sp.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.array(*[
            F.struct(
                F.lead("p_partkey", i).over(wloc).alias("key_b"),
                F.lead("p_name", i).over(wloc).alias("name_b"),
            ) for i in range(1, wid + 1)
        ]).alias("succ"),
    )
    within = (
        with_next.select("key_a", "name_a", F.explode("succ").alias("s"))
        .filter(F.col("s.key_b").isNotNull())
        .select(
            "key_a",
            F.col("s.key_b").alias("key_b"),
            F.levenshtein(F.col("name_a"), F.col("s.name_b")).alias("dist"),
        )
    )
    # Bucket-boundary rows: first/last `wid` of each bucket. Their global
    # successors at distance ≤ wid are exactly their successors WITHIN
    # this bounded set, so the cross-bucket pairs rebuild exactly.
    wdesc = Window.partitionBy("b").orderBy(
        F.desc("p_name"), F.desc("p_partkey"))
    edge_rows = (
        sp.withColumn("ra", F.row_number().over(wloc))
        .withColumn("rd", F.row_number().over(wdesc))
        .filter((F.col("ra") <= wid) | (F.col("rd") <= wid))
        .select("p_partkey", "p_name", "b")
        .collect()  # bounded: ≤ 2·wid rows per bucket, ≤256 buckets
    )
    edge_rows.sort(key=lambda r: (r["p_name"], r["p_partkey"]))
    cross = [
        (a["p_partkey"], a["p_name"],
         edge_rows[j]["p_partkey"], edge_rows[j]["p_name"])
        for i, a in enumerate(edge_rows)
        for j in range(i + 1, min(i + 1 + wid, len(edge_rows)))
        if edge_rows[j]["b"] != a["b"]
    ]
    cross_df = local_rows_df(
        spark, cross, "key_a long, name_a string, key_b long, name_b string"
    ).select(
        "key_a", "key_b",
        F.levenshtein("name_a", "name_b").alias("dist"),
    )
    return within.unionAll(cross_df).filter(F.col("dist") <= 3)


@query(
    "q_dedup_containment",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < {_NEAR_DUP_LIMIT}
    ), shingled AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(toks)),
                           i -> toks[i] || '_' || toks[i + 1])) AS sh
      FROM docs
    ), exploded AS (
      SELECT doc_id, unnest(sh) AS shingle FROM shingled
    ), sizes AS (
      SELECT doc_id, len(sh) AS n FROM shingled
    ), common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM exploded a JOIN exploded b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b,
           CASE WHEN sa.n <= sb.n THEN c.doc_a ELSE c.doc_b END
             AS contained_doc,
           (1000000 * c.i) // LEAST(sa.n, sb.n) AS containment_ppm
    FROM common c
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
    WHERE 10 * c.i >= 9 * LEAST(sa.n, sb.n)
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment (asymmetric near-dup) detection: flag pairs where the
    SMALLER document's shingle set is ≥90 % inside the larger one's —
    the quoted-reply / subset-document / boilerplate-wrapper case that
    symmetric Jaccard misses entirely (a 40-word doc fully quoted inside
    a 400-word doc has Jaccard ≈ 0.1 but containment 1.0). Same bounded
    candidate generation as q_dedup_near (shared-shingle join), but the
    verify divides the intersection by min(|A|,|B|); threshold and ppm
    are integer-exact so the oracle hash-matches. The unbounded-corpus
    path reuses the MinHash band index with the containment estimator —
    same candidate stream, different verifier."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _NEAR_DUP_LIMIT)
        .select("doc_id",
                F.array_distinct(_bigrams(F.col("text"))).alias("sh"))
        .localCheckpoint()
    )
    sizes = docs.select("doc_id", F.size("sh").alias("n"))
    expl = docs.select("doc_id", F.explode("sh").alias("shingle"))
    a, b = expl.alias("a"), expl.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    mn = F.least(F.col("sa.n"), F.col("sb.n"))
    return (
        common
        .join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(F.col("i") * 10 >= mn * 9)
        .select(
            "doc_a", "doc_b",
            F.when(F.col("sa.n") <= F.col("sb.n"), F.col("doc_a"))
            .otherwise(F.col("doc_b")).alias("contained_doc"),
            F.expr("(1000000 * i) div least(sa.n, sb.n)")
            .alias("containment_ppm"),
        )
    )


_INCR_CORPUS_LIMIT = 400   # existing corpus tier (bounded oracle twin)
_INCR_BATCH_LIMIT = 500    # batch = [400, 500): the new crawl round


@query(
    "q_dedup_incremental",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < {_INCR_CORPUS_LIMIT}
    ),
    batch AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id >= {_INCR_CORPUS_LIMIT} AND doc_id < {_INCR_BATCH_LIMIT}
    ),
    exact AS (
      SELECT b.doc_id AS batch_doc, MIN(c.doc_id) AS matched_doc
      FROM batch b JOIN corpus c ON md5(b.text) = md5(c.text)
      GROUP BY 1
    ),
    bsh AS (
      SELECT doc_id, list_distinct(list_transform(
               range(1, len(string_split(text, ' '))),
               i -> string_split(text, ' ')[i] || '_'
                    || string_split(text, ' ')[i + 1])) AS sh
      FROM batch WHERE doc_id NOT IN (SELECT batch_doc FROM exact)
    ),
    csh AS (
      SELECT doc_id, list_distinct(list_transform(
               range(1, len(string_split(text, ' '))),
               i -> string_split(text, ' ')[i] || '_'
                    || string_split(text, ' ')[i + 1])) AS sh
      FROM corpus
    ),
    be AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM bsh),
    ce AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM csh),
    common AS (
      SELECT be.doc_id AS batch_doc, ce.doc_id AS matched_doc,
             MAX(be.n) AS nb, MAX(ce.n) AS nc, COUNT(*) AS n_common
      FROM be JOIN ce ON be.s = ce.s
      GROUP BY 1, 2
    ),
    near AS (
      SELECT batch_doc, matched_doc,
             CAST(n_common AS DOUBLE) / (nb + nc - n_common) AS jac,
             row_number() OVER (
               PARTITION BY batch_doc
               ORDER BY CAST(n_common AS DOUBLE) / (nb + nc - n_common)
                 DESC, matched_doc) AS rn
      FROM common
      WHERE CAST(n_common AS DOUBLE) / (nb + nc - n_common) >= 0.5
    )
    SELECT batch_doc, 'exact_dup' AS verdict, matched_doc,
           CAST(NULL AS DOUBLE) AS jaccard
    FROM exact
    UNION ALL
    SELECT batch_doc, 'near_dup' AS verdict, matched_doc,
           ROUND(jac, 6) AS jaccard
    FROM near WHERE rn = 1
    UNION ALL
    SELECT b.doc_id AS batch_doc, 'new' AS verdict,
           CAST(NULL AS BIGINT) AS matched_doc, CAST(NULL AS DOUBLE) AS jaccard
    FROM batch b
    WHERE b.doc_id NOT IN (SELECT batch_doc FROM exact)
      AND b.doc_id NOT IN (SELECT batch_doc FROM near WHERE rn = 1)
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 INCREMENTAL dedup — the crawl-round shape: a new batch is
    deduplicated AGAINST the existing corpus without re-deduplicating
    the corpus itself. Tier 1 drops exact duplicates by content hash
    (batch ⋈ corpus on md5(text), a broadcast-able hash join — the
    corpus side would be a bucketed hash index at 100 TB). Tier 2 runs
    shingle-Jaccard ONLY on surviving batch docs × corpus (new×old
    pairs — never old×old, which is the entire point: corpus pairs were
    settled in previous rounds), keeping each batch doc's best corpus
    match (jaccard DESC, doc ASC). Verdicts: exact_dup / near_dup / new,
    with the matched corpus doc for dups. Bounded oracle twin like
    q_dedup_near; the unbounded path swaps tier 2's candidate join for
    the MinHash band-bucket join with the SAME new×old restriction."""
    docs = load(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < _INCR_CORPUS_LIMIT)
    batch = docs.filter((F.col("doc_id") >= _INCR_CORPUS_LIMIT)
                        & (F.col("doc_id") < _INCR_BATCH_LIMIT))

    exact = (
        batch.select(F.col("doc_id").alias("batch_doc"),
                     F.md5("text").alias("h"))
        .join(corpus.select(F.col("doc_id").alias("c_doc"),
                            F.md5("text").alias("h")), "h")
        .groupBy("batch_doc").agg(F.min("c_doc").alias("matched_doc"))
        .localCheckpoint(eager=False)  # reused by tiers 2 and 3
    )

    def shingled(df, out):
        return df.select(
            F.col("doc_id").alias(out),
            F.array_distinct(_bigrams(F.col("text"))).alias("sh"))

    bsh = (
        shingled(batch, "batch_doc")
        .join(exact.select("batch_doc"), "batch_doc", "left_anti")
        .localCheckpoint(eager=False)  # both explode side and size dim
    )
    csh = shingled(corpus, "matched_doc").localCheckpoint(eager=False)
    be = bsh.select("batch_doc", F.size("sh").alias("nb"),
                    F.explode("sh").alias("s"))
    ce = csh.select("matched_doc", F.size("sh").alias("nc"),
                    F.explode("sh").alias("s"))
    common = (
        be.join(ce, "s")
        .groupBy("batch_doc", "matched_doc")
        .agg(F.max("nb").alias("nb"), F.max("nc").alias("nc"),
             F.count("*").alias("n_common"))
    )
    jac = (F.col("n_common").cast("double")
           / (F.col("nb") + F.col("nc") - F.col("n_common")))
    near = (
        common.withColumn("jac", jac)
        .filter(F.col("jac") >= 0.5)
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("batch_doc")
            .orderBy(F.col("jac").desc(), "matched_doc")))
        .filter(F.col("rn") == 1)
        .select("batch_doc", "matched_doc", "jac")
        .localCheckpoint(eager=False)  # reused by tier 3's anti-join
    )
    new_docs = (
        batch.select(F.col("doc_id").alias("batch_doc"))
        .join(exact.select("batch_doc"), "batch_doc", "left_anti")
        .join(near.select("batch_doc"), "batch_doc", "left_anti")
    )
    return (
        exact.select("batch_doc", F.lit("exact_dup").alias("verdict"),
                     "matched_doc", F.lit(None).cast("double").alias("jaccard"))
        .unionByName(near.select(
            "batch_doc", F.lit("near_dup").alias("verdict"), "matched_doc",
            F.round("jac", 6).alias("jaccard")))
        .unionByName(new_docs.select(
            "batch_doc", F.lit("new").alias("verdict"),
            F.lit(None).cast("long").alias("matched_doc"),
            F.lit(None).cast("double").alias("jaccard")))
    )



_MH_N, _MH_BANDS, _MH_R = 16, 4, 4  # 16 portable hashes, 4 bands of 4

_MH_SIG_SQL = ",\n             ".join(
    f"list_min(list_transform(sh, s -> ('0x' || substr(md5('{i}|' || s),"
    f" 1, 12))::BIGINT)) AS h{i}"
    for i in range(_MH_N))
_MH_BAND_SQL = ",\n        ".join(
    "{" + f"'band': {b}, 'k1': h{b*_MH_R}, 'k2': h{b*_MH_R+1}, "
    f"'k3': h{b*_MH_R+2}, 'k4': h{b*_MH_R+3}" + "}"
    for b in range(_MH_BANDS))


@query(
    "q_dedup_minhash_portable",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, len(string_split(text, ' '))),
               i -> string_split(text, ' ')[i] || '_'
                    || string_split(text, ' ')[i + 1])) AS sh
      FROM documents WHERE doc_id < {_NEAR_DUP_LIMIT}
    ),
    sigs AS (
      SELECT doc_id, sh,
             {_MH_SIG_SQL}
      FROM docs
    ),
    bands AS (
      SELECT doc_id, unnest([
        {_MH_BAND_SQL}
      ]) AS b
      FROM sigs
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
      FROM bands a JOIN bands c
        ON a.b = c.b AND a.doc_id < c.doc_id
    )
    SELECT p.doc_a, p.doc_b,
           ROUND(CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
                 / (len(da.sh) + len(db.sh)
                    - len(list_intersect(da.sh, db.sh))), 6) AS jaccard
    FROM cand p
    JOIN docs da ON da.doc_id = p.doc_a
    JOIN docs db ON db.doc_id = p.doc_b
    WHERE CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
          / (len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh)))
          >= 0.5
    """,
)
def q_dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding with FULL oracle backing — the 100 TB
    near-dup path promoted from rows-only to exact hash-match: the
    portable 48-bit md5-prefix hash (same family as q_cms_frequency)
    makes both engines compute IDENTICAL 16-hash signatures, band them
    identically (4 bands × 4 rows, banded as 4-tuple join keys — no
    band-digest string to diverge), generate identical candidate pairs,
    and verify identical shingle-Jaccard ≥ 0.5. Signature computation is
    map-side (array_min over a transform — no shuffle); candidates come
    from ONE band-key self-join; only candidate pairs ever pay the exact
    intersection. q_dedup_minhash (xxhash64) remains the faster-hash
    engine path; THIS key proves the algorithm end to end against an
    independent engine. Bounded oracle twin like q_dedup_near."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _NEAR_DUP_LIMIT)
        .select("doc_id",
                F.array_distinct(_bigrams(F.col("text"))).alias("sh"))
        .localCheckpoint(eager=False)  # bands + two verify sides
    )

    def mh(i):
        return F.array_min(F.transform(
            F.col("sh"),
            lambda s, i=i: F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{i}|"), s)), 1, 12),
                16, 10).cast("long")))

    sigs = docs.withColumn("sig", F.array(*[mh(i) for i in range(_MH_N)]))
    bands = sigs.select("doc_id", F.explode(F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.col("sig")[b * _MH_R].alias("k1"),
            F.col("sig")[b * _MH_R + 1].alias("k2"),
            F.col("sig")[b * _MH_R + 2].alias("k3"),
            F.col("sig")[b * _MH_R + 3].alias("k4"),
        ) for b in range(_MH_BANDS)])).alias("b"))
    a, c = bands.alias("a"), bands.alias("c")
    cand = (
        a.join(c, (F.col("a.b") == F.col("c.b"))
               & (F.col("a.doc_id") < F.col("c.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("c.doc_id").alias("doc_b"))
        .distinct()
    )
    da = docs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa"))
    db = docs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = (inter.cast("double")
           / (F.size("sa") + F.size("sb") - inter))
    return (
        cand.join(da, "doc_a").join(db, "doc_b")
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


_SLSH_PLANES, _SLSH_BANDS, _SLSH_R = 16, 4, 4
_SLSH_SCALE = 140737488355328.0  # 2^47: hash48/2^47 - 1 spans [-1, 1)

_SLSH_BITS_SQL = """
      list_transform(generate_series(0, 15), p ->
        list_reduce(list_prepend(0.0, list_transform(generate_series(1, 64),
          d -> e[d] * ((('0x' || substr(md5(p || '_' || d), 1, 12))::BIGINT
                        / 140737488355328.0) - 1.0))),
          (a, b) -> a + b) >= 0)"""
_SLSH_BAND_SQL = ",\n        ".join(
    "{" + f"'band': {b}, 'b1': bits[{b*_SLSH_R+1}], "
    f"'b2': bits[{b*_SLSH_R+2}], 'b3': bits[{b*_SLSH_R+3}], "
    f"'b4': bits[{b*_SLSH_R+4}]" + "}"
    for b in range(_SLSH_BANDS))


@query(
    "q_dedup_embed_lsh_portable",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE vec_id < {_EMBED_DUP_LIMIT}
    ),
    proj AS (
      SELECT vec_id, e, {_SLSH_BITS_SQL} AS bits
      FROM emb
    ),
    bands AS (
      SELECT vec_id, unnest([
        {_SLSH_BAND_SQL}
      ]) AS b
      FROM proj
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b
      FROM bands a JOIN bands c ON a.b = c.b AND a.vec_id < c.vec_id
    )
    SELECT p.vec_a, p.vec_b,
           ROUND(list_dot_product(ea.e, eb.e)
                 / (sqrt(list_dot_product(ea.e, ea.e))
                    * sqrt(list_dot_product(eb.e, eb.e))), 6) AS cos_sim
    FROM cand p
    JOIN emb ea ON ea.vec_id = p.vec_a
    JOIN emb eb ON eb.vec_id = p.vec_b
    WHERE list_dot_product(ea.e, eb.e)
          / (sqrt(list_dot_product(ea.e, ea.e))
             * sqrt(list_dot_product(eb.e, eb.e)))
          >= {_EMBED_DUP_THRESHOLD}
    """,
)
def q_dedup_embed_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH (hyperplane) embedding near-dup with FULL oracle
    backing — q_dedup_embed_lsh promoted from rows-only the same way
    q_dedup_minhash_portable was: the 16 hyperplanes derive from the
    portable md5-prefix hash (w(p,d) = hash48(p,d)/2^47 − 1 ∈ [−1,1)),
    projections fold sequentially (left fold, init 0.0 — DuckDB
    list_reduce ≡ Spark F.aggregate, bit-identical doubles), sign bits
    band 4×4 into boolean 4-tuple join keys, and candidates verify with
    the exact sequential cosine (the q_dedup_embed predicate). Both
    engines therefore select IDENTICAL candidates and emit identical
    pairs. Projection is map-side; only band collisions pay the exact
    cosine. Bounded oracle twin; unbounded = same plan, more planes."""
    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _EMBED_DUP_LIMIT)
        .select("vec_id", "embedding",
                F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                .alias("norm"))
        .localCheckpoint(eager=False)  # bands + two verify sides
    )

    def proj_bit(p):
        # The hyperplane weights w(p,d) = hash48(p,d)/2^47 − 1 depend only
        # on (plane, dim) — plan constants, so they are precomputed ONCE
        # here with the same md5-prefix arithmetic (IEEE-identical to the
        # oracle's inline conv(md5)/2^47 − 1) and shipped as a 64-double
        # literal array instead of re-deriving 16×64 md5s per row.
        import hashlib
        weights = F.array(*[
            F.lit(int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:12],
                      16) / _SLSH_SCALE - 1.0)
            for d in range(1, 65)])

        def step(acc, d):
            return (acc + F.element_at("embedding", d).cast("double")
                    * F.element_at(weights, d))

        return F.aggregate(
            F.sequence(F.lit(1), F.lit(64)), F.lit(0.0), step) >= 0
    bits = emb.withColumn(
        "bits", F.array(*[proj_bit(p) for p in range(_SLSH_PLANES)]))
    bands = bits.select("vec_id", F.explode(F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.col("bits")[b * _SLSH_R].alias("b1"),
            F.col("bits")[b * _SLSH_R + 1].alias("b2"),
            F.col("bits")[b * _SLSH_R + 2].alias("b3"),
            F.col("bits")[b * _SLSH_R + 3].alias("b4"),
        ) for b in range(_SLSH_BANDS)])).alias("b"))
    a, c = bands.alias("a"), bands.alias("c")
    cand = (
        a.join(c, (F.col("a.b") == F.col("c.b"))
               & (F.col("a.vec_id") < F.col("c.vec_id")))
        .select(F.col("a.vec_id").alias("vec_a"),
                F.col("c.vec_id").alias("vec_b"))
        .distinct()
    )
    ea = emb.select(F.col("vec_id").alias("vec_a"),
                    F.col("embedding").alias("emb_a"),
                    F.col("norm").alias("norm_a"))
    eb = emb.select(F.col("vec_id").alias("vec_b"),
                    F.col("embedding").alias("emb_b"),
                    F.col("norm").alias("norm_b"))
    cos = (_dot(F.col("emb_a"), F.col("emb_b"))
           / (F.col("norm_a") * F.col("norm_b")))
    return (
        cand.join(ea, "vec_a").join(eb, "vec_b")
        .filter(cos >= _EMBED_DUP_THRESHOLD)
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos_sim"))
    )


_PSH_BITS, _PSH_BANDS, _PSH_BB = 16, 4, 4  # 16-bit simhash, 4 bands of 4 bits
_PSH_HAMMING_MAX = 1  # fixture texts share one 31-word vocab → 16-bit
# fingerprints are dense; ≤1 keeps the near-identical tier (≤3 admits 26%
# of ALL pairs here — real corpora use 64 bits and a wider radius)

_PSH_BIT_SQL = " + ".join(
    f"(CASE WHEN CAST(SUM(cnt * (CASE WHEN (h >> {b}) & 1 = 1 THEN 1 "
    f"ELSE -1 END)) AS BIGINT) > 0 THEN {1 << b} ELSE 0 END)"
    for b in range(_PSH_BITS))
_PSH_BAND_SQL = ",\n        ".join(
    f"{{'band': {b}, 'k': (fp >> {b * _PSH_BB}) & {(1 << _PSH_BB) - 1}}}"
    for b in range(_PSH_BANDS))


@query(
    "q_dedup_simhash_portable",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, token, COUNT(*) AS cnt,
             ('0x' || substr(md5(token), 1, 12))::BIGINT AS h
      FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents WHERE doc_id < {_NEAR_DUP_LIMIT}
      ) GROUP BY 1, 2
    ),
    fps AS (
      SELECT doc_id, {_PSH_BIT_SQL} AS fp
      FROM toks GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, fp, unnest([
        {_PSH_BAND_SQL}
      ]) AS b
      FROM fps
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, a.fp AS fp_a,
             c.doc_id AS doc_b, c.fp AS fp_b
      FROM bands a JOIN bands c ON a.b = c.b AND a.doc_id < c.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(fp_a, fp_b)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(fp_a, fp_b)) <= {_PSH_HAMMING_MAX}
    """,
)
def q_dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup with FULL oracle backing — the third portable
    LSH promotion (after MinHash and sign-LSH), and the INTEGER-EXACT
    one: per-token 48-bit md5-prefix hashes vote ±cnt on each of 16
    fingerprint bits, fingerprints band 4×4 bits for candidates, and
    candidates verify by popcount(xor) ≤ _PSH_HAMMING_MAX (= 1) — every step is integer
    arithmetic, so cross-engine equality is exact by construction, not
    by IEEE-order discipline. Fingerprinting is one (doc, token)
    aggregate (map-side partial) + one per-doc aggregate; candidates
    come from ONE band-key self-join. The 64-bit xxhash64 engine path
    stays q_simhash/q_dedup_simhash; this key proves the algorithm
    against an independent engine. Bounded oracle twin."""
    toks = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _NEAR_DUP_LIMIT)
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", F.conv(
            F.substring(F.md5("token"), 1, 12), 16, 10).cast("long"))
    )
    votes = [
        (F.sum(F.col("cnt") * F.when(
            F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1,
            F.lit(1)).otherwise(F.lit(-1))).cast("long") > 0)
        for b in range(_PSH_BITS)]
    fp = reduce(
        lambda acc, bv: acc + bv[1].cast("long") * F.lit(1 << bv[0]),
        enumerate(votes), F.lit(0).cast("long"))
    fps = toks.groupBy("doc_id").agg(fp.alias("fp"))
    bands = fps.select("doc_id", "fp", F.explode(F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("fp"), b * _PSH_BB)
            .bitwiseAND(F.lit((1 << _PSH_BB) - 1)).alias("k"),
        ) for b in range(_PSH_BANDS)])).alias("b"))
    a, c = bands.alias("a"), bands.alias("c")
    hamming = F.bit_count(
        F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("long")
    return (
        a.join(c, (F.col("a.b") == F.col("c.b"))
               & (F.col("a.doc_id") < F.col("c.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("a.fp").alias("fp_a"),
                F.col("c.doc_id").alias("doc_b"), F.col("c.fp").alias("fp_b"))
        .distinct()
        .filter(F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
                <= _PSH_HAMMING_MAX)
        .select("doc_a", "doc_b", hamming.alias("hamming"))
    )



_SEM_CELLS = 8  # SemDeDup coarse clusters (centroids = vectors 0..7)


@query(
    "q_dedup_semantic",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE vec_id < {_EMBED_DUP_LIMIT}
        AND list_dot_product(embedding, embedding) > 0
    ),
    cents AS (
      SELECT vec_id AS c_id, e AS ce FROM emb WHERE vec_id < {_SEM_CELLS}
    ),
    assigned AS (
      SELECT vec_id, e, c_id AS cell FROM (
        SELECT emb.vec_id, emb.e, c.c_id,
               ROW_NUMBER() OVER (
                 PARTITION BY emb.vec_id
                 ORDER BY list_dot_product(emb.e, c.ce)
                          / (sqrt(list_dot_product(emb.e, emb.e))
                             * sqrt(list_dot_product(c.ce, c.ce))) DESC,
                          c.c_id) AS rn
        FROM emb, cents c) WHERE rn = 1
    ),
    dup AS (
      SELECT DISTINCT b.vec_id
      FROM assigned a JOIN assigned b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.e, b.e)
            / (sqrt(list_dot_product(a.e, a.e))
               * sqrt(list_dot_product(b.e, b.e)))
            >= {_EMBED_DUP_THRESHOLD}
    )
    SELECT s.vec_id, CAST(s.cell AS BIGINT) AS cell,
           (d.vec_id IS NOT NULL) AS removed
    FROM assigned s LEFT JOIN dup d ON s.vec_id = d.vec_id
    """,
)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 semantic dedup, the SemDeDup shape (cluster-then-dedup): route
    every vector to its nearest of 8 fixed centroids (deterministically
    vectors 0..7 — the q_knn_ivf discipline), then run the exact cosine
    near-dup predicate ONLY within each cell; a vector is removed when a
    lower-id same-cell vector sits above the threshold (the keep-first
    rule, deterministic on both engines).

    Scale: the centroid table broadcasts; assignment is map-side + a
    vec_id-partitioned argmax window; the quadratic verify is bounded by
    the largest CELL, not the corpus (cells shrink as K grows — at
    100 TB, K ~ sqrt(N) keeps cells constant-sized and the whole dedup
    linear-ish, which is exactly why SemDeDup clusters first). Per-vector
    norms are hoisted once into the assignment. Bounded oracle twin;
    unbounded = same plan, more cells."""
    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _EMBED_DUP_LIMIT)
        .select("vec_id", "embedding",
                F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                .alias("norm"))
        # Zero-norm vectors have no cosine direction: exclude them loudly
        # (mirrored in the oracle) instead of letting NaN cosines silently
        # mis-route them to an arbitrary cell.
        .filter(F.col("norm") > 0)
    )
    cents = emb.filter(F.col("vec_id") < _SEM_CELLS).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"))
    w = Window.partitionBy("vec_id").orderBy(F.col("cc").desc(), "c_id")
    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .select("vec_id", "embedding", "norm", "c_id",
                (_dot(F.col("embedding"), F.col("c_emb"))
                 / (F.col("norm") * F.col("c_norm"))).alias("cc"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "norm", F.col("c_id").alias("cell"))
        .localCheckpoint()  # both sides of the in-cell pair join
    )
    a = assigned.select(F.col("vec_id").alias("a_id"),
                        F.col("embedding").alias("a_emb"),
                        F.col("norm").alias("a_norm"), "cell")
    b = assigned.select(F.col("vec_id").alias("b_id"),
                        F.col("embedding").alias("b_emb"),
                        F.col("norm").alias("b_norm"), "cell")
    dup = (
        a.join(b, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter((_dot(F.col("a_emb"), F.col("b_emb"))
                 / (F.col("a_norm") * F.col("b_norm")))
                >= _EMBED_DUP_THRESHOLD)
        .select(F.col("b_id").alias("vec_id")).distinct()
        .withColumn("__dup", F.lit(True))
    )
    return (
        assigned.join(dup, "vec_id", "left")
        .select("vec_id", F.col("cell").cast("long").alias("cell"),
                F.coalesce("__dup", F.lit(False)).alias("removed"))
    )


_SUBSTR_W = 8  # repeated-span window, in tokens


@query(
    "q_dedup_substr",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sized AS (
      SELECT doc_id, t, len(t) AS n_tokens
      FROM toks WHERE len(t) >= {_SUBSTR_W}
    ), sh AS (
      SELECT doc_id, n_tokens, s,
             md5(array_to_string(t[s:s+{_SUBSTR_W - 1}], ' ')) AS h
      FROM sized,
           LATERAL (SELECT unnest(range(1, n_tokens - {_SUBSTR_W} + 2))
                    AS s) u
    ), rep AS (
      SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1
    ), hits AS (
      SELECT doc_id, n_tokens, s FROM sh JOIN rep USING (h)
    ), cov AS (
      SELECT doc_id, n_tokens, COUNT(DISTINCT p) AS n_repeated_tokens
      FROM hits,
           LATERAL (SELECT unnest(range(s, s + {_SUBSTR_W})) AS p) v
      GROUP BY 1, 2
    )
    SELECT doc_id, n_tokens, n_repeated_tokens,
           n_repeated_tokens * 1000000 // n_tokens AS repeated_ppm
    FROM cov
    """,
)
def q_dedup_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2, the ExactSubstr rung (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"): find every ≥w-token span that
    occurs in MORE THAN ONE document and report, per affected doc, how
    many of its token positions are covered by such spans (the removal
    mask ExactSubstr would cut). The distributed shape is the
    suffix-array-free approximation production pipelines use: one
    tokenize scan, a rolling w-gram hash stream (n_tokens rows — no
    quadratic anywhere), ONE shuffle on the span hash to find hashes
    spanning >1 distinct doc, a hash-join back, and a bounded ×w
    position explode for exact interval-union coverage. At 100 TB every
    stage is linear in corpus tokens and partial-aggregates map-side;
    the span-hash shuffle is the same access path q_winnow_crossdoc
    prunes with fingerprint selection — this key keeps EVERY span, the
    exact-coverage complement to winnowing's sampled fingerprints.
    Integer outputs (positions, counts, ppm) keep the cross-engine
    comparison exact."""
    w = _SUBSTR_W
    docs = (load(spark, sf_dir, "documents")
            .select("doc_id", F.split("text", " ").alias("toks"))
            .withColumn("n_tokens", F.size("toks").cast("long"))
            .filter(F.col("n_tokens") >= w))
    # the rolling w-gram stream feeds BOTH the repeated-hash aggregate
    # and the join probe; lazily checkpoint it so the tokenize + md5
    # pass runs once instead of once per consumer (r13, same deliberate
    # space-for-recompute trade as q_setsim_join's shingle checkpoint —
    # at cluster scale the equivalent is a short-lived staged write)
    sh = (docs
          .select("doc_id", "n_tokens", "toks",
                  F.explode(
                      F.expr(f"sequence(1, size(toks) - {w} + 1)"))
                  .alias("s"))
          .select("doc_id", "n_tokens", "s",
                  F.md5(F.array_join(F.slice("toks", F.col("s"), w), " "))
                  .alias("h"))
          .localCheckpoint(eager=False))
    # "spans seen in >1 distinct doc" needs no countDistinct (which
    # plans a second keys=(h, doc_id) exchange): min(doc_id) ≠
    # max(doc_id) over the h-group is the same predicate, and min/max
    # partial-aggregate map-side into ONE h-keyed exchange (guide §2.3)
    rep = (sh.groupBy("h")
           .agg(F.min("doc_id").alias("__lo"), F.max("doc_id").alias("__hi"))
           .filter(F.col("__lo") != F.col("__hi"))
           .select("h"))
    hits = sh.join(rep, "h").select("doc_id", "n_tokens", "s")
    # exact interval-union coverage WITHOUT the ×w position explode +
    # positions countDistinct (two more exchanges): spans of one doc,
    # ordered by start, each contribute end − max(start − 1, furthest
    # end of any earlier span), clamped at 0 — the classic union sweep.
    # (doc_id, s) is unique in hits (one hash per position, rep is
    # distinct on h), so the order is total and the window exact; the
    # partition is a single document's spans, bounded by doc length.
    wd = (Window.partitionBy("doc_id").orderBy("s")
          .rowsBetween(Window.unboundedPreceding, -1))
    cov = (hits
           .withColumn("prev_end", F.max(F.col("s") + w - 1).over(wd))
           .withColumn("add", F.greatest(
               (F.col("s") + w - 1)
               - F.greatest(F.col("s") - 1,
                            F.coalesce("prev_end", F.lit(0))),
               F.lit(0)))
           .groupBy("doc_id", "n_tokens")
           .agg(F.sum("add").alias("n_repeated_tokens")))
    return cov.select("doc_id", "n_tokens", "n_repeated_tokens",
                      F.expr("n_repeated_tokens * 1000000 div n_tokens")
                      .alias("repeated_ppm"))
