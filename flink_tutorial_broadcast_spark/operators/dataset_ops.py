"""Dataset-construction operators for training-data pipelines.

The ops that turn a cleaned corpus into a training set: deterministic
split assignment, CDC snapshot diffing, outlier winsorization, negative
sampling, class rebalancing, PII redaction, plus two scale-path join
rewrites (bucketed range join, trailing-window distinct). All are pure
built-in DataFrame ops — zero Python in the hot path — and all eight
hash-match a DuckDB oracle.

Scale notes (100 TB):
- Split/redact/negative-sampling are embarrassingly parallel map-side ops
  (no shuffle beyond the final small agg or FK join; the FK join
  broadcasts the dimension).
- q_snapshot_diff is one full-outer shuffle join keyed on the PK — the
  canonical CDC plan; at scale both snapshots would be bucketed on the
  PK so the join is exchange-free.
- q_range_join_bucketed turns an O(n·m) theta range join into an
  equi-join on a time bucket (3× duplication of one side), the standard
  rewrite when the naive interval join's BNLJ would never finish.
- q_windowed_distinct pre-shrinks to distinct (day,user) pairs BEFORE
  the window expansion, so the 7× duplication applies to the deduped
  relation, not the raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load, local_rows_df
from flink_tutorial_broadcast_spark.registry import query


@query(
    "q_dataset_split",
    oracle="""
    SELECT lang,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                  THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                  THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (~80/10/10) by md5(doc_id)
    prefix — seed-free, engine-portable, stable under repartitioning, so
    the same document lands in the same split on every engine and every
    rerun. Map-side only; the tiny per-(lang,split) agg is the one
    shuffle."""
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return (
        load(spark, sf_dir, "documents")
        .withColumn(
            "split",
            F.when(bucket < "cc", "train")
            .when(bucket < "e6", "val")
            .otherwise("test"),
        )
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
    )


@query(
    "q_snapshot_diff",
    oracle="""
    WITH new AS (
      SELECT c_custkey,
             c_acctbal + CASE WHEN c_custkey % 10 = 0 THEN 100.0
                              ELSE 0.0 END AS c_acctbal
      FROM customer WHERE c_custkey % 13 <> 0
      UNION ALL
      SELECT c_custkey + 10000000 AS c_custkey, c_acctbal
      FROM customer WHERE c_custkey % 17 = 0
    )
    SELECT CASE WHEN o.c_custkey IS NULL THEN 'insert'
                WHEN n.c_custkey IS NULL THEN 'delete'
                WHEN o.c_acctbal <> n.c_acctbal THEN 'update'
                ELSE 'unchanged' END AS change_type,
           COUNT(*) AS n,
           CAST(SUM(COALESCE(o.c_custkey, n.c_custkey)) AS BIGINT)
             AS key_checksum,
           ROUND(SUM(COALESCE(n.c_acctbal, 0) - COALESCE(o.c_acctbal, 0)),
                 2) AS bal_delta
    FROM customer o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
    GROUP BY 1
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot diff: classify every PK as insert/update/delete/
    unchanged between two table generations (the batch analogue of a
    changelog stream — what processBroadcastElement consumes as its rule
    updates, derived here from state rather than received as events).

    The new snapshot is simulated deterministically from the base so
    both engines derive identical generations: %13 keys deleted, %10
    balances +100, %17 keys re-inserted under a shifted PK. One
    full-outer shuffle join on the PK; at 100 TB both snapshots are
    bucketed on the PK and the join is exchange-free.
    """
    base = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    new = (
        base.filter(F.col("c_custkey") % 13 != 0)
        .withColumn(
            "c_acctbal",
            F.col("c_acctbal")
            + F.when(F.col("c_custkey") % 10 == 0, 100.0).otherwise(0.0),
        )
        .unionByName(
            base.filter(F.col("c_custkey") % 17 == 0)
            .withColumn("c_custkey", F.col("c_custkey") + 10000000)
        )
    )
    o, n = base.alias("o"), new.alias("n")
    joined = o.join(n, F.col("o.c_custkey") == F.col("n.c_custkey"), "full")
    return (
        joined.select(
            F.when(F.col("o.c_custkey").isNull(), "insert")
            .when(F.col("n.c_custkey").isNull(), "delete")
            .when(F.col("o.c_acctbal") != F.col("n.c_acctbal"), "update")
            .otherwise("unchanged")
            .alias("change_type"),
            F.coalesce(F.col("o.c_custkey"), F.col("n.c_custkey"))
            .alias("key"),
            (
                F.coalesce(F.col("n.c_acctbal"), F.lit(0.0))
                - F.coalesce(F.col("o.c_acctbal"), F.lit(0.0))
            ).alias("delta"),
        )
        .groupBy("change_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("key").alias("key_checksum"),
            F.round(F.sum("delta"), 2).alias("bal_delta"),
        )
    )


@query(
    "q_winsorize",
    oracle="""
    WITH q AS (
      SELECT c_mktsegment AS segment,
             quantile_cont(c_acctbal, 0.05) AS q05,
             quantile_cont(c_acctbal, 0.95) AS q95
      FROM customer GROUP BY 1
    )
    SELECT q.segment, COUNT(*) AS n,
           ROUND(AVG(c.c_acctbal), 2) AS avg_raw,
           ROUND(AVG(LEAST(GREATEST(c.c_acctbal, q.q05), q.q95)), 2)
             AS avg_wins,
           ROUND(MIN(q.q05), 2) AS p05, ROUND(MAX(q.q95), 2) AS p95
    FROM customer c JOIN q ON c.c_mktsegment = q.segment
    GROUP BY q.segment
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization: clamp c_acctbal to its segment's
    [p05, p95] band (exact interpolated quantiles, ≡ DuckDB
    quantile_cont) — the standard outlier treatment before computing
    quality statistics. Two passes: a tiny per-segment quantile agg
    broadcast back onto the fact, then the clamped re-aggregate. At
    100 TB pass 1 switches to approx_percentile (sketch-mergeable,
    single pass) — noted, not done here, to keep the exact oracle."""
    cust = load(spark, sf_dir, "customer")
    q = cust.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.percentile("c_acctbal", F.lit(0.05)).alias("q05"),
        F.percentile("c_acctbal", F.lit(0.95)).alias("q95"),
    )
    clamped = cust.join(
        F.broadcast(q), cust.c_mktsegment == q.segment
    ).withColumn(
        "wins",
        F.least(F.greatest(F.col("c_acctbal"), F.col("q05")), F.col("q95")),
    )
    return clamped.groupBy("segment").agg(
        F.count("*").alias("n"),
        F.round(F.avg("c_acctbal"), 2).alias("avg_raw"),
        F.round(F.avg("wins"), 2).alias("avg_wins"),
        F.round(F.min("q05"), 2).alias("p05"),
        F.round(F.max("q95"), 2).alias("p95"),
    )


@query(
    "q_negative_sampling",
    oracle="""
    WITH np AS (SELECT COUNT(*) AS n_parts FROM part),
    anchors AS (
      SELECT event_id FROM events WHERE event_type = 'purchase'
    )
    SELECT a.event_id AS event_id, i.neg_rank AS neg_rank,
           p.p_partkey AS neg_partkey, p.p_name AS p_name
    FROM anchors a
    CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS neg_rank) i
    CROSS JOIN np
    JOIN part p
      ON p.p_partkey =
         ((a.event_id % 1000003) * 31 + i.neg_rank * 7001) % np.n_parts
    """,
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    purchase event draws k=3 pseudo-random catalog parts via pure
    integer hashing (no RNG state — reproducible on any engine, any
    partitioning). The corpus size enters as a broadcast scalar; the
    part lookup is a broadcast FK join, so the anchor side never
    shuffles. Domain note: the fixture's p_partkey is 0-BASED and dense
    ([0, n_parts-1], verified against the parquet), so ``h % n_parts``
    lands on a real part for every (anchor, rank) pair and the k=3
    guarantee holds for ALL anchors — pinned per-anchor (not just in
    aggregate) by tests/test_dataset_ops.py. A 1-based catalog would
    need ``1 + h % n_parts`` in BOTH the Spark expression and the
    oracle."""
    ev = load(spark, sf_dir, "events")
    part = load(spark, sf_dir, "part")
    n_parts = part.agg(F.count("*").alias("n_parts"))
    anchors = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id")
        .withColumn("neg_rank", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))))
        .crossJoin(F.broadcast(n_parts))
        .withColumn(
            "neg_key",
            ((F.col("event_id") % 1000003) * 31 + F.col("neg_rank") * 7001)
            % F.col("n_parts"),
        )
    )
    return anchors.join(
        F.broadcast(part), anchors.neg_key == part.p_partkey
    ).select(
        "event_id",
        "neg_rank",
        F.col("p_partkey").alias("neg_partkey"),
        "p_name",
    )


@query(
    "q_class_upsample",
    oracle="""
    WITH c AS (
      SELECT lang, COUNT(*) AS n_orig FROM documents GROUP BY lang
    ),
    r AS (
      SELECT lang, n_orig,
             GREATEST(1, MAX(n_orig) OVER () // n_orig) AS rep
      FROM c
    )
    SELECT lang, n_orig, rep, n_orig * rep AS n_upsampled FROM r
    """,
)
def q_class_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced upsampling: replicate each language's documents
    floor(max_class/n) times so minority classes approach the majority
    count. The Spark side REALLY materializes the replication
    (explode(sequence(1, rep))) and counts the result, proving the
    operator; the oracle states the arithmetic identity the output must
    satisfy. Replication factors are data-derived and integer-exact.
    At scale the explode is map-side (no shuffle) and the rep table is
    a broadcast."""
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_orig"))
    max_n = counts.agg(F.max("n_orig").alias("max_n"))
    rep = (
        counts.crossJoin(F.broadcast(max_n))
        .withColumn(
            "rep",
            F.greatest(F.lit(1), F.floor(F.col("max_n") / F.col("n_orig"))),
        )
        .select("lang", "n_orig", "rep")
    )
    exploded = (
        docs.join(F.broadcast(rep), "lang")
        .withColumn("copy", F.explode(F.sequence(F.lit(1), F.col("rep"))))
    )
    return (
        exploded.groupBy("lang")
        .agg(F.count("*").alias("n_upsampled"))
        .join(F.broadcast(rep), "lang")
        .select("lang", "n_orig", "rep", "n_upsampled")
    )


@query(
    "q_pii_redact",
    oracle="""
    WITH m AS (
      SELECT c_custkey,
             'user ' || CAST(c_custkey AS VARCHAR) || ' contact '
               || lower(replace(c_name, ' ', '.')) || '@example.com'
               || ' re order' AS msg
      FROM customer
    )
    SELECT c_custkey,
           regexp_replace(msg, '[a-z0-9.#]+@[a-z0-9.]+', '<EMAIL>') AS redacted,
           regexp_extract(msg, '@([a-z0-9.]+)', 1) AS domain
    FROM m
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: strip email addresses from free text with a
    regex rewrite, keeping the domain as an aggregatable audit column.
    The emails are synthesized deterministically from customer names
    (the fixtures carry no real PII), so both engines see identical
    inputs; the regex uses only portable character-class syntax (Java
    regex ≡ RE2 here). Pure map-side — the 100 TB plan is scan→rewrite
    →write with no exchange."""
    cust = load(spark, sf_dir, "customer")
    email = F.concat(
        F.lower(F.replace(F.col("c_name"), F.lit(" "), F.lit("."))),
        F.lit("@example.com"),
    )
    msg = F.concat(
        F.lit("user "),
        F.col("c_custkey").cast("string"),
        F.lit(" contact "),
        email,
        F.lit(" re order"),
    )
    return cust.select(
        "c_custkey",
        F.regexp_replace(msg, "[a-z0-9.#]+@[a-z0-9.]+", "<EMAIL>")
        .alias("redacted"),
        F.regexp_extract(msg, "@([a-z0-9.]+)", 1).alias("domain"),
    )


@query(
    "q_range_join_bucketed",
    oracle="""
    SELECT p.user_id AS user_id, COUNT(*) AS n_pairs
    FROM events p JOIN events e
      ON p.user_id = e.user_id
     AND e.ts BETWEEN p.ts - INTERVAL 5 MINUTE AND p.ts + INTERVAL 5 MINUTE
    WHERE p.event_type = 'purchase' AND e.event_type = 'error'
    GROUP BY p.user_id
    """,
)
def q_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path rewrite of the interval join (C7): quantize time into
    width-Δ buckets, explode the probe side into {b-1, b, b+1}, equi-join
    on (user_id, bucket), then apply the exact range predicate. Same
    semantics as q_interval_join (the oracle IS the naive formulation),
    but the plan is a shuffled hash/SMJ equi-join — O(n+m) with 3×
    duplication of one side — instead of a per-key nested loop. Because
    Δ equals the join half-width, any pair within ±Δ differs by at most
    one bucket, so each qualifying pair is found exactly once (e keeps
    its single true bucket; only p explodes)."""
    ev = load(spark, sf_dir, "events")
    bucket = F.expr("unix_micros(ts) div 300000000")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
            F.explode(
                F.array(bucket - 1, bucket, bucket + 1)
            ).alias("jb"),
        )
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("e_ts"),
        bucket.alias("eb"),
    )
    pairs = p.join(
        e,
        (p.user_id == e.e_user_id)
        & (p.jb == e.eb)
        & (e.e_ts >= p.p_ts - F.expr("INTERVAL 5 MINUTES"))
        & (e.e_ts <= p.p_ts + F.expr("INTERVAL 5 MINUTES")),
    )
    return pairs.groupBy("user_id").agg(F.count("*").alias("n_pairs"))


@query(
    "q_windowed_distinct",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    spine AS (SELECT DISTINCT d FROM du)
    SELECT CAST(s.d AS DATE) AS day, COUNT(DISTINCT du.user_id) AS n_users
    FROM spine s JOIN du
      ON du.d BETWEEN s.d - 6 AND s.d
    GROUP BY s.d
    """,
)
def q_windowed_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct users per day (rolling actives — the
    metric COUNT(DISTINCT) OVER a range frame can't express on either
    engine). Rewrite: dedupe to (day,user) FIRST (shrinks the fact
    before the 7× window duplication), broadcast the tiny day spine,
    range-join, then count distinct per day. At 100 TB the dedup is the
    only big shuffle; the spine join stays a broadcast nested loop over
    ~365 rows."""
    ev = load(spark, sf_dir, "events")
    du = ev.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    spine = du.select(F.col("d").alias("day")).distinct()
    joined = du.join(
        F.broadcast(spine),
        (F.col("d") <= F.col("day"))
        & (F.col("d") >= F.date_sub(F.col("day"), 6)),
    )
    return joined.groupBy("day").agg(
        F.countDistinct("user_id").alias("n_users")
    ).select(
        # day → timestamp: pandas reads DuckDB DATE as midnight Timestamp,
        # so both engines must canonicalize to the same isoformat string
        F.col("day").cast("timestamp").alias("day"),
        "n_users",
    )


@query(
    "q_cdc_apply",
    oracle="""
    WITH log AS (
      SELECT c_custkey AS k, 'D' AS op, CAST(NULL AS DOUBLE) AS bal
      FROM customer WHERE c_custkey % 13 = 0
      UNION ALL
      SELECT c_custkey AS k, 'U' AS op, c_acctbal + 100.0 AS bal
      FROM customer WHERE c_custkey % 13 <> 0 AND c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + 10000000 AS k, 'I' AS op, c_acctbal AS bal
      FROM customer WHERE c_custkey % 17 = 0
    )
    SELECT COALESCE(b.c_custkey, l.k) AS c_custkey,
           ROUND(COALESCE(l.bal, b.c_acctbal), 2) AS c_acctbal
    FROM customer b FULL OUTER JOIN log l ON b.c_custkey = l.k
    WHERE l.op IS NULL OR l.op <> 'D'
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY — the inverse of q_snapshot_diff: fold an
    insert/update/delete changelog into a base snapshot to materialize
    the next table generation. This is the delete-aware MERGE (Delta's
    WHEN MATCHED AND op='D' THEN DELETE) expressed as one full-outer PK
    join + coalesce + anti-filter — no table format required, and the
    batch materialization of consuming a Flink retract/changelog stream.

    The changelog derives deterministically from the base (same %13/%10/
    %17 families as q_snapshot_diff), so diff(apply(base, log)) ≡ log —
    the round-trip property the test pins. One PK shuffle; at 100 TB the
    changelog side is small by nature → broadcast, base never shuffles.
    """
    base = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    k = F.col("c_custkey")
    log = (
        base.filter(k % 13 == 0)
        .select(k.alias("k"), F.lit("D").alias("op"),
                F.lit(None).cast("double").alias("bal"))
        .unionByName(
            base.filter((k % 13 != 0) & (k % 10 == 0))
            .select(k.alias("k"), F.lit("U").alias("op"),
                    (F.col("c_acctbal") + 100.0).alias("bal"))
        )
        .unionByName(
            base.filter(k % 17 == 0)
            .select((k + 10000000).alias("k"), F.lit("I").alias("op"),
                    F.col("c_acctbal").alias("bal"))
        )
    )
    j = base.join(log, base.c_custkey == log.k, "full")
    return (
        j.filter(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            F.coalesce(base.c_custkey, log.k).alias("c_custkey"),
            F.round(F.coalesce(log.bal, base.c_acctbal), 2)
            .alias("c_acctbal"),
        )
    )


def _md5_prefix_positions(keyed: DataFrame, key: str, out: str) -> DataFrame:
    """0-based global position under ORDER BY (key, doc_id), two-phase —
    single-key wrapper over _md5_prefix_positions_multi."""
    return _md5_prefix_positions_multi(keyed, [(key, out)])


def _md5_prefix_positions_multi(
    keyed: DataFrame, specs: list[tuple[str, str]],
) -> DataFrame:
    """N 0-based global positions, each under ORDER BY (key_i, doc_id),
    two-phase, in a FIXED number of extra jobs regardless of N.

    md5 keys are uniform hex, so the first two hex chars are a
    DETERMINISTIC range bucket (256 near-equal ranges — no sampling, so
    recomputation can't drift the way repartitionByRange boundaries can).
    Phase 1 is ONE exploded (ordering, bucket) histogram — ≤256·N rows —
    collected to the driver (bounded broadcast analogue, like the kNN
    probe dim) and prefix-summed into per-bucket offsets. Phase 2 takes a
    bucket-PARTITIONED row_number per ordering — 256-way parallel, never
    a single-partition WindowExec — and adds the broadcast offset. The
    input materializes ONCE (lazy checkpoint) however many orderings are
    requested; q_epoch_shuffle's two epochs cost one histogram job, not
    two. At 100 TB raise the prefix to 3–4 hex chars (4096/65536
    ranges)."""
    bcols = [f"__b_{out}" for _, out in specs]
    bucketed = keyed
    for (key, _), b in zip(specs, bcols):
        bucketed = bucketed.withColumn(b, F.substring(key, 1, 2))
    # consumers: the histogram job + each window join — checkpoint
    # lazily so the upstream md5 projection materializes once; blocks
    # are freed by session.release_cached_blocks in harness loops
    bucketed = bucketed.localCheckpoint(eager=False)
    counts = (
        bucketed.select(F.explode(F.array(*[
            F.struct(F.lit(i).alias("m"), F.col(b).alias("b"))
            for i, b in enumerate(bcols)])).alias("mb"))
        .groupBy(F.col("mb.m").alias("m"), F.col("mb.b").alias("b"))
        .count().collect()
    )
    spark = keyed.sparkSession
    out = bucketed
    for i, ((key, name), b) in enumerate(zip(specs, bcols)):
        rows = sorted((r for r in counts if r["m"] == i),
                      key=lambda r: r["b"])
        offsets, acc = [], 0
        for r in rows:
            offsets.append((r["b"], acc))
            acc += r["count"]
        off_df = local_rows_df(
            spark, offsets, f"{b} string, __off_{i} long")
        w = Window.partitionBy(b).orderBy(key, "doc_id")
        out = (
            out.join(F.broadcast(off_df), b)
            .withColumn(name, F.col(f"__off_{i}") + F.row_number().over(w) - 1)
            .drop(b, f"__off_{i}")
        )
    return out


@query(
    "q_epoch_shuffle",
    oracle="""
    WITH keyed AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR) || ':epoch1') AS k1,
             md5(CAST(doc_id AS VARCHAR) || ':epoch2') AS k2
      FROM documents
    ),
    pos AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY k1, doc_id) - 1 AS pos1,
             row_number() OVER (ORDER BY k2, doc_id) - 1 AS pos2
      FROM keyed
    )
    SELECT pos1 // 64 AS shard, COUNT(*) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
           CAST(SUM(CASE WHEN pos2 // 64 = pos1 // 64
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_same_shard
    FROM pos GROUP BY 1
    """,
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch reshuffling + sharding: each epoch e permutes
    the corpus by md5(doc_id || ':epoch<e>') — seed-free, reproducible on
    any engine/partitioning, and a DIFFERENT permutation per epoch (the
    training-loader requirement: same data, fresh order, no RNG state to
    checkpoint). Documents then shard into fixed 64-doc chunks by
    position. Emits per-shard counts, an id checksum (proves the
    partition property: every doc lands in exactly one shard), and the
    epoch-1↔epoch-2 shard collision count — low collisions show the
    permutations are effectively independent. The global row_number is
    EXECUTED two-phase (see _md5_prefix_positions): deterministic
    md5-prefix range buckets + broadcast prefix-sum offsets +
    bucket-partitioned row_number — the plan contains no unpartitioned
    WindowExec (CI-guarded in plans/audit.py)."""
    d = load(spark, sf_dir, "documents").select("doc_id")
    keyed = d.select(
        "doc_id",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":epoch1")))
        .alias("k1"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":epoch2")))
        .alias("k2"),
    )
    pos = _md5_prefix_positions_multi(
        keyed, [("k1", "pos1"), ("k2", "pos2")])
    return (
        pos.groupBy(F.expr("pos1 div 64").alias("shard"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").alias("id_checksum"),
            F.sum(F.when(F.expr("pos2 div 64") == F.expr("pos1 div 64"), 1)
                  .otherwise(0)).cast("long").alias("n_same_shard"),
        )
    )


@query(
    "q_domain_token_cap",
    oracle="""
    WITH toks AS (
      SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    capped AS (
      SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM toks
    )
    SELECT source, doc_id, n_tokens, cum_tokens
    FROM capped WHERE cum_tokens <= 800
    """,
)
def q_domain_token_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain token-budget cap — the standard pretraining-mixture
    guard against any one source dominating the corpus: within each
    source, documents accumulate (deterministic doc_id order) until the
    source's token budget (800) is exhausted; later documents are
    dropped. Seed-free and engine-portable, unlike sampled caps. The
    running sum is a window PARTITIONED by source (parallel across
    sources; no unpartitioned WindowExec). A pathologically heavy single
    source at 100 TB would shard that one window's partition — the
    mitigation is the same two-phase prefix-sum as q_epoch_shuffle,
    keyed (source, bucket), but per-source inputs here are
    budget-bounded consumers: the window can short-circuit after the
    budget, so the practical cost is ~budget rows per source."""
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (
        load(spark, sf_dir, "documents")
        .select("source", "doc_id",
                F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= 800)
    )


@query(
    "q_curriculum_interleave",
    oracle="""
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id)
               AS rank_in_source
      FROM documents
    )
    SELECT CAST(row_number() OVER (ORDER BY rank_in_source, source, doc_id)
                AS BIGINT) AS position,
           doc_id, source, rank_in_source
    FROM r
    """,
)
def q_curriculum_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic round-robin domain interleave — the training-order
    construction that keeps every mini-batch mixture-balanced: take each
    source's documents in order, deal them out round-robin (all sources'
    1st docs, then all 2nd docs, ...), yielding a total order where any
    contiguous window of ~n_sources docs touches every domain once.
    Within-source rank is a source-PARTITIONED window (parallel); the
    global position over (rank_in_source, source) is EXECUTED two-phase
    via global_order (bounded bucket-histogram collect + broadcast
    offsets + bucket-partitioned row_number) — no unpartitioned
    WindowExec anywhere in the plan."""
    from flink_tutorial_broadcast_spark.operators.two_phase import global_order

    r = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .withColumn(
            "rank_in_source",
            F.row_number().over(
                Window.partitionBy("source").orderBy("doc_id")),
        )
    )
    return global_order(
        r, F.col("rank_in_source"), ["source", "doc_id"],
        out_rn="position",
    ).select("position", "doc_id", "source", "rank_in_source")


@query(
    "q_cms_frequency",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    exact AS (SELECT token, COUNT(*) AS exact_cnt FROM toks GROUP BY 1),
    top AS (
      SELECT token, exact_cnt FROM exact
      ORDER BY exact_cnt DESC, token LIMIT 20
    ),
    hashed AS (
      SELECT token, s.seed,
             ('0x' || substr(md5(s.seed || token), 1, 8))::BIGINT % 64
               AS bucket
      FROM toks
      CROSS JOIN (SELECT UNNEST(['s1', 's2', 's3']) AS seed) s
    ),
    sketch AS (
      SELECT seed, bucket, COUNT(*) AS cnt FROM hashed GROUP BY 1, 2
    ),
    est AS (
      SELECT h.token, MIN(sk.cnt) AS cms_est
      FROM (SELECT DISTINCT token, seed, bucket FROM hashed) h
      JOIN sketch sk USING (seed, bucket) GROUP BY 1
    )
    SELECT t.token AS token, t.exact_cnt AS exact_cnt, e.cms_est AS cms_est,
           e.cms_est >= t.exact_cnt AS is_overestimate
    FROM top t JOIN est e ON t.token = e.token
    """,
)
def q_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch token frequencies, built RELATIONALLY so the
    sketch itself is an engine-portable table: d=3 seeded hash rows ×
    w=64 buckets, bucket = first-8-hex-chars of md5(seed||token) mod w
    (identical arithmetic on both engines — Spark conv(hex,16,10) ≡
    DuckDB '0x'-cast). The sketch is a 192-row aggregate whose size is
    INDEPENDENT of corpus size — the entire 100 TB token stream partial-
    aggregates map-side into ≤192 rows per partition before one tiny
    shuffle; estimates then come from a broadcast join against it.
    Emits the top-20 exact-vs-estimate comparison with the CMS
    guarantee surfaced as a column: est ≥ exact always (one-sided
    error), with collisions inflating small counts. The exact side is
    vocab-sized and exists only as the audit twin; at 100 TB you keep
    the sketch and drop the exact branch."""
    toks = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
    )
    seeds = F.array(F.lit("s1"), F.lit("s2"), F.lit("s3"))
    # two consumers (sketch agg + distinct-estimate side) — lazy
    # checkpoint so the explode+md5 projection materializes once
    hashed = toks.select(
        "token", F.explode(seeds).alias("seed")
    ).withColumn(
        "bucket",
        F.conv(F.substring(F.md5(F.concat("seed", "token")), 1, 8), 16, 10)
        .cast("long") % 64,
    ).localCheckpoint(eager=False)
    sketch = hashed.groupBy("seed", "bucket").agg(F.count("*").alias("cnt"))
    est = (
        hashed.select("token", "seed", "bucket").distinct()
        .join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("token").agg(F.min("cnt").alias("cms_est"))
    )
    top = (
        toks.groupBy("token").agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "token").limit(20)
    )
    return (
        F.broadcast(top).join(est, "token")
        .select("token", "exact_cnt", "cms_est",
                (F.col("cms_est") >= F.col("exact_cnt"))
                .alias("is_overestimate"))
    )


@query(
    "q_mixture_pipeline",
    oracle="""
    WITH toks AS (
      SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    capped AS (
      SELECT source, doc_id, n_tokens
      FROM (
        SELECT source, doc_id, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) AS cum
        FROM toks
      ) WHERE cum <= 800
    ),
    ranked AS (
      SELECT source, doc_id, n_tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id)
               AS rank_in_source
      FROM capped
    ),
    ordered AS (
      SELECT doc_id, n_tokens,
             row_number() OVER (ORDER BY rank_in_source, source, doc_id)
               AS position
      FROM ranked
    )
    SELECT (position - 1) // 16 AS shard, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tok_sum,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM ordered GROUP BY 1
    """,
)
def q_mixture_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-construction pipeline END TO END — the round-3 ops
    composed as one lazy plan: per-domain token-budget cap (source-
    partitioned running sum) → within-source rank → round-robin
    curriculum position (two-phase global_order — no unpartitioned
    WindowExec) → fixed 16-doc training shards with conservation
    checksums. Each stage feeds the next without materialization
    boundaries beyond global_order's bounded histogram collect; the
    whole chain is the real shape of a mixture-balanced dataloader
    manifest build."""
    from flink_tutorial_broadcast_spark.operators.two_phase import global_order

    w_cap = (Window.partitionBy("source").orderBy("doc_id")
             .rowsBetween(Window.unboundedPreceding, 0))
    capped = (
        load(spark, sf_dir, "documents")
        .select("source", "doc_id",
                F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
        .withColumn("cum", F.sum("n_tokens").over(w_cap))
        .filter(F.col("cum") <= 800)
        .drop("cum")
    )
    ranked = capped.withColumn(
        "rank_in_source",
        F.row_number().over(Window.partitionBy("source").orderBy("doc_id")))
    ordered = global_order(
        ranked, F.col("rank_in_source"), ["source", "doc_id"],
        out_rn="position")
    return (
        ordered.groupBy(
            ((F.col("position") - 1) / 16).cast("long").alias("shard"))
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").alias("tok_sum"),
             F.sum("doc_id").alias("id_checksum"))
    )
