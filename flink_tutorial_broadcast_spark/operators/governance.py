"""Data-governance operators: SCD2 dimension build, data-quality audit,
per-stratum sampling caps, and z-order layout clustering.

These are the table-maintenance ops that surround the reference's
streaming core in any production deployment: the broadcast-state rule
table ([FLINK-API `KeyedBroadcastProcessFunction`]) is exactly a
slowly-changing dimension (each rule update opens a new version), and a
100 TB training-data pipeline runs constraint audits and layout
clustering nightly. All four are pure built-in DataFrame ops — zero
Python in the hot path — and all four hash-match a DuckDB oracle.

Scale notes:
- SCD2: one shuffle on the dimension key; `lead()` needs only the
  partition sort AQE already plans for the window. At 100 TB the
  dimension is small by definition (it's the broadcast side).
- DQ audit: each check is an independent column-pruned scan or a
  broadcast anti-join; checks run as parallel jobs and union at the
  driver as a tiny result. Referential checks broadcast the PK side.
- Sampling cap: md5-ranked row_number per stratum — deterministic on
  any engine and any partitioning, no seed state to coordinate.
- Z-order: the clustering KEY is computed per-row with integer-exact
  arithmetic (no float boundaries); the production write path is
  `df.repartitionByRange("zkey").sortWithinPartitions("zkey")` so both
  dimensions get file-level min/max pruning from one layout.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from flink_tutorial_broadcast_spark.registry import query


@query(
    "q_scd2_build",
    oracle="""
    WITH v AS (
      SELECT user_id, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS version,
             lead(ts)     OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS valid_to
      FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, version, ts AS valid_from, valid_to,
           ROUND(value, 2) AS attr_value,
           CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
    FROM v
    """,
)
def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a type-2 slowly-changing dimension from a change stream:
    each purchase event opens a new version with a [valid_from, valid_to)
    interval; the open version has valid_to NULL and is_current = 1.

    This is the batch materialization of the reference's broadcast rule
    state: processBroadcastElement replacing a rule ≡ closing the prior
    version's interval. One shuffle on user_id; row_number and lead share
    the same window sort. is_current is int (not boolean) for
    cross-engine hash stability.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.row_number().over(w).alias("version"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.round("value", 2).alias("attr_value"),
        )
        .withColumn(
            "is_current",
            F.when(F.col("valid_to").isNull(), 1).otherwise(0),
        )
    )


@query(
    "q_dq_checks",
    oracle="""
    SELECT 'orders_orphan_custkey' AS check_name,
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS n_bad
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'orders_dup_orderkey',
           (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
    UNION ALL
    SELECT 'events_bad_json_props',
           (SELECT COUNT(*) FROM events
            WHERE json_extract_string(props, '$.k') IS NULL)
    UNION ALL
    SELECT 'events_value_negative',
           (SELECT COUNT(*) FROM events WHERE value < 0)
    UNION ALL
    SELECT 'lineitem_discount_out_of_range',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_discount < 0 OR l_discount > 0.5)
    """,
)
def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: six constraint checks (referential integrity,
    key uniqueness, JSON validity, domain ranges) emitted as one tiny
    (check_name, n_bad) report — the nightly gate a training pipeline
    runs before promoting a snapshot.

    Each check is an independent job over a column-pruned scan; the RI
    checks are broadcast anti-joins (PK side is the small side by
    construction). Results union driver-side: six rows total, no
    cross-check shuffle.
    """
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    customer = load(spark, sf_dir, "customer")
    events = load(spark, sf_dir, "events")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(name).alias("check_name"),
                         F.col("n_bad").cast("long").alias("n_bad"))

    checks = [
        one(
            "orders_orphan_custkey",
            orders.join(
                F.broadcast(customer.select("c_custkey")),
                orders.o_custkey == customer.c_custkey,
                "left_anti",
            ).agg(F.count("*").alias("n_bad")),
        ),
        one(
            "lineitem_orphan_orderkey",
            lineitem.join(
                orders.select("o_orderkey"),
                lineitem.l_orderkey == orders.o_orderkey,
                "left_anti",
            ).agg(F.count("*").alias("n_bad")),
        ),
        one(
            "orders_dup_orderkey",
            orders.agg((F.count("*") - F.countDistinct("o_orderkey"))
                       .alias("n_bad")),
        ),
        one(
            "events_bad_json_props",
            events.agg(F.count_if(
                F.get_json_object("props", "$.k").isNull()).alias("n_bad")),
        ),
        one(
            "events_value_negative",
            events.agg(F.count_if(F.col("value") < 0).alias("n_bad")),
        ),
        one(
            "lineitem_discount_out_of_range",
            lineitem.agg(F.count_if(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5)
            ).alias("n_bad")),
        ),
    ]
    return reduce(lambda a, b: a.unionByName(b), checks)


@query(
    "q_group_sample_cap",
    oracle="""
    WITH r AS (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang, source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, lang, source, rn FROM r WHERE rn <= 5
    """,
)
def q_group_sample_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum sampling cap: keep at most 5 documents per
    (lang, source) stratum, chosen by md5-hash ranking — the
    deterministic reservoir every data-mixing recipe needs (cap
    over-represented sources without a coordinated random state).

    md5(doc_id) gives an engine-portable, seed-free shuffle order;
    doc_id tie-break makes rank total. One shuffle on the stratum key;
    at scale the window sort is bounded per stratum, and a pre-filter
    on a cheap hash prefix can shrink the sort input first (see
    q_sample_deterministic).
    """
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source",
                F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
    )


def _morton_spark(xq, yq):
    """Interleave the low 8 bits of xq (odd positions) and yq (even):
    integer-exact Morton/z-order key, built from shift/mask primitives."""
    bits = None
    for i in range(8):
        xb = F.shiftleft(F.shiftright(xq, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        yb = F.shiftleft(F.shiftright(yq, i).bitwiseAND(F.lit(1)), 2 * i)
        bits = xb + yb if bits is None else bits + xb + yb
    return bits


def _morton_duckdb(xq: str, yq: str) -> str:
    terms = []
    for i in range(8):
        terms.append(f"((({xq} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({yq} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


@query(
    "q_zorder_cluster",
    oracle=f"""
    WITH b AS (
      SELECT MIN(o_custkey) AS xmin, MAX(o_custkey) AS xmax,
             MIN(CAST(FLOOR(o_totalprice) AS BIGINT)) AS ymin,
             MAX(CAST(FLOOR(o_totalprice) AS BIGINT)) AS ymax
      FROM orders
    ), q AS (
      SELECT ((o_custkey - xmin) * 256) // (xmax - xmin + 1) AS xq,
             ((CAST(FLOOR(o_totalprice) AS BIGINT) - ymin) * 256)
               // (ymax - ymin + 1) AS yq
      FROM orders, b
    ), m AS (
      SELECT xq, yq, {_morton_duckdb("xq", "yq")} AS morton FROM q
    )
    SELECT morton // 1024 AS zbucket,
           COUNT(*) AS n,
           MIN(xq) AS x_lo, MAX(xq) AS x_hi,
           MIN(yq) AS y_lo, MAX(yq) AS y_hi
    FROM m GROUP BY 1
    """,
)
def q_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (o_custkey, o_totalprice):
    quantize both dimensions to 8 bits with integer-exact arithmetic,
    interleave the bits, and report per-zbucket extents.

    The per-bucket extents PROVE the locality property the layout buys:
    every zbucket (top 6 Morton bits) spans exactly one 32-wide range in
    BOTH dimensions (x_hi>>5 == x_lo>>5 and same for y — asserted in
    tests), so min/max file stats prune on either predicate. Production
    write path: `repartitionByRange(zkey).sortWithinPartitions(zkey)`
    then write — one layout, two pruning dimensions. All arithmetic is
    integer (`div`, shift, mask): no float quantization boundaries to
    diverge across engines.
    """
    o = load(spark, sf_dir, "orders")
    b = o.agg(
        F.min("o_custkey").alias("xmin"),
        F.max("o_custkey").alias("xmax"),
        F.min(F.floor("o_totalprice").cast("long")).alias("ymin"),
        F.max(F.floor("o_totalprice").cast("long")).alias("ymax"),
    )
    q = o.crossJoin(F.broadcast(b)).select(
        F.expr("((o_custkey - xmin) * 256) div (xmax - xmin + 1)")
        .alias("xq"),
        F.expr("((CAST(FLOOR(o_totalprice) AS BIGINT) - ymin) * 256)"
               " div (ymax - ymin + 1)").alias("yq"),
    )
    m = q.withColumn("morton", _morton_spark(F.col("xq"), F.col("yq")))
    return (
        m.groupBy(F.expr("morton div 1024").alias("zbucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("xq").alias("x_lo"), F.max("xq").alias("x_hi"),
            F.min("yq").alias("y_lo"), F.max("yq").alias("y_hi"),
        )
    )


@query(
    "q_domain_mixture",
    oracle="""
    WITH target AS (
      SELECT source, COUNT(*) AS n_avail,
             10 * (CAST(SUBSTR(source, 4) AS INT) % 4 + 1) AS n_target
      FROM documents GROUP BY source
    ), capped AS (
      SELECT source, n_avail, n_target,
             LEAST(n_avail, n_target) AS n_taken
      FROM target
    ), ranked AS (
      SELECT d.doc_id, d.source,
             row_number() OVER (
               PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn,
             c.n_taken
      FROM documents d JOIN capped c ON d.source = c.source
    )
    SELECT doc_id, source, rn, n_taken
    FROM ranked WHERE rn <= n_taken
    """,
)
def q_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset mixture construction: each source gets a target share of
    the training budget (here a per-source formula standing in for the
    mixture-weights table), capped by availability, and the selection is
    an md5-ranked deterministic draw — the "data recipe" step that turns
    a deduped corpus into a weighted training mix.

    Two phases in one plan: a tiny per-source planning aggregate
    (availability × target → quota) broadcast back into the md5-ranked
    window selection. Everything is integer/hash deterministic, so the
    same recipe reproduces bit-identically on any engine or cluster —
    rerunning a data mix must never silently change the training set.
    At scale the window sort is per-source-bounded and the quota join
    is a broadcast; swapping the formula for a real weights table keeps
    the plan identical (it stays the broadcast side).
    """
    d = load(spark, sf_dir, "documents")
    capped = (
        d.groupBy("source").agg(F.count("*").alias("n_avail"))
        .withColumn(
            "n_target",
            10 * (F.substring("source", 4, 10).cast("int") % 4 + 1))
        .withColumn("n_taken", F.least("n_avail", "n_target"))
        .select("source", "n_taken")
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .join(F.broadcast(capped), "source")
        .filter(F.col("rn") <= F.col("n_taken"))
        .select("doc_id", "source", "rn", "n_taken")
    )


@query(
    "q_table_reconcile",
    oracle="""
    WITH b AS (
      SELECT o_orderkey,
             o_orderkey * 31
             + CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cs
      FROM orders
    ),
    remote AS (
      SELECT o_orderkey,
             o_orderkey * 31
             + CAST(ROUND((o_totalprice
                           + CASE WHEN o_orderkey % 89 = 0 THEN 10.0
                                  ELSE 0.0 END) * 100) AS BIGINT) AS cs
      FROM orders WHERE o_orderkey % 97 <> 0
    ),
    ba AS (SELECT o_orderkey % 256 AS bucket, COUNT(*) AS n_local,
                  SUM(cs) AS cs_local FROM b GROUP BY 1),
    bb AS (SELECT o_orderkey % 256 AS bucket, COUNT(*) AS n_remote,
                  SUM(cs) AS cs_remote FROM remote GROUP BY 1)
    SELECT COALESCE(ba.bucket, bb.bucket) AS bucket,
           COALESCE(n_local, 0) AS n_local,
           COALESCE(n_remote, 0) AS n_remote,
           CAST(COALESCE(cs_local, 0) - COALESCE(cs_remote, 0)
                AS BIGINT) AS cs_delta
    FROM ba FULL OUTER JOIN bb ON ba.bucket = bb.bucket
    WHERE COALESCE(n_local, 0) <> COALESCE(n_remote, 0)
       OR COALESCE(cs_local, 0) <> COALESCE(cs_remote, 0)
    """,
)
def q_table_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style anti-entropy reconciliation: compare two copies of a
    100 TB table WITHOUT shipping rows — each side reduces to 256 bucket
    digests (count + additive row checksum keyed by pk % buckets), and
    only buckets whose digests disagree are emitted for row-level repair
    (the q_snapshot_diff step, now scoped to ~1/256 of the data per bad
    bucket). Network cost is O(buckets), not O(rows) — the replica-repair
    shape used by Cassandra/Dynamo-class systems, expressed as two
    partial aggregates + a tiny full-outer join. The demo's 'remote' copy
    injects deletes (pk % 97) and in-place updates (pk % 89); the row
    checksum is integer-exact arithmetic (key*31 + cents) so the oracle
    matches bit-for-bit — production would use xxhash64(struct(*)) per
    row, which is the same plan with a different leaf expression.
    Additive (commutative) digests are what make the per-bucket SUM
    partition-order-independent and partial+final aggregable."""
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    local = o.select(
        (F.col("o_orderkey") % 256).alias("bucket"),
        (F.col("o_orderkey") * 31 + cents).alias("cs"),
    )
    remote_price = F.col("o_totalprice") + F.when(
        F.col("o_orderkey") % 89 == 0, 10.0).otherwise(0.0)
    remote = (
        o.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            (F.col("o_orderkey") % 256).alias("bucket"),
            (F.col("o_orderkey") * 31
             + F.round(remote_price * 100).cast("long")).alias("cs"),
        )
    )
    da = local.groupBy("bucket").agg(
        F.count("*").alias("n_local"), F.sum("cs").alias("cs_local"))
    db = remote.groupBy("bucket").agg(
        F.count("*").alias("n_remote"), F.sum("cs").alias("cs_remote"))
    j = da.join(db, "bucket", "full_outer")
    return (
        j.select(
            "bucket",
            F.coalesce("n_local", F.lit(0)).alias("n_local"),
            F.coalesce("n_remote", F.lit(0)).alias("n_remote"),
            (F.coalesce("cs_local", F.lit(0))
             - F.coalesce("cs_remote", F.lit(0))).alias("cs_delta"),
        )
        .filter((F.col("n_local") != F.col("n_remote"))
                | (F.col("cs_delta") != 0))
    )


@query(
    "q_mixture_temperature",
    oracle="""
    WITH c AS (
      SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS n_chars
      FROM documents GROUP BY 1
    ),
    t AS (SELECT SUM(n_docs) AS total FROM c),
    w AS (
      SELECT source, n_docs, n_chars,
             CAST(n_docs AS DOUBLE) / t.total AS p,
             sqrt(CAST(n_docs AS DOUBLE) / t.total) AS u
      FROM c CROSS JOIN t
    ),
    z AS (SELECT SUM(u) AS zsum FROM w)
    SELECT source, n_docs,
           ROUND(p, 6) AS p_raw,
           ROUND(u / z.zsum, 6) AS w_temp,
           ROUND((u / z.zsum) / p, 6) AS upsample_factor
    FROM w CROSS JOIN z
    """,
)
def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture reweighting (τ=2, i.e. w_i ∝ p_i^(1/τ)
    = √p_i) — the multilingual/multi-domain rebalancing rule (mT5/XLM-R
    style): raw corpus shares are flattened toward uniform so
    low-resource sources are seen more often than their byte share,
    without fully equalizing. Emits per source the raw share, the
    tempered sampling weight, and the implied upsample factor (>1 =
    oversample). Two 1-row broadcast dimensions (corpus total,
    normalizer Σ√p) around a |sources|-row aggregate — driver-safe at
    any scale; composes with q_domain_mixture (which consumes a weights
    table) and q_class_upsample (which materializes the replication)."""
    c = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars"))
    )
    t = c.agg(F.sum("n_docs").alias("total"))
    w = (
        c.crossJoin(F.broadcast(t))
        .withColumn("p", F.col("n_docs").cast("double") / F.col("total"))
        .withColumn("u", F.sqrt(F.col("p")))
    )
    z = w.agg(F.sum("u").alias("zsum"))
    return (
        w.crossJoin(F.broadcast(z))
        .select(
            "source", "n_docs",
            F.round("p", 6).alias("p_raw"),
            F.round(F.col("u") / F.col("zsum"), 6).alias("w_temp"),
            F.round((F.col("u") / F.col("zsum")) / F.col("p"), 6)
            .alias("upsample_factor"),
        )
    )


@query(
    "q_pseudonymize",
    oracle="""
    WITH s AS (
      SELECT c_custkey,
             sha256(CAST(c_custkey AS VARCHAR) || ':' || c_name) AS sid,
             c_mktsegment
      FROM customer
    ), j AS (
      SELECT s.c_mktsegment, s.sid
      FROM orders o JOIN s ON o.o_custkey = s.c_custkey
    )
    SELECT s.c_mktsegment AS segment,
           COUNT(*) AS n_customers,
           COUNT(DISTINCT s.sid) AS n_sids,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM j
            WHERE j.c_mktsegment = s.c_mktsegment) AS n_orders,
           MIN(s.sid) AS spot_sid
    FROM s GROUP BY 1
    """,
)
def q_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII pseudonymization with referential integrity: customers get a
    deterministic sha-256 surrogate id (salt = natural key + name, so
    re-runs and other tables derive the SAME surrogate without a shared
    mapping table), and orders join through the surrogate. Per segment:
    n_sids == n_customers proves collision-freedom at this scale, and
    n_orders matches the natural-key join — the property a training
    pipeline needs before dropping the raw identifiers. The hash is a
    per-row projection (no shuffle added); the orders join keeps the
    same custkey equi-join shape Catalyst already plans, so
    pseudonymizing changes NOTHING about the physical plan at 100 TB."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.sha2(F.concat(F.col("c_custkey").cast("string"),
                        F.lit(":"), F.col("c_name")), 256).alias("sid"),
        "c_mktsegment",
    )
    o = load(spark, sf_dir, "orders").select("o_custkey")
    j = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"))
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.countDistinct("sid").alias("n_sids"),
            F.min("sid").alias("spot_sid"),
        )
        .join(j, "c_mktsegment")
        .select(
            F.col("c_mktsegment").alias("segment"),
            "n_customers", "n_sids", "n_orders", "spot_sid",
        )
    )


@query(
    "q_k_anonymity",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
      FROM customer GROUP BY 1, 2
    )
    SELECT c_nationkey, c_mktsegment,
           CASE WHEN n >= 5 THEN n END AS n_released,
           CASE WHEN n < 5 THEN 'suppressed' ELSE 'released' END AS status
    FROM g
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity cell suppression (k = 5) over the quasi-identifier
    pair (nation, segment): groups smaller than k have their count
    withheld (NULL) and are marked suppressed — the standard privacy
    gate before releasing grouped statistics of a training corpus. One
    partial+final hash aggregate; the suppression predicate is a per-row
    projection on the |nations|×|segments| aggregate, so the release
    table is dimension-bounded regardless of corpus size."""
    g = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    return g.select(
        "c_nationkey", "c_mktsegment",
        F.when(F.col("n") >= 5, F.col("n")).alias("n_released"),
        F.when(F.col("n") < 5, F.lit("suppressed"))
        .otherwise("released").alias("status"),
    )


@query(
    "q_l_diversity",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
             COUNT(DISTINCT CAST(FLOOR(c_acctbal / 2000) AS BIGINT))
               AS n_sensitive
      FROM customer GROUP BY 1, 2
    )
    SELECT c_nationkey, c_mktsegment,
           CASE WHEN n >= 5 AND n_sensitive >= 3 THEN n END AS n_released,
           CASE WHEN n < 5 THEN 'suppressed_k'
                WHEN n_sensitive < 3 THEN 'suppressed_l'
                ELSE 'released' END AS status
    FROM g
    """,
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity on top of k-anonymity (k = 5, l = 3): a
    quasi-identifier cell is releasable only if it ALSO contains ≥ l
    distinct values of the sensitive attribute (here the account-balance
    band) — the guard against homogeneity attacks, where a k-anonymous
    cell still leaks because every member shares the sensitive value.
    Cells failing each criterion are marked separately (suppressed_k vs
    suppressed_l) so the privacy audit shows WHICH gate fired. One
    partial+final aggregate with a distinct-count (Expand) — still
    dimension-bounded output regardless of corpus size."""
    g = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct(
                F.floor(F.col("c_acctbal") / 2000).cast("long"))
            .alias("n_sensitive"),
        )
    )
    return g.select(
        "c_nationkey", "c_mktsegment",
        F.when((F.col("n") >= 5) & (F.col("n_sensitive") >= 3), F.col("n"))
        .alias("n_released"),
        F.when(F.col("n") < 5, F.lit("suppressed_k"))
        .when(F.col("n_sensitive") < 3, F.lit("suppressed_l"))
        .otherwise("released").alias("status"),
    )


@query(
    "q_term_redact",
    oracle="""
    WITH r AS (
      SELECT doc_id,
             len(regexp_extract_all(text,
                 '\\b(customer|key|value)\\b')) AS n_redacted,
             regexp_replace(text, '\\b(customer|key|value)\\b',
                            '[MASK]', 'g') AS red
      FROM documents
    )
    SELECT doc_id, CAST(n_redacted AS BIGINT) AS n_redacted,
           md5(red) AS red_fp
    FROM r WHERE n_redacted > 0
    """,
)
def q_term_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist term redaction: occurrences of governed terms (here a
    3-word demo lexicon; production swaps in the compliance blocklist)
    are replaced with [MASK], emitting per-document hit counts and a
    fingerprint of the redacted text for downstream verification. The
    lexicon compiles into ONE alternation regex evaluated per row in
    codegen — no join, no shuffle, no Python; at 100 TB a large lexicon
    becomes an Aho-Corasick pandas UDF or a broadcast token join, but
    the regex form covers compliance lists (10²–10³ terms) as-is."""
    pat = r"\b(customer|key|value)\b"
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(pat), 0))
        .cast("long").alias("n_redacted"),
        F.md5(F.regexp_replace("text", pat, "[MASK]")).alias("red_fp"),
    )
    return d.filter(F.col("n_redacted") > 0)


def observed_quality_gate(spark: SparkSession, sf_dir: str):
    """Single-pass pipeline instrumentation via ``DataFrame.observe``:
    gate-level counters (rows seen, rows passing each gate) accumulate
    INSIDE the filtering job itself — CollectMetricsExec folds them per
    task and merges on the driver, so the funnel report costs ZERO extra
    scans/jobs, unlike the q_filter_funnel audit query which is itself a
    (single-scan) aggregate job. This is how a 100 TB curation run
    reports its own selectivity for free. Returns (result_df, Observation);
    ``obs.get`` blocks until the first action on the result executes."""
    from pyspark.sql import Observation

    obs = Observation("quality_gate")
    pass_len = F.col("n_chars") >= 100
    pass_lang = F.col("lang").isin("en", "de")
    gated = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_seen"),
            F.sum(pass_len.cast("long")).alias("n_pass_len"),
            F.sum((pass_len & pass_lang).cast("long")).alias("n_pass_both"),
        )
    )
    return gated.filter(pass_len & pass_lang), obs


@query(
    "q_observed_gate",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE n_chars >= 100 AND lang IN ('en', 'de')
    """,
)
def q_observed_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The observed quality gate's result relation (oracle-checked); the
    observe() metrics side-channel — per-gate pass counts collected in
    the same job, no extra scan — is pinned by
    tests/test_governance_graph.py::test_observed_gate_metrics."""
    out, _ = observed_quality_gate(spark, sf_dir)
    return out
