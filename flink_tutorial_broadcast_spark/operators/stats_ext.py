"""Statistical / vector aggregate extensions: nth_value windows, linear
regression aggregates, per-key Shannon entropy, and per-label embedding
centroids.

These extend SURVEY.md §2.D/F with the audit statistics a training-data
pipeline computes fleet-wide: regression aggregates for drift checks,
entropy for behavioral-diversity scoring, and centroids as the training
step of IVF-style ANN partitioning (the scale path behind `q_knn_ivf`).
All pure Catalyst; the centroid op turns the array column into long form
with `posexplode` — shuffle rows = vectors × dims, but each row is 20
bytes, and the result is bounded by labels × dims regardless of corpus
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from flink_tutorial_broadcast_spark.registry import query


@query(
    "q_nth_value",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(nth_value(o_totalprice, 3)
                 OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING), 2)
             AS third_order_price
    FROM orders
    """,
)
def q_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value window: each order annotated with its customer's 3rd
    order total (NULL for customers with <3 orders).

    Full-partition ROWS frame spelled out on both engines — nth_value
    under the default RANGE frame can't see rows after the current one,
    which silently NULLs early rows; the explicit frame is the portable
    spelling. Ordering (o_orderdate, o_orderkey) is unique.
    """
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.round(F.nth_value("o_totalprice", 3).over(w), 2)
         .alias("third_order_price"),
    )


@query(
    "q_linreg",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4)
             AS intercept,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates: price-vs-quantity slope/intercept
    per return flag — single-pass, partial-aggregatable moments (the
    same accumulator shape as a Flink `AggregateFunction`, SURVEY §2.D2,
    but fused into Catalyst's hash aggregate).
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4)
         .alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4)
         .alias("intercept"),
        F.count("*").alias("n"),
    )


@query(
    "q_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS k
      FROM events GROUP BY 1, 2
    ), t AS (
      SELECT user_id, SUM(k) AS n FROM c GROUP BY 1
    )
    SELECT c.user_id,
           ROUND(-SUM((c.k * 1.0 / t.n) * ln(c.k * 1.0 / t.n)), 4)
             AS entropy,
           CAST(MIN(t.n) AS BIGINT) AS n_events
    FROM c JOIN t ON c.user_id = t.user_id
    GROUP BY c.user_id
    """,
)
def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix — the behavioral-
    diversity score (bots ≈ 0; uniform browsers ≈ ln 5).

    Two narrow aggregates joined on user_id (counts, then totals) —
    both shuffles carry (key, long) pairs only. The same shape scores
    token-distribution diversity per document at corpus scale.
    """
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("k"))
    t = c.groupBy("user_id").agg(F.sum("k").alias("n"))
    p = F.col("k") / F.col("n")
    return (
        c.join(t, "user_id")
        .groupBy("user_id")
        .agg(
            F.round(-F.sum(p * F.log(p)), 4).alias("entropy"),
            F.min("n").cast("long").alias("n_events"),
        )
    )


@query(
    "q_embed_centroid",
    oracle="""
    SELECT label,
           CAST(i.range AS INT) AS pos,
           ROUND(AVG(embedding[CAST(i.range AS INT) + 1]), 4) + 0.0
             AS centroid
    FROM embeddings, range(64) i
    GROUP BY label, i.range
    """,
)
def q_embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids in long form (label, dim, mean) —
    the training step of IVF partitioning: centroids define the coarse
    cells that `q_knn_ivf` probes, and the long-form groupBy is how you
    compute them without ever materializing a dense matrix per executor.

    posexplode ≡ DuckDB's range-subscript join (1-based there, 0-based
    here — the oracle shifts the index, both emit 0-based `pos`).
    """
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("x"), 4).alias("centroid"))
    )


@query(
    "q_embed_quantile_norm",
    oracle="""
    WITH long AS (
      SELECT label, CAST(i.range AS INT) AS dim,
             embedding[CAST(i.range AS INT) + 1] AS val
      FROM embeddings, range(8) i
    ), r AS (
      SELECT label, dim,
             percent_rank() OVER (PARTITION BY dim ORDER BY val) AS pr
      FROM long
    )
    SELECT label, dim, ROUND(AVG(pr), 4) AS avg_rank
    FROM r GROUP BY label, dim
    """,
)
def q_embed_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile (rank) normalization of embedding dimensions: replace
    each raw value by its percent_rank within the dimension, then report
    the per-label mean rank for the first 8 dims — the distribution-free
    check for label separation, robust to per-dimension scale drift.

    Long-form posexplode ≡ the oracle's range-subscript join; the rank
    needs one sort per dimension (PARTITION BY dim), which at 100 TB
    becomes a repartitionByRange on (dim, val) — 64 independent sorts,
    no global order. percent_rank is a pure rank ratio (k-1)/(n-1), so
    equal float inputs give identical ranks on both engines regardless
    of tie order.
    """
    e = load(spark, sf_dir, "embeddings")
    long = (
        e.select("label", F.posexplode("embedding").alias("dim", "val"))
        .filter(F.col("dim") < 8)
    )
    w = Window.partitionBy("dim").orderBy("val")
    return (
        long.withColumn("pr", F.percent_rank().over(w))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("pr"), 4).alias("avg_rank"))
    )


@query(
    "q_autocorr",
    oracle="""
    WITH s AS (
      SELECT user_id, value,
             lag(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS pv
      FROM events
    )
    SELECT user_id, ROUND(corr(value, pv), 4) AS ac1,
           COUNT(pv) AS n_pairs
    FROM s GROUP BY user_id
    HAVING COUNT(pv) >= 10
    """,
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each user's value series — the
    is-this-series-random diagnostic (≈0 for independent draws). lag()
    and the corr aggregate share one user_id Exchange; corr is a
    single-pass moment aggregate (partial-mergeable, same accumulator
    family as q_linreg). Users with <10 pairs are dropped on both
    engines — tiny samples make corr numerically touchy AND
    statistically meaningless."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = load(spark, sf_dir, "events").select(
        "user_id", "value", F.lag("value").over(w).alias("pv")
    )
    return (
        s.groupBy("user_id")
        .agg(
            F.round(F.corr("value", "pv"), 4).alias("ac1"),
            F.count("pv").alias("n_pairs"),
        )
        .filter(F.col("n_pairs") >= 10)
    )


@query(
    "q_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS m
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_type,
             quantile_cont(ABS(e.value - med.m), 0.5) AS mad
      FROM events e JOIN med ON e.event_type = med.event_type
      GROUP BY e.event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN ABS(e.value - med.m) > 3 * dev.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(MIN(med.m), 4) AS median_value,
           ROUND(MIN(dev.mad), 4) AS mad
    FROM events e
    JOIN med ON e.event_type = med.event_type
    JOIN dev ON e.event_type = dev.event_type
    GROUP BY e.event_type
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation: flag
    values > 3·MAD from their group median. Unlike the z-score gate
    (q_anomaly_zscore), MAD doesn't let the outliers inflate their own
    threshold — the robust-statistics twin the data-quality audit
    reaches for on heavy-tailed columns.

    Three passes over the fact (median → MAD → flag-count), each a tiny
    per-type aggregate broadcast back. Exact interpolated medians keep
    the oracle exact; at 100 TB both medians switch to
    approx_percentile sketches (single pass each, mergeable)."""
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("m")
    )
    dev = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("m")), F.lit(0.5))
            .alias("mad")
        )
    )
    return (
        ev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(dev), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("m"))
                    > 3 * F.col("mad"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
            F.round(F.min("m"), 4).alias("median_value"),
            F.round(F.min("mad"), 4).alias("mad"),
        )
    )


@query(
    "q_benford",
    oracle="""
    WITH d AS (
      SELECT substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                    1, 1) AS digit
      FROM orders WHERE o_totalprice >= 1
    )
    SELECT digit, COUNT(*) AS n,
           CAST(FLOOR(COUNT(*) * 1000000.0
                      / SUM(COUNT(*)) OVER ()) AS BIGINT) AS share_ppm
    FROM d GROUP BY digit
    """,
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit: the distribution of leading digits of
    order totals — the classic forensic screen for fabricated or
    re-scaled monetary data (natural multi-scale amounts follow
    log10(1+1/d); uniform digits scream synthetic). One digit-extract
    map + tiny aggregate; shares as FLOOR'd integer ppm over a
    whole-relation window sum."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        ).alias("digit")
    )
    counts = d.groupBy("digit").agg(F.count("*").alias("n"))
    w = Window.partitionBy()
    return counts.select(
        "digit", "n",
        F.floor(F.col("n") * 1000000.0 / F.sum("n").over(w))
        .cast("long").alias("share_ppm"),
    )


@query(
    "q_psi_drift",
    oracle="""
    WITH binned AS (
      SELECT LEAST(9, GREATEST(0, CAST(FLOOR(value / 50.0) AS INTEGER)))
               AS bin,
             substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '8' AS is_a
      FROM events
    ),
    counts AS (
      SELECT bin,
             CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
      FROM binned GROUP BY 1
    ),
    tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM counts)
    SELECT bin, n_a, n_b,
           ROUND((CAST(n_a + 1 AS DOUBLE) / (ta + 10)
                  - CAST(n_b + 1 AS DOUBLE) / (tb + 10))
                 * ln((CAST(n_a + 1 AS DOUBLE) / (ta + 10))
                      / (CAST(n_b + 1 AS DOUBLE) / (tb + 10))), 6)
             AS psi_term
    FROM counts CROSS JOIN tot
    """,
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two deterministic md5 halves
    of events.value — the standard train/serve (or week-over-week)
    drift monitor for feature pipelines: bin the feature on FIXED edges
    (10 × width-50 bins, clamped — edges must never be data-dependent or
    the two populations bin differently), Laplace-smooth (+1 per bin) so
    empty bins stay finite, and emit each bin's signed PSI contribution;
    Σ|psi_term| < 0.1 is the usual 'stable' gate. One scan, one 10-row
    aggregate, totals as a broadcast 1-row dimension — nothing here
    scales with row count except the first partial aggregate. The md5
    split stands in for the real-world 'two snapshots' input and makes
    the oracle exactly reproducible."""
    ev = load(spark, sf_dir, "events")
    binned = ev.select(
        F.least(F.lit(9), F.greatest(F.lit(0), F.floor(
            F.col("value") / 50.0).cast("int"))).alias("bin"),
        (F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) < "8")
        .alias("is_a"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("is_a"), 0).otherwise(1)).cast("long")
        .alias("n_b"),
    )
    tot = counts.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    pa = (F.col("n_a") + 1).cast("double") / (F.col("ta") + 10)
    pb = (F.col("n_b") + 1).cast("double") / (F.col("tb") + 10)
    return (
        counts.crossJoin(F.broadcast(tot))
        .select("bin", "n_a", "n_b",
                F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_term"))
    )
