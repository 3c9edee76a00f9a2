"""Extended aggregate surface: GROUPING SETS, arg-min/max, ordered string
aggregation, conditional/boolean aggregates, fixed-width histograms, and a
Datasketches-compatible HLL sketch.

These extend SURVEY.md §2.D (the reference's keyed-aggregation family —
[FLINK-API `KeyedStream#sum/min/max/reduce`] generalizes to arbitrary
accumulator shapes via `AggregateFunction`) with the aggregate forms a
100 TB corpus-audit pipeline leans on. All but the HLL sketch are pure
Catalyst single-pass hash aggregates — partial (map-side) + final, one
shuffle on the group key, no Python anywhere.

Scale notes:
- GROUPING SETS expands to an `Expand` node (one input row → one row per
  grouping set) BEFORE the shuffle; with 3 sets the shuffle triples. That
  is still one pass over the fact table — strictly better than 3 queries.
- `min_by`/`max_by` are single-accumulator aggregates (no sort, no
  window): the right tool for "row with the extreme value per group" at
  scale — contrast `q_topk_per_group`, which pays a full partition sort.
- The HLL sketch (`hll_sketch_agg`) is mergeable state: partial sketches
  combine associatively across partitions/days, which is what makes
  distinct-count rollups over 100 TB feasible (store sketches, not IDs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_tutorial_broadcast_spark.io import load
from flink_tutorial_broadcast_spark.registry import query


@query(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_rf,
           CAST(grouping(l_linestatus) AS INT) AS g_ls,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() flags (D5 beyond rollup/cube).

    SQL entry (lifecycle B): parser → Expand node → single hash aggregate.
    The grouping() flags disambiguate "NULL because super-aggregate row"
    from "NULL because the data had NULL" — required for correct rollup
    consumers downstream.
    """
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_rf,
               CAST(grouping(l_linestatus) AS INT) AS g_ls,
               COUNT(*) AS n,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
    """)


@query(
    "q_minmax_by",
    oracle="""
    SELECT c_nationkey,
           arg_min(c_name, lpad(CAST(CAST(ROUND((c_acctbal + 1000) * 100)
                                          AS BIGINT) AS VARCHAR), 10, '0')
                           || lpad(CAST(c_custkey AS VARCHAR), 10, '0'))
             AS poorest,
           arg_max(c_name, lpad(CAST(CAST(ROUND((c_acctbal + 1000) * 100)
                                          AS BIGINT) AS VARCHAR), 10, '0')
                           || lpad(CAST(c_custkey AS VARCHAR), 10, '0'))
             AS richest,
           ROUND(MIN(c_acctbal), 2) AS min_bal,
           ROUND(MAX(c_acctbal), 2) AS max_bal
    FROM customer GROUP BY c_nationkey
    """,
)
def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-min/arg-max: the customer holding each nation's extreme balance.

    One hash aggregate, no sort, no window — the scalable form of "row
    with the extreme value per group". The ordering value is a fixed-width
    sortable string (cents-scaled balance offset to non-negative, then
    custkey as tiebreaker) because (a) ties on raw c_acctbal exist at
    sf0.1, making bare min_by nondeterministic, and (b) DuckDB 1.0's
    arg_min lacks struct-valued orderings — lexicographic-equals-numeric
    encoding is the portable composite-key idiom.
    """
    c = load(spark, sf_dir, "customer")
    sort_key = F.concat(
        F.lpad(F.round((F.col("c_acctbal") + 1000) * 100)
               .cast("long").cast("string"), 10, "0"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0"),
    )
    return c.groupBy("c_nationkey").agg(
        F.min_by("c_name", sort_key).alias("poorest"),
        F.max_by("c_name", sort_key).alias("richest"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


@query(
    "q_string_agg",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           string_agg(lpad(CAST(doc_id AS VARCHAR), 8, '0'), ','
                      ORDER BY lpad(CAST(doc_id AS VARCHAR), 8, '0'))
             AS doc_ids
    FROM documents GROUP BY lang
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg) per language.

    zero-padded ids make lexicographic order == numeric order, so
    `array_sort(collect_list(...))` here and `ORDER BY` in the oracle
    produce byte-identical strings. collect_list is bounded by group
    cardinality — fine for per-lang rollups, NOT for unbounded groups.
    """
    d = load(spark, sf_dir, "documents")
    padded = F.lpad(F.col("doc_id").cast("string"), 8, "0")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.concat_ws(",", F.array_sort(F.collect_list(padded)))
         .alias("doc_ids"),
    )


@query(
    "q_count_if_bool",
    oracle="""
    SELECT event_type,
           CAST(count_if(value > 500) AS BIGINT) AS n_high,
           bool_and(value >= 0)   AS all_nonneg,
           bool_or(value > 990)   AS any_extreme,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_count_if_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional and boolean aggregates: count_if / bool_and / bool_or.

    The corpus-audit workhorses ("how many docs violate X", "does every
    shard satisfy Y") as single-pass aggregates instead of N filtered
    sub-queries.
    """
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 500).alias("n_high"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 990).alias("any_extreme"),
        F.count("*").alias("n"),
    )


@query(
    "q_histogram",
    oracle="""
    SELECT CAST(FLOOR(value / 100) AS INT) AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(value), 2) AS lo,
           ROUND(MAX(value), 2) AS hi
    FROM events GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values (width-100 buckets).

    floor-division bucketing instead of `width_bucket` for engine
    portability (DuckDB 1.0 lacks width_bucket). One hash aggregate;
    bucket count is bounded by the value range, not the row count, so the
    result stays tiny at any scale.
    """
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.col("value") / 100).cast("int").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 2).alias("lo"),
        F.round(F.max("value"), 2).alias("hi"),
    )


@query("q_hll_sketch")  # rows-only: sketch estimate differs from exact by design
def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache Datasketches HLL distinct-user sketch per event type.

    Unlike `approx_count_distinct` (HyperLogLog++ fused into one agg),
    `hll_sketch_agg` exposes the SKETCH as a mergeable binary value: at
    100 TB you persist per-partition/per-day sketches and fold them with
    `hll_union_agg` for any rollup without re-touching raw data. Since
    round 12 the ±max(2, 5%)-of-exact tolerance is WITNESSED in-engine
    as `within_5pct_of_exact` (exact count-distinct in the same agg) —
    the driver's rows-only pass sees the bound, not just the row count.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch"),
             F.count_distinct("user_id").alias("__exact"))
        .select(
            "event_type",
            F.hll_sketch_estimate("sketch").cast("long").alias("approx_users"),
            "__exact")
        .select(
            "event_type", "approx_users",
            (F.abs(F.col("approx_users") - F.col("__exact"))
             <= F.greatest(F.lit(2.0), 0.05 * F.col("__exact")))
            .alias("within_5pct_of_exact"))
    )


@query(
    "q_incremental_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-view-maintenance pattern: per-day PARTIAL aggregates
    merged into the final result — proved identical (by the oracle hash)
    to the direct one-shot aggregate.

    This is how a 100 TB rollup actually runs: each day's partition
    computes (key, count, sum) partials once at ingest; any later query
    folds partials instead of re-touching raw events. COUNT/SUM merge as
    SUM-of-partials (associative+commutative); the same shape carries
    avg (sum,count), variance (n, Σx, Σx²), and HLL sketches
    (q_hll_sketch) — every accumulator the engine exposes is mergeable,
    which is the property that makes incremental maintenance exact, not
    approximate.
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count("*").alias("pn"), F.sum("value").alias("psum"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.round(F.sum("psum"), 2).alias("sum_value"),
        )
    )


@query(
    "q_median_mode",
    oracle="""
    WITH c AS (
      SELECT l_returnflag AS rf, l_quantity AS q, COUNT(*) AS n
      FROM lineitem GROUP BY 1, 2
    ),
    r AS (
      SELECT rf, q,
             row_number() OVER (PARTITION BY rf ORDER BY n DESC, q) AS rn
      FROM c
    ),
    m AS (
      SELECT l_returnflag AS rf, median(l_quantity) AS median_qty
      FROM lineitem GROUP BY 1
    )
    SELECT m.rf, m.median_qty, r.q AS mode_qty
    FROM m JOIN r ON m.rf = r.rf AND r.rn = 1
    """,
)
def q_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + DETERMINISTIC mode per group.

    Bare `mode()` is nondeterministic under frequency ties in both Spark
    and DuckDB, so the mode here is pinned as "smallest most-frequent
    value": count per (group, value), then row_number over
    (n DESC, value ASC). Median interpolates (a+b)/2 on an even count —
    exact in doubles for integral quantities, so no rounding is needed.

    Scale: the mode path aggregates to |group|x|distinct values| rows
    BEFORE any sort — the window runs on the tiny counted relation, never
    on the fact table. Exact median is the expensive one (full sort per
    group under the hood); q_approx_quantiles is the 100 TB substitute.
    """
    li = load(spark, sf_dir, "lineitem")
    counts = (li.groupBy(F.col("l_returnflag").alias("rf"),
                         F.col("l_quantity").alias("q"))
              .agg(F.count("*").alias("n")))
    w = Window.partitionBy("rf").orderBy(F.col("n").desc(), F.col("q"))
    modes = (counts.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") == 1)
             .select("rf", F.col("q").alias("mode_qty")))
    medians = (li.groupBy(F.col("l_returnflag").alias("rf"))
               .agg(F.median("l_quantity").alias("median_qty")))
    return medians.join(modes, "rf")


@query(
    "q_bit_aggs",
    oracle="""
    SELECT l_returnflag,
           bit_and(l_suppkey)    AS and_supp,
           bit_or(l_linenumber)  AS or_line,
           bit_xor(l_partkey)    AS xor_part
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_bit_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates — order-independent, mergeable
    single-word accumulators (commutative+associative like SUM), so they
    combine map-side with zero extra shuffle cost; XOR over a key column
    doubles as a cheap set-symmetric-difference fingerprint.
    """
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.bit_and("l_suppkey").alias("and_supp"),
             F.bit_or("l_linenumber").alias("or_line"),
             F.bit_xor("l_partkey").alias("xor_part"))
    )


@query(
    "q_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 2)
             AS w_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price: SUM(x*w)/SUM(w) — two ordinary
    SUM accumulators, one map-side-combined shuffle; the division happens
    once per group AFTER aggregation (never per row)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                     / F.sum("l_quantity"), 2).alias("w_avg_price"))
    )


@query(
    "q_profile",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT lang)   AS n_langs,
           COUNT(DISTINCT source) AS n_sources,
           CAST(SUM(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_empty_text,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           CAST(FLOOR(AVG(n_chars) * 100) AS BIGINT) AS avg_chars_c
    FROM documents
    """,
)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-profiling summary of the documents table: row
    count, per-column cardinalities, empty-text count, and n_chars
    range/mean — the DESCRIBE/summary() shape as an oracle-checked query.

    One scan, one scalar aggregate; the COUNT(DISTINCT)s expand to a
    two-phase distinct-agg but stay map-side-partial. At 100 TB the
    distinct counts swap to HLL sketches (q_hll_sketch) — same shape,
    mergeable state. AVG of exact ints is floored at 2 dp via the
    engine-stable FLOOR-on-exact-division trick.
    """
    d = load(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(F.when(F.col("text").isNull() | (F.col("text") == ""), 1)
              .otherwise(0)).alias("n_empty_text"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.floor(F.avg("n_chars") * 100).cast("long").alias("avg_chars_c"),
    )


@query(
    "q_histogram_equidepth",
    oracle="""
    WITH t AS (
      SELECT o_totalprice AS v,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    SELECT bucket, COUNT(*) AS n,
           ROUND(MIN(v), 2) AS lo, ROUND(MAX(v), 2) AS hi
    FROM t GROUP BY bucket
    """,
)
def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (decile buckets of o_totalprice): every
    bucket holds the same row count and reports its value range —
    complements the fixed-width q_histogram. Order is pinned by the
    unique (price, orderkey) pair so bucket boundaries are deterministic.

    The global ntile is EXECUTED two-phase (two_phase.global_order for
    the exact global row number, then ntile_from_rn arithmetic against
    the broadcast row count) — the ntile here runs over the FULL fact
    table, so the unpartitioned-sort form would be the canonical 100 TB
    scale-killer; this plan has no unpartitioned WindowExec (CI-guarded
    in plans/audit.py). The approximate sibling (approx_percentile
    edges + width_bucket) remains q_approx_quantiles."""
    from .two_phase import global_order, ntile_from_rn

    t = (load(spark, sf_dir, "orders")
         .select(F.col("o_totalprice").alias("v"), "o_orderkey"))
    ranked = global_order(t, F.col("v"), ["o_orderkey"])
    n_rows = t.agg(F.count("*").alias("__n"))
    bucketed = (
        ranked.crossJoin(F.broadcast(n_rows))
        .withColumn("bucket", ntile_from_rn(F.col("rn"), F.col("__n"), 10))
    )
    return (bucketed.groupBy("bucket")
            .agg(F.count("*").alias("n"),
                 F.round(F.min("v"), 2).alias("lo"),
                 F.round(F.max("v"), 2).alias("hi")))


@query(
    "q_collect_set",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',')
             AS types,
           COUNT(DISTINCT event_type) AS n_types
    FROM events GROUP BY user_id
    """,
)
def q_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-valued aggregate: each user's distinct event types collected,
    SORTED, and serialized — collect_set's nondeterministic order is
    pinned with sort_array, and the array is string-joined because
    array-valued result columns don't canonicalize identically across
    engine client libraries (same discipline as the ordered inverted-
    index postings, L35). Single hash aggregate; set size is bounded by
    the type domain, not the row count."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("event_type")), ","
            ).alias("types"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )


@query(
    "q_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice AS price,
             CAST(l_quantity AS BIGINT) AS wt,
             SUM(CAST(l_quantity AS BIGINT))
               OVER (PARTITION BY l_returnflag
                     ORDER BY l_extendedprice, l_orderkey, l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_wt,
             SUM(CAST(l_quantity AS BIGINT))
               OVER (PARTITION BY l_returnflag) AS tot_wt
      FROM lineitem
    )
    SELECT l_returnflag, ROUND(MIN(price), 2) AS weighted_median,
           CAST(MIN(tot_wt) AS BIGINT) AS total_weight
    FROM w
    WHERE 2 * cum_wt >= tot_wt
    GROUP BY l_returnflag
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (lower): the price at which half the total
    QUANTITY sits at-or-below — robust central price where each row
    counts by its weight, not once. Cumulative-weight window over a
    totally-ordered sort (price, orderkey, linenumber), then the first
    row crossing half the integer weight total. Weights are int64, so
    the crossing point is engine-exact; only the reported price is
    float (rounded). Same single Exchange serves both windows."""
    li = load(spark, sf_dir, "lineitem")
    wsort = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy("l_returnflag")
    w = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.sum(F.col("l_quantity").cast("long")).over(wsort).alias("cum_wt"),
        F.sum(F.col("l_quantity").cast("long")).over(wall).alias("tot_wt"),
    )
    return (
        w.filter(2 * F.col("cum_wt") >= F.col("tot_wt"))
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("price"), 2).alias("weighted_median"),
            F.min("tot_wt").alias("total_weight"),
        )
    )


@query(
    "q_pareto_abc",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem GROUP BY l_partkey
    ), ranked AS (
      SELECT l_partkey, cents,
             SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cum_cents,
             SUM(cents) OVER () AS tot_cents
      FROM rev
    )
    SELECT CASE WHEN cum_cents * 100 <= tot_cents * 70 THEN 'A'
                WHEN cum_cents * 100 <= tot_cents * 90 THEN 'B'
                ELSE 'C' END AS abc_class,
           COUNT(*) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS class_cents
    FROM ranked GROUP BY 1
    """,
)
def q_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC inventory classification: rank parts by revenue and
    split at 70% / 90% of cumulative revenue — the 80/20 report behind
    catalog pruning and hot-set caching decisions. Exactness trick:
    per-row revenue floors to integer CENTS before summing, so per-part
    totals, the ranking order, and the class thresholds (compared via
    integer cross-multiplication, never division) are all int64 — a
    float sum here could flip the order of two near-equal parts and
    shift every downstream class boundary. One partkey aggregate, then
    the cumulative revenue is EXECUTED two-phase
    (two_phase.global_order with a running sum: deterministic value
    buckets + broadcast prefix-sum of per-bucket cents + bucket-local
    cumulative window) — no unpartitioned WindowExec (CI-guarded in
    plans/audit.py); the integer offsets keep the sum exact int64. The
    grand total is a broadcast 1-row dim, not a global window."""
    from .two_phase import global_order

    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
        .alias("cents")
    )
    cum = global_order(
        rev, -F.col("cents"), ["l_partkey"],
        running_sums={"cum_cents": F.col("cents")},
    )
    tot = rev.agg(F.sum("cents").alias("tot_cents"))
    ranked = cum.crossJoin(F.broadcast(tot))
    return (
        ranked.select(
            F.when(
                F.col("cum_cents") * 100 <= F.col("tot_cents") * 70, "A"
            ).when(
                F.col("cum_cents") * 100 <= F.col("tot_cents") * 90, "B"
            ).otherwise("C").alias("abc_class"),
            "cents",
        )
        .groupBy("abc_class")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("cents").alias("class_cents"),
        )
    )


@query(
    "q_percentile_disc",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           ROUND(MIN(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT)
                          THEN value END), 2) AS p50_disc,
           ROUND(MIN(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT)
                          THEN value END), 2) AS p90_disc,
           MIN(n) AS n
    FROM ranked GROUP BY event_type
    """,
)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles (type-1 quantile): the value at row
    ceil(p·n) of the sorted group — always an actual data point, never
    an interpolation (the right choice for latency SLOs and any column
    where "a value that never occurred" is meaningless). Engine quantile
    functions disagree on discrete definitions, so both sides spell the
    SAME row-pick formula: rank over a total order, select rank
    ceil(p·n) — integer arithmetic end to end, value reported as-is."""
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = load(spark, sf_dir, "events").select(
        "event_type", "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    pick = lambda p: F.round(  # noqa: E731
        F.min(
            F.when(
                F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("long"),
                F.col("value"),
            )
        ), 2,
    )
    return ranked.groupBy("event_type").agg(
        pick(0.5).alias("p50_disc"),
        pick(0.9).alias("p90_disc"),
        F.min("n").alias("n"),
    )
