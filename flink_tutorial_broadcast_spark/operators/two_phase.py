"""Two-phase global ordering: rank / running-sum over a total order
WITHOUT an unpartitioned WindowExec.

An unpartitioned ordered window (`Window.orderBy(...)` with no
partitionBy) requires AllTuples distribution — Spark moves the ENTIRE
input through one partition. Correct at fixture scale, a scale-killer at
100 TB. The rewrite used here (same shape as q_pack_sequences and
dataset_ops._md5_prefix_positions):

  Phase 0 — one bounded 1-row collect of (min, max) of the sort value;
            derive a DETERMINISTIC monotone equal-width bucket id
            (floor((v - min) * B / span)). No sampling, so recomputation
            cannot drift the way repartitionByRange boundaries can, and
            equal sort values always share a bucket (order-consistent).
  Phase 1 — per-bucket COUNT (+ per-bucket totals of any running-sum
            measures): a ≤B-row aggregate collected to the driver and
            prefix-summed into exclusive offsets (the same bounded-
            collect pattern as the kNN probe dim).
  Phase 2 — a bucket-PARTITIONED window computes the local row_number /
            running sums in parallel; adding the broadcast offsets
            yields the exact global values.

Equal-width buckets balance only as well as the value distribution, but
correctness never depends on balance; at 100 TB raise `n_buckets` or
derive edges from approx_percentile instead (monotone-deterministic
given the data either way). Used by q_gini / q_pareto_abc / q_rfm /
q_histogram_equidepth (SURVEY §2 L-rank family; VERDICT r2 item 6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_order(
    df: DataFrame,
    sort_value: Column,
    tiebreaks: list[str],
    *,
    out_rn: str = "rn",
    running_sums: dict[str, Column] | None = None,
    n_buckets: int = 256,
) -> DataFrame:
    """Add a 1-based global row number `out_rn` under
    ORDER BY (sort_value ASC, *tiebreaks ASC), plus an inclusive global
    running sum column for each entry of `running_sums`, executed
    two-phase (no unpartitioned WindowExec in the plan).

    `sort_value` must be numeric and non-null (cast timestamps with
    unix_micros, negate for DESC orderings). Ties in `sort_value` are
    resolved by `tiebreaks`, which must make the order total for the
    result to be deterministic.
    """
    running_sums = running_sums or {}
    v, b = "__tp_v", "__tp_b"
    keyed = df.withColumn(v, sort_value.cast("double"))

    lo, hi = keyed.agg(F.min(v), F.max(v)).first()
    if lo is None or hi is None or hi <= lo:
        bucket = F.lit(0)
    else:
        span = hi - lo
        # float conversion and floor are monotone non-decreasing in v, so
        # the bucket id is order-consistent even under rounding
        bucket = F.least(
            F.lit(n_buckets - 1),
            F.floor((F.col(v) - F.lit(lo)) / F.lit(span) * n_buckets),
        ).cast("int")
    bucketed = keyed.withColumn(b, bucket)

    aggs = [F.count("*").alias("__n")] + [
        F.sum(expr).alias(f"__s_{name}")
        for name, expr in running_sums.items()
    ]
    counts = bucketed.groupBy(b).agg(*aggs).orderBy(b).collect()
    offsets, acc_n = [], 0
    acc_s = {name: 0 for name in running_sums}
    for r in counts:
        offsets.append((r[b], acc_n, *[acc_s[k] for k in running_sums]))
        acc_n += r["__n"]
        for k in running_sums:
            acc_s[k] += r[f"__s_{k}"] or 0

    # integer measures (e.g. exact cents) keep int64 exactness end-to-end
    off_cols = ", ".join(
        f"__o_{k} " + ("long" if isinstance(acc_s[k], int) else "double")
        for k in running_sums
    )
    off_schema = f"{b} int, __off long" + (f", {off_cols}" if off_cols else "")
    off_df = df.sparkSession.createDataFrame(offsets, schema=off_schema)

    # rank on the ORIGINAL (exact) sort expression; only the bucket id
    # goes through the double cast (monotone, so bucket-consistent)
    w = Window.partitionBy(b).orderBy(sort_value.asc(), *tiebreaks)
    out = (
        bucketed.join(F.broadcast(off_df), b)
        .withColumn(out_rn, F.col("__off") + F.row_number().over(w))
    )
    drop = [v, b, "__off"]
    for name, expr in running_sums.items():
        wsum = w.rowsBetween(Window.unboundedPreceding, 0)
        out = out.withColumn(
            name, F.col(f"__o_{name}") + F.sum(expr).over(wsum)
        )
        drop.append(f"__o_{name}")
    return out.drop(*drop)


def ntile_from_rn(rn: Column, n_total: Column, k: int) -> Column:
    """SQL-standard NTILE(k) from a 1-based global row number and the
    total row count: the first (n mod k) tiles take ceil(n/k) rows, the
    rest floor(n/k) — exactly DuckDB's / Spark's ntile assignment, but
    computable from a two-phase rank without any global window."""
    base = F.floor(n_total / k)
    rem = n_total % k
    big = (base + 1) * rem  # rows covered by the (base+1)-sized tiles
    return F.when(
        rn <= big, F.floor((rn - 1) / (base + 1)) + 1
    ).otherwise(
        rem + F.floor((rn - 1 - big) / base) + 1
    ).cast("int")
