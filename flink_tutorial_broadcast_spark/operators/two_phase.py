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

from flink_tutorial_broadcast_spark.io import local_rows_df


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
    return global_order_multi(
        df, [(sort_value, tiebreaks, out_rn)],
        running_sums=running_sums, n_buckets=n_buckets)


def global_order_multi(
    df: DataFrame,
    specs: list[tuple[Column, list[str], str]],
    *,
    running_sums: dict[str, Column] | None = None,
    n_buckets: int = 256,
) -> DataFrame:
    """N independent global orderings over ONE input in a fixed number
    of extra jobs: one (min, max) stats pass + one exploded per-measure
    bucket-count pass, regardless of how many orderings are requested —
    the three RFM ntiles cost the same two bounded collects as one.

    ``specs`` is ``[(sort_value, tiebreaks, out_rn), ...]``;
    ``running_sums`` (inclusive global running sums) attach to the FIRST
    spec's ordering.
    """
    running_sums = running_sums or {}
    n = len(specs)
    vcols = [f"__tp_v{i}" for i in range(n)]
    bcols = [f"__tp_b{i}" for i in range(n)]
    # every consumer (stats, counts, the final windowed joins) re-reads
    # the input — checkpoint it LAZILY so the upstream plan (often a
    # full fact-table aggregate) materializes once, not 2+N×. Blocks
    # are freed by session.release_cached_blocks in harness loops.
    keyed = df
    for v, (sv, _, _) in zip(vcols, specs):
        keyed = keyed.withColumn(v, sv.cast("double"))
    keyed = keyed.localCheckpoint(eager=False)

    stats = keyed.agg(*[f for v in vcols
                        for f in (F.min(v), F.max(v))]).first()
    buckets = []
    for i, v in enumerate(vcols):
        lo, hi = stats[2 * i], stats[2 * i + 1]
        if lo is None or hi is None or hi <= lo:
            buckets.append(F.lit(0))
        else:
            # float conversion and floor are monotone non-decreasing in
            # v, so the bucket id is order-consistent under rounding
            buckets.append(F.least(
                F.lit(n_buckets - 1),
                F.floor((F.col(v) - F.lit(lo))
                        / F.lit(hi - lo) * n_buckets),
            ).cast("int"))
    bucketed = keyed
    for b, bk in zip(bcols, buckets):
        bucketed = bucketed.withColumn(b, bk)

    # ONE shuffle for every measure's bucket histogram: explode to
    # (measure, bucket) pairs — ≤ N·n_buckets result rows
    sum_aggs = [F.sum(F.when(F.col("__m") == 0, expr))
                .alias(f"__s_{name}")
                for name, expr in running_sums.items()]
    counts = (
        bucketed.select(
            *[F.col(c) for c in bucketed.columns],
            F.explode(F.array(*[
                F.struct(F.lit(i).alias("__m"), F.col(b).alias("__b"))
                for i, b in enumerate(bcols)])).alias("__mb"))
        .select("*", F.col("__mb.__m").alias("__m"),
                F.col("__mb.__b").alias("__b"))
        .groupBy("__m", "__b")
        .agg(F.count("*").alias("__n"), *sum_aggs)
        .collect()
    )

    out = bucketed
    drop = list(vcols) + list(bcols)
    for i, (sv, tiebreaks, out_rn) in enumerate(specs):
        rows = sorted((r for r in counts if r["__m"] == i),
                      key=lambda r: r["__b"])
        offsets, acc_n = [], 0
        acc_s = {name: 0 for name in running_sums} if i == 0 else {}
        for r in rows:
            offsets.append((r["__b"], acc_n,
                            *[acc_s[k] for k in acc_s]))
            acc_n += r["__n"]
            for k in acc_s:
                acc_s[k] += r[f"__s_{k}"] or 0
        # integer measures (e.g. exact cents) keep int64 end-to-end
        off_cols = ", ".join(
            f"__o_{k} " + ("long" if isinstance(acc_s[k], int)
                           else "double")
            for k in acc_s)
        off_schema = f"{bcols[i]} int, __off{i} long" + (
            f", {off_cols}" if off_cols else "")
        off_df = local_rows_df(df.sparkSession, offsets, off_schema)
        # rank on the ORIGINAL (exact) sort expression; only the bucket
        # id goes through the double cast (monotone, bucket-consistent)
        w = Window.partitionBy(bcols[i]).orderBy(sv.asc(), *tiebreaks)
        out = (
            out.join(F.broadcast(off_df), bcols[i])
            .withColumn(out_rn, F.col(f"__off{i}") + F.row_number().over(w))
        )
        drop.append(f"__off{i}")
        for name, expr in (running_sums.items() if i == 0 else ()):
            wsum = w.rowsBetween(Window.unboundedPreceding, 0)
            out = out.withColumn(
                name, F.col(f"__o_{name}") + F.sum(expr).over(wsum))
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
