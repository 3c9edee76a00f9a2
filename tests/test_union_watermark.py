"""Watermark semantics under multi-input union (VERDICT_r6 item 8).

Flink propagates the MINIMUM watermark across the inputs of a union /
multi-input operator [FLINK-API: combined watermark = min over input
channels], so one slow (high-lag) input holds back event-time progress
for the whole pipeline. Spark has the SAME default — a query with
multiple watermark operators advances the global watermark by
`spark.sql.streaming.multipleWatermarkPolicy = min` — but the policy is
a per-query conf that can be flipped to `max`, which Flink cannot
express. These tests pin both: the default equals Flink's min
semantics (the slow input gates emission), and `max` releases windows
the min policy holds back. docs/divergences.md row 10 records the
contract.
"""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load
from flink_tutorial_broadcast_spark.streaming.sources import (
    checkpoint_dir,
)
from tests.conftest import SF_SMOKE

_SLOW_LAG = "2 hours"
_SLOW_LAG_US = 2 * 3600 * 1_000_000


def _timed_files(df, d: str, n_files: int = 3) -> None:
    """Write df as n_files time-ordered files with increasing mtimes so
    maxFilesPerTrigger=1 yields one in-order micro-batch per file."""
    qs = [df.approxQuantile("__us", [i / n_files], 0.0)[0]
          for i in range(1, n_files)]
    lo = None
    stamp = int(time.time())
    for i in range(n_files):
        hi = qs[i] if i < n_files - 1 else None
        part = df
        if lo is not None:
            part = part.filter(F.col("__us") > lo)
        if hi is not None:
            part = part.filter(F.col("__us") <= hi)
        path = os.path.join(d, f"f={i}")
        part.drop("__us").coalesce(1).write.parquet(path)
        for fname in os.listdir(path):
            os.utime(os.path.join(path, fname),
                     (stamp + 10 * i, stamp + 10 * i))
        lo = hi


def _run_union_window_agg(spark, policy: str | None):
    """Two watermarked file streams (fast: 0s lag, slow: 2h lag)
    unioned into one tumbling-hour count in APPEND mode; returns
    (emitted rows, global max event ts in µs)."""
    ev = (load(spark, SF_SMOKE, "events")
          .select("ts", "user_id", F.unix_micros("ts").alias("__us")))
    max_us = ev.agg(F.max("__us").alias("m")).collect()[0]["m"]
    d_fast = tempfile.mkdtemp(prefix="uwm_fast_")
    d_slow = tempfile.mkdtemp(prefix="uwm_slow_")
    _timed_files(ev, d_fast)
    _timed_files(ev, d_slow)

    prev = spark.conf.get("spark.sql.streaming.multipleWatermarkPolicy",
                          None)
    if policy is not None:
        spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy",
                       policy)
    try:
        def src(d, lag):
            return (spark.readStream
                    .schema("ts timestamp, user_id long")
                    .option("maxFilesPerTrigger", "1")
                    .option("recursiveFileLookup", "true")
                    .parquet(d)
                    .withWatermark("ts", lag))

        union = src(d_fast, "0 seconds").union(src(d_slow, _SLOW_LAG))
        agg = (union.groupBy(F.window("ts", "1 hour").alias("w"))
               .agg(F.count("*").alias("n"))
               .select(F.col("w.end").alias("w_end"), "n"))
        name = f"uwm_{policy or 'default'}_{int(time.time() * 1000)}"
        q = (agg.writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation", checkpoint_dir())
             .trigger(availableNow=True).start())
        q.awaitTermination()
        rows = spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        if policy is not None:
            if prev is None:
                spark.conf.unset(
                    "spark.sql.streaming.multipleWatermarkPolicy")
            else:
                spark.conf.set(
                    "spark.sql.streaming.multipleWatermarkPolicy", prev)
    return rows, max_us


def test_union_watermark_default_is_flink_min_semantics(spark):
    """Default policy: the 2h-lag input HOLDS BACK the union's event
    time — no emitted window may end inside the slow input's lag
    horizon (w_end <= global_max_ts - 2h), exactly Flink's combined
    min-watermark rule. And the default behaves identically to an
    explicit policy=min."""
    rows_default, max_us = _run_union_window_agg(spark, None)
    assert rows_default  # gating, not starvation: early windows emit
    bound = max_us - _SLOW_LAG_US
    for r in rows_default:
        end_us = int(r["w_end"].timestamp() * 1_000_000)
        assert end_us <= bound, (r, bound)

    rows_min, _ = _run_union_window_agg(spark, "min")
    assert {(r["w_end"], r["n"]) for r in rows_min} \
        == {(r["w_end"], r["n"]) for r in rows_default}


def test_union_watermark_max_policy_outruns_flink(spark):
    """policy=max (no Flink equivalent): the FAST input drives the
    watermark, so windows the min policy held back (ending inside the
    slow input's 2h horizon) DO emit — strictly more windows, same
    counts on the shared prefix."""
    rows_min, max_us = _run_union_window_agg(spark, "min")
    rows_max, _ = _run_union_window_agg(spark, "max")
    set_min = {(r["w_end"], r["n"]) for r in rows_min}
    set_max = {(r["w_end"], r["n"]) for r in rows_max}
    # strictly more windows under max (the released tail), and every
    # shared window carries the identical final count — time-ordered
    # files mean later batches never back-fill an emitted window
    assert set_min < set_max
    last_min = max(r["w_end"] for r in rows_min)
    released = [r for r in rows_max if r["w_end"] > last_min]
    assert released  # the extra windows are the held-back 2h tail


def test_union_idle_source_stalls_default_watermark(spark):
    """Flink's withIdleness has NO Spark equivalent, and the gap is
    observable: a union input that produces NO data keeps watermark 0,
    so the default min policy never finalizes ANY window (append mode
    emits nothing) even though the active source delivered everything.
    policy=max is the engine's workaround (the active source drives).
    Documented as divergences.md row 11."""
    ev = (load(spark, SF_SMOKE, "events")
          .select("ts", "user_id", F.unix_micros("ts").alias("__us")))
    d_active = tempfile.mkdtemp(prefix="uwm_active_")
    d_idle = tempfile.mkdtemp(prefix="uwm_idle_")
    _timed_files(ev, d_active)
    # the idle source: one schema-bearing file with ZERO rows
    (ev.filter(F.lit(False)).drop("__us")
     .coalesce(1).write.parquet(os.path.join(d_idle, "f=0")))

    def run(policy):
        prev = spark.conf.get(
            "spark.sql.streaming.multipleWatermarkPolicy", None)
        if policy:
            spark.conf.set(
                "spark.sql.streaming.multipleWatermarkPolicy", policy)
        try:
            def src(d):
                return (spark.readStream
                        .schema("ts timestamp, user_id long")
                        .option("maxFilesPerTrigger", "1")
                        .option("recursiveFileLookup", "true")
                        .parquet(d)
                        .withWatermark("ts", "0 seconds"))
            agg = (src(d_active).union(src(d_idle))
                   .groupBy(F.window("ts", "1 hour").alias("w"))
                   .agg(F.count("*").alias("n")))
            name = f"uwmidle_{policy or 'd'}_{int(time.time() * 1000)}"
            q = (agg.writeStream.format("memory").queryName(name)
                 .outputMode("append")
                 .option("checkpointLocation", checkpoint_dir())
                 .trigger(availableNow=True).start())
            q.awaitTermination()
            return spark.sql(f"SELECT * FROM {name}").count()
        finally:
            if policy:
                if prev is None:
                    spark.conf.unset(
                        "spark.sql.streaming.multipleWatermarkPolicy")
                else:
                    spark.conf.set(
                        "spark.sql.streaming.multipleWatermarkPolicy",
                        prev)

    assert run(None) == 0      # the idle input stalls event time
    assert run("max") > 0      # the workaround releases the windows
