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


def test_union_idle_source_heartbeat_unstarves_append_output(spark):
    """The withIdleness EMULATION (streaming/idleness.py, VERDICT_r7
    item 5): same starvation shape as above — active file stream
    unioned with a never-producing input under the default min policy —
    but an IdleSourceHeartbeat watches the idle directory and injects a
    sentinel row whose event time is the injection wall-clock. The idle
    input's watermark advances past every fixture event time, the min
    policy's binding input becomes the ACTIVE one, and append output
    flows; strip_heartbeats removes the sentinel AFTER the watermark
    operator so no aggregate ever counts it. Counts must equal the
    active-source-only run exactly."""
    from flink_tutorial_broadcast_spark.streaming.idleness import (
        IdleSourceHeartbeat, strip_heartbeats,
    )

    ev = (load(spark, SF_SMOKE, "events")
          .select("ts", "user_id", F.unix_micros("ts").alias("__us")))
    d_active = tempfile.mkdtemp(prefix="uwm_hb_active_")
    d_idle = tempfile.mkdtemp(prefix="uwm_hb_idle_")
    _timed_files(ev, d_active)
    # idle source: a schema-bearing empty file, as in the starvation pin
    (ev.filter(F.lit(False)).drop("__us")
     .coalesce(1).write.parquet(os.path.join(d_idle, "f=0")))

    hb = IdleSourceHeartbeat(d_idle, idle_timeout_s=0.0,
                             fields={"user_id": -1}, ts_col="ts")
    # the empty-dir rule: a source that never produced is idle from
    # stream start (the parquet file exists but holds zero ROWS; mtime
    # still gates, so sleep past the 0s timeout)
    time.sleep(0.05)
    assert hb.check_and_inject() is True

    def run_union():
        def src(d):
            return (spark.readStream
                    .schema("ts timestamp, user_id long")
                    .option("maxFilesPerTrigger", "1")
                    .option("recursiveFileLookup", "true")
                    .parquet(d)
                    .withWatermark("ts", "0 seconds"))
        agg = (strip_heartbeats(src(d_active).union(src(d_idle)))
               .groupBy(F.window("ts", "1 hour").alias("w"))
               .agg(F.count("*").alias("n"))
               .select(F.col("w.end").alias("w_end"), "n"))
        name = f"uwmhb_{int(time.time() * 1000)}"
        q = (agg.writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation", checkpoint_dir())
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.sql(f"SELECT * FROM {name}").collect()

    rows = run_union()
    assert rows  # the heartbeat un-starved the append output

    # ground truth: the active source alone (no union, no idleness)
    def run_single():
        srcdf = (spark.readStream
                 .schema("ts timestamp, user_id long")
                 .option("maxFilesPerTrigger", "1")
                 .option("recursiveFileLookup", "true")
                 .parquet(d_active)
                 .withWatermark("ts", "0 seconds"))
        agg = (srcdf.groupBy(F.window("ts", "1 hour").alias("w"))
               .agg(F.count("*").alias("n"))
               .select(F.col("w.end").alias("w_end"), "n"))
        name = f"uwmsolo_{int(time.time() * 1000)}"
        q = (agg.writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation", checkpoint_dir())
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.sql(f"SELECT * FROM {name}").collect()

    want = run_single()
    # the heartbeat's wall-clock ts (2026) outruns every fixture event,
    # so the union emits at least the single-source windows — and the
    # sentinel row itself never lands in any count
    got = {(r["w_end"], r["n"]) for r in rows}
    assert {(r["w_end"], r["n"]) for r in want} <= got
    assert all(r["n"] > 0 for r in rows)

    # a non-idle directory refuses to inject
    hb_active = IdleSourceHeartbeat(d_active, idle_timeout_s=3600,
                                    fields={"user_id": -1})
    assert hb_active.check_and_inject() is False


def test_idleness_monitor_thread_and_mtime_gate(spark):
    """The background monitor form: start() polls and injects while the
    directory stays idle, stop() joins the thread; a fresh data file
    resets the idleness clock (mtime gate)."""
    from flink_tutorial_broadcast_spark.streaming.idleness import (
        IdleSourceHeartbeat,
    )

    d = tempfile.mkdtemp(prefix="uwm_hb_mon_")
    hb = IdleSourceHeartbeat(d, idle_timeout_s=0.0,
                             fields={"user_id": -1, "v": 1.5,
                                     "tag": "hb"})
    hb.start(poll_s=0.05)
    time.sleep(0.4)
    hb.stop()
    import glob as _glob
    n_hb = len(_glob.glob(os.path.join(d, "heartbeats", "*.parquet")))
    assert n_hb >= 2  # kept injecting while idle
    # heartbeat files are readable parquet with the declared schema
    got = spark.read.parquet(os.path.join(d, "heartbeats")).collect()
    assert all(r["user_id"] == -1 and r["tag"] == "hb" for r in got)
    assert len(got) == n_hb
    # a fresh real file inside the timeout suppresses injection
    hb2 = IdleSourceHeartbeat(d, idle_timeout_s=3600,
                              fields={"user_id": -1})
    assert hb2.check_and_inject() is False  # heartbeats count as files
