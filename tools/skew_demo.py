"""AQE skew-join vs salted-join demonstration (round-4 verdict task 6).

Synthesizes a hot join key at stress scale — 70% of an amplified events
fact lands on ONE key of a 1000-key dim — and runs the same
join+aggregate three ways with broadcast disabled (the 100 TB situation:
dim too big to broadcast, one mega-key):

  plain       AQE skew split OFF — the straggler baseline: one task owns
              the hot partition.
  aqe_skew    AQE skew split ON with thresholds scaled to local data
              volume (skewedPartitionThresholdInBytes / advisory sizes
              are per-cluster knobs; the DEFAULT 256 MB threshold is
              tuned for real executors, so a local demo must scale it
              down just like a real cluster tunes it up). Plan evidence:
              the final adaptive plan's shuffle read shows the skew
              split.
  salted      operators/skew.salted_join n_salts=32 — the code-level
              fallback when one key is so hot AQE's split of ONE
              partition still leaves a straggler, or AQE is off.

All three must return identical aggregates (asserted); the JSON records
wall time + the skew-split plan marker so BASELINE.md can carry the
comparison. tests/test_skew.py pins the plan marker + equality.

Usage: python tools/skew_demo.py [k]     (default 16 ≈ 1.6M fact rows)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from flink_tutorial_broadcast_spark.io import load  # noqa: E402
from flink_tutorial_broadcast_spark.operators.skew import salted_join  # noqa: E402
from flink_tutorial_broadcast_spark.session import get_spark  # noqa: E402

N_DIM = 1000
HOT_SHARE_MOD = 10  # event_id % 10 < 7 -> hot key: ~70% of rows

# runtime-settable AQE knobs, scaled to local shuffle volumes
SKEW_ON = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
    # a split sub-join must not be demoted to broadcast, or the demo
    # compares join strategies instead of skew handling
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}
SKEW_OFF = dict(SKEW_ON, **{"spark.sql.adaptive.skewJoin.enabled": "false"})


def skewed_frames(spark: SparkSession, sf_dir: str, k: int):
    """Amplified events with a 70%-hot synthetic join key + a 1000-row
    dim (too big for the disabled broadcast, realistic FK shape)."""
    ev = load(spark, sf_dir, "events").select("event_id", "value")
    rep = ev.crossJoin(F.broadcast(
        spark.range(k).select(F.col("id").alias("__rep"))))
    fact = rep.select(
        (F.col("event_id") + F.col("__rep") * 10_000_000).alias("event_id"),
        "value",
        F.when(F.col("event_id") % HOT_SHARE_MOD < 7, F.lit(0))
        .otherwise(F.pmod(F.col("event_id"), F.lit(N_DIM)))
        .alias("skew_key"))
    # AQE splits a skewed REDUCE partition by mapper ranges — a
    # single-file scan has 1-2 mappers, leaving nothing to split by
    # (the limitation tests/test_skew.py documents). A cluster fact has
    # thousands of mappers; emulate that with a round-robin shuffle.
    fact = fact.repartition(64)
    dim = spark.range(N_DIM).select(
        F.col("id").alias("dim_key"),
        (F.col("id") * 10).alias("dim_payload"))
    return fact, dim


def joined_agg(fact: DataFrame, dim: DataFrame) -> DataFrame:
    j = fact.join(dim, fact.skew_key == dim.dim_key)
    return j.agg(F.count("*").alias("n"),
                 F.sum(F.col("value") + F.col("dim_payload")).alias("s"))


def run_variant(spark, fact, dim, confs, salted: bool):
    prev = {c: spark.conf.get(c, None) for c in confs}
    for c, v in confs.items():
        spark.conf.set(c, v)
    try:
        if salted:
            j = salted_join(fact, dim, "skew_key", "dim_key", n_salts=32)
            out = j.agg(F.count("*").alias("n"),
                        F.sum(F.col("value") + F.col("dim_payload"))
                        .alias("s"))
        else:
            out = joined_agg(fact, dim)
        t0 = time.time()
        row = out.collect()[0]
        sec = time.time() - t0
        plan = out._jdf.queryExecution().executedPlan().toString()
        return {"sec": round(sec, 2), "n": row["n"],
                "s": round(row["s"], 2),
                "skew_marker": plan.count("skewed"),
                "smj": plan.count("SortMergeJoin")}, plan
    finally:
        for c, v in prev.items():
            if v is None:
                spark.conf.unset(c)
            else:
                spark.conf.set(c, v)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark("skew_demo")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fact, dim = skewed_frames(spark, sf_dir, k)

    results = {}
    results["plain"], _ = run_variant(spark, fact, dim, SKEW_OFF, False)
    results["aqe_skew"], plan = run_variant(spark, fact, dim, SKEW_ON, False)
    results["salted"], _ = run_variant(spark, fact, dim, SKEW_OFF, True)

    assert results["plain"]["n"] == results["aqe_skew"]["n"] \
        == results["salted"]["n"], "variants disagree on row count"
    assert abs(results["plain"]["s"] - results["aqe_skew"]["s"]) < 1e-6
    print(json.dumps({"k": k, "results": results}))
    if results["aqe_skew"]["skew_marker"] == 0:
        print("WARNING: no skew split in the AQE plan — thresholds vs "
              "data volume need retuning", file=sys.stderr)
        print(plan[:4000], file=sys.stderr)


if __name__ == "__main__":
    main()
