"""UDF / UDAF / UDTF surface (SURVEY.md §2.J).

The reference's user functions are arbitrary Scala bodies
(``MapFunction``/``ProcessFunction``). Engine policy: built-ins first
(everything in scalar_funcs/relational is pure Catalyst); when Python is
genuinely needed, Arrow-batched pandas UDFs — the row-at-a-time UDF (J1)
exists as a single demonstration and is deliberately NOT used elsewhere.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import StringType

from flink_tutorial_broadcast_spark.io import load
from flink_tutorial_broadcast_spark.registry import query

# deterministic probe for the cosine demo: the all-ones direction
_PROBE = [1.0] * 64
_PROBE_SQL = "[" + ", ".join("1.0" for _ in range(64)) + "]"


@query(
    "q_py_udf",
    oracle="""
    SELECT event_id,
           CASE WHEN value >= 100.0 THEN 'HIGH'
                WHEN value >= 30.0 THEN 'MID'
                ELSE 'LOW' END AS tier
    FROM events WHERE event_id < 2000
    """,
)
def q_py_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 row-at-a-time Python UDF (the slow path, kept as a demo).

    Identical logic to a CASE expression so the oracle can check it; the
    real engine rule is in q_case_when — this exists to cover the surface.
    """
    @F.udf(returnType=StringType())
    def tier(v: float) -> str:
        if v >= 100.0:
            return "HIGH"
        return "MID" if v >= 30.0 else "LOW"

    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select("event_id", tier("value").alias("tier"))


@query(
    "q_pandas_udf_cosine",
    oracle=f"""
    SELECT vec_id,
           ROUND(list_cosine_similarity(
               list_transform(embedding, x -> CAST(x AS DOUBLE)),
               {_PROBE_SQL}), 4) AS cos_sim
    FROM embeddings
    """,
)
def q_pandas_udf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 vectorized scalar pandas UDF: cosine(embedding, probe) over Arrow
    batches — the kernel the K3 similarity ops reuse. ~10-100× the J1 path.
    """
    import numpy as np

    @pandas_udf("double")
    def cos_probe(embs: pd.Series) -> pd.Series:
        mat = np.stack(embs.to_numpy()).astype("float64")  # (batch, 64)
        probe = np.asarray(_PROBE)
        # sequential left-fold sums (np.cumsum last element) — the same
        # order as DuckDB's list_cosine_similarity single-pass loop, so
        # the doubles match bit-for-bit regardless of Arrow batch shape
        # (a BLAS matvec's blocked reduction order varies with it)
        dots = np.cumsum(mat * probe, axis=1)[:, -1]
        norms = (np.sqrt(np.cumsum(mat * mat, axis=1)[:, -1])
                 * np.sqrt(np.cumsum(probe * probe)[-1]))
        return pd.Series(dots / norms)

    e = load(spark, sf_dir, "embeddings")
    # sign-preserving round: Spark's Round goes through BigDecimal, which
    # has no signed zero, so ROUND(-4e-5, 4) returns +0.0 while DuckDB
    # keeps -0.0 — the inherited sf0.001 hash mismatch (vec_id 248's
    # cosine is -4.39e-5 on BOTH engines; only the rounded zero's sign
    # diverged). signum(x) * round(|x|) restores IEEE signed zero.
    cos = cos_probe("embedding")
    return e.select(
        "vec_id",
        (F.signum(cos) * F.round(F.abs(cos), 4)).alias("cos_sim"))


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT event_type, ROUND(median(value), 4) AS median_value
    FROM events GROUP BY 1
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 UDAF via GROUPED_AGG pandas UDF: exact median per key (a
    non-partial-aggregatable statistic — the case where a custom
    accumulator is genuinely required; cf. q_agg_custom for the
    partial-aggregatable formulation)."""
    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.round(median_udaf("value"), 4).alias("median_value"))
    )


@udtf(returnType="token string, token_len int", useArrow=True)
class SplitTokensUDTF:
    """J4 UDTF: 1 text row → N (token, len) rows (Flink flatMap-with-schema)."""

    def eval(self, text: str):
        if text:
            for t in text.split(" "):
                yield t, len(t)


@query(
    "q_udtf_split",
    oracle="""
    SELECT d.doc_id, t.token AS token, length(t.token) AS token_len
    FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
    WHERE d.doc_id < 50
    """,
)
def q_udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 Python UDTF applied via LATERAL join."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("udtf_docs_in")
    spark.udtf.register("split_tokens", SplitTokensUDTF)
    return spark.sql(
        "SELECT d.doc_id, s.token, s.token_len "
        "FROM udtf_docs_in d, LATERAL split_tokens(d.text) s"
    )


@query(
    "q_grouped_map",
    oracle="""
    SELECT event_id, user_id,
           ROUND(value - AVG(value) OVER (PARTITION BY user_id), 8)
               AS centered
    FROM events
    """,
)
def q_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 grouped-map applyInPandas — the ``ProcessFunction`` analogue:
    arbitrary per-key pandas logic (here mean-centering each user's values,
    re-expressible in SQL so the oracle can verify the plumbing)."""
    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["event_id", "user_id"]].copy()
        # no pandas .round() here — numpy rounds half-to-even, DuckDB/Spark
        # round half-away; final rounding happens JVM-side below. Precision 8:
        # group means terminate at ~5 decimals (2-decimal sums / group count),
        # so 4-decimal rounding would sit exactly on half boundaries.
        # Per-user semantics INSIDE the bucket via groupby-transform — the
        # bucket is purely an execution grouping (see below).
        out["centered"] = (pdf["value"]
                           - pdf.groupby("user_id")["value"]
                                .transform("mean"))
        return out

    # Key-bucketing: grouping by user_id % 64 instead of raw user_id
    # amortizes the per-group Python call overhead (~0.5 ms each; 10 k
    # users → 10 k calls → seconds of pure invocation cost) across ~64
    # calls, while the pandas body reinstates exact per-user semantics
    # with a vectorized groupby. Same pattern a production
    # ProcessFunction port uses when keys are plentiful but cheap.
    return (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "value",
                (F.col("user_id") % 64).alias("bucket"))
        .groupBy("bucket")
        .applyInPandas(center, "event_id long, user_id long, centered double")
        .withColumn("centered", F.round("centered", 8))
    )


@query(
    "q_cogroup",
    oracle="""
    WITH p AS (
      SELECT user_id, COUNT(*) AS n_purchases, MIN(ts) AS first_p
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), er AS (
      SELECT user_id, COUNT(*) AS n_errors, MIN(ts) AS first_e
      FROM events WHERE event_type = 'error' GROUP BY user_id
    )
    SELECT COALESCE(p.user_id, er.user_id) AS user_id,
           COALESCE(p.n_purchases, 0) AS n_purchases,
           COALESCE(er.n_errors, 0) AS n_errors,
           LEAST(COALESCE(p.first_p, TIMESTAMP '9999-01-01'),
                 COALESCE(er.first_e, TIMESTAMP '9999-01-01')) AS first_ts
    FROM p FULL OUTER JOIN er ON p.user_id = er.user_id
    """,
)
def q_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-input keyed operator: `cogroup().applyInPandas` — the engine
    analogue of Flink's `connect`/`coGroup` ([FLINK-API
    `ConnectedStreams#process(CoProcessFunction)`], the SAME two-input
    machinery `KeyedBroadcastProcessFunction` specializes): both inputs
    hash-partition on the key and one user function sees each key's two
    row groups side by side.

    Here: purchases × errors per user → counts + earliest activity.
    Re-expressible as FULL OUTER aggs (the oracle), which is exactly the
    point — the plumbing under a custom CoProcessFunction is verified by
    a declarative twin. Both sides arrive Arrow-batched; per-key pandas
    work stays O(user's rows).

    The two inputs are loaded INDEPENDENTLY and the right side renamed:
    deriving both from one scan makes this a self-cogroup, and Catalyst
    then resolves the UDF's right-side inputs to the left's attribute
    ids — under some plans (e.g. a bare `.count()`) the right child's
    projection collapses to the grouping key alone and the UDF receives
    a one-column frame. Distinct lineage + distinct names sidestep the
    ambiguity deterministically.
    """
    p = (load(spark, sf_dir, "events")
         .filter(F.col("event_type") == "purchase")
         .select("user_id", "ts"))
    er = (load(spark, sf_dir, "events")
          .filter(F.col("event_type") == "error")
          .select(F.col("user_id").alias("r_user_id"),
                  F.col("ts").alias("r_ts")))

    def merge(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        # per-USER semantics inside the bucket: vectorized groupby on
        # both sides + outer merge (the pandas mirror of the oracle's
        # FULL OUTER join of two aggregates)
        if len(lpdf):
            lp = (lpdf.groupby("user_id")
                  .agg(n_purchases=("ts", "size"), first_p=("ts", "min"))
                  .reset_index())
        else:
            lp = pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "n_purchases": pd.Series(dtype="int64"),
                "first_p": pd.Series(dtype="datetime64[ns]")})
        if len(rpdf):
            rp = (rpdf.groupby("r_user_id")
                  .agg(n_errors=("r_ts", "size"), first_e=("r_ts", "min"))
                  .reset_index()
                  .rename(columns={"r_user_id": "user_id"}))
        else:
            rp = pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "n_errors": pd.Series(dtype="int64"),
                "first_e": pd.Series(dtype="datetime64[ns]")})
        m = lp.merge(rp, on="user_id", how="outer")
        m["n_purchases"] = m["n_purchases"].fillna(0).astype("int64")
        m["n_errors"] = m["n_errors"].fillna(0).astype("int64")
        m["first_ts"] = m[["first_p", "first_e"]].min(axis=1)
        return m[["user_id", "n_purchases", "n_errors", "first_ts"]]

    # Key-bucketing (same rationale as q_grouped_map): cogroup on
    # user_id % 64 cuts ~1.5 k Python invocations to 64 while the pandas
    # body keeps exact per-user results — the two-input machinery under
    # test is unchanged (both sides hash-partition on the same key).
    return (
        p.groupBy((F.col("user_id") % 64).alias("bucket"))
        .cogroup(er.groupBy((F.col("r_user_id") % 64).alias("bucket")))
        .applyInPandas(
            merge,
            "user_id long, n_purchases long, n_errors long, first_ts timestamp",
        )
    )


@query(
    "q_batched_lookup_enrich",
    oracle="""
    SELECT e.event_id, e.event_type,
           CASE e.event_type
             WHEN 'click' THEN 'engagement' WHEN 'view' THEN 'engagement'
             WHEN 'purchase' THEN 'revenue'  WHEN 'signup' THEN 'growth'
             ELSE 'ops' END AS category
    FROM events e WHERE e.event_id < 2000
    """,
)
def q_batched_lookup_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink ``AsyncFunction`` analogue: per-batch external-service
    enrichment through ``mapInPandas`` — one "service call" per ARROW
    BATCH (not per row), connection established once per partition,
    results joined back in pandas. The external service is stubbed with
    a deterministic dict so the oracle (the equivalent relational CASE)
    hash-proves the plumbing.

    Policy note: when the lookup table CAN be materialized, a broadcast
    join beats this (and that is the engine's default — C1); this shape
    exists for the genuinely-external case (auth'd API, feature store)
    where the batch granularity is the knob that amortizes RPC latency.
    """
    _SERVICE = {
        "click": "engagement", "view": "engagement",
        "purchase": "revenue", "signup": "growth", "error": "ops",
    }

    def enrich(batches):
        import pandas as pd  # re-import inside the worker

        # "connect" once per partition (the AsyncFunction open())
        service = dict(_SERVICE)
        for pdf in batches:  # one lookup round-trip per Arrow batch
            out = pd.DataFrame({
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "category": pdf["event_type"].map(service).fillna("ops"),
            })
            yield out

    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select("event_id", "event_type")
    )
    return ev.mapInPandas(
        enrich, "event_id long, event_type string, category string"
    )


@query(
    "q_async_enrich",
    oracle="""
    SELECT event_id,
           event_id * 31 + length(event_type) AS enriched
    FROM events WHERE event_id < 2000
    """,
)
def q_async_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The facade's async-I/O surface [FLINK-API: AsyncDataStream
    .orderedWait(stream, fn, timeout, unit, capacity)] under a
    DETERMINISTIC fake service, so the thread-pool dispatch path itself
    is oracle-checkable: every record goes through datastream.map_async
    (submit → bounded in-flight window → FIFO resolve with a per-record
    deadline), and the enrichment is a pure function of the row that
    DuckDB recomputes relationally. What the hash match pins: no row is
    lost, duplicated, or mis-joined by the concurrency machinery.
    Timeout/unordered/capacity BEHAVIOR is pinned by the
    test_facade_async_* suite; this key keeps the surface in the
    driver-checkable inventory."""
    from flink_tutorial_broadcast_spark.datastream import (
        StreamExecutionEnvironment,
    )

    def service(row: dict) -> dict:
        return {"event_id": row["event_id"],
                "enriched": row["event_id"] * 31 + len(row["event_type"])}

    env = StreamExecutionEnvironment.get_execution_environment(spark)
    ev = (load(spark, sf_dir, "events")
          .filter(F.col("event_id") < 2000)
          .select("event_id", "event_type"))
    return (env.from_dataframe(ev)
            .map_async(service, "event_id long, enriched long",
                       concurrency=16, timeout=30.0, capacity=64)
            .to_df())
