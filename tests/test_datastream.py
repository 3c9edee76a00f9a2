"""The Flink-DataStream facade must produce the SAME results (and the
same plan family) as the oracle-backed operator keys — the program-shape
migration contract for reference users."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.datastream import (
    StreamExecutionEnvironment,
)
from flink_tutorial_broadcast_spark.io import load
from flink_tutorial_broadcast_spark.sources.rules import rules_df
from tests.conftest import SF_SMOKE


def test_facade_reproduces_the_flagship_broadcast_rule_join(spark, queries):
    """The reference's canonical program — events connected to a
    broadcast rule stream, keyed, windowed, aggregated — written in the
    facade's fluent style, must equal q_broadcast_rule_join exactly."""
    env = StreamExecutionEnvironment.get_execution_environment(spark)
    out = (
        env.from_dataframe(load(spark, SF_SMOKE, "events"))
        .connect_broadcast(
            rules_df(spark),
            on="event_type = rule_event_type AND value > threshold")
        .key_by("event_type", "severity")
        .window_tumbling("ts", "hour")
        .aggregate(n_matches="count(*)",
                   sum_value="round(sum(value), 2)",
                   n_users="count(distinct user_id)")
        .to_df()
    )
    want = {tuple(r[k] for k in ("event_type", "severity", "window_start"))
            : (r["n_matches"], r["sum_value"], r["n_users"])
            for r in queries["q_broadcast_rule_join"](
                spark, SF_SMOKE).collect()}
    got = {tuple(r[k] for k in ("event_type", "severity", "window_start"))
           : (r["n_matches"], r["sum_value"], r["n_users"])
           for r in out.collect()}
    assert got == want
    # and it is the SAME physical strategy: broadcast join, fact side
    # never shuffles before the join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_facade_map_filter_flatmap_expression_path(spark, queries):
    """Expression-style map/filter/flat_map stay JVM-side and match the
    operator keys built directly on DataFrames."""
    env = StreamExecutionEnvironment.get_execution_environment(spark)
    toks = (
        env.from_dataframe(load(spark, SF_SMOKE, "documents"))
        .filter("lang = 'en'")
        .flat_map("token", "split(text, ' ')")
        .key_by("token")
        .count()
        .to_df()
    )
    want = {r["token"]: r["n"] for r in
            (load(spark, SF_SMOKE, "documents")
             .filter(F.col("lang") == "en")
             .select(F.explode(F.split("text", " ")).alias("token"))
             .groupBy("token").agg(F.count("*").alias("n"))).collect()}
    got = {r["token"]: r["n"] for r in toks.collect()}
    assert got == want
    plan = toks._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan.lower()  # pure JVM path


def test_facade_python_lambda_slow_path_works_and_is_arrow_batched(spark):
    """Callable map/filter (the ported-Flink-lambda look) must be
    correct through mapInPandas."""
    env = StreamExecutionEnvironment.get_execution_environment(spark)
    out = (
        env.from_collection([(1, 10.0), (2, 25.0), (3, 40.0)],
                            "id long, value double")
        .filter(lambda r: r["value"] > 15)
        .map(lambda r: {"id": r["id"], "doubled": r["value"] * 2},
             output_schema="id long, doubled double")
        .to_df()
    )
    assert {(r.id, r.doubled) for r in out.collect()} \
        == {(2, 50.0), (3, 80.0)}


def test_facade_runs_unchanged_on_a_streaming_source(spark):
    """The same fluent program body works when the underlying DataFrame
    is a STREAM — the declarative-plan premise: facade code written for
    batch runs on readStream with only source/sink swapped."""
    import tempfile
    import uuid

    from flink_tutorial_broadcast_spark.sources import eventlog

    root = tempfile.mkdtemp(prefix="ds_facade_src_")
    rows = [(i, i % 4, "view" if i % 3 else "purchase", float(i))
            for i in range(90)]
    eventlog.log_write(root, rows, n_partitions=2)
    eventlog.register(spark)

    def program(stream: "DataStream"):
        return (stream
                .filter("event_type = 'purchase'")
                .key_by("user_id")
                .aggregate(n="count(*)", total="round(sum(value), 2)"))

    from flink_tutorial_broadcast_spark.datastream import (
        StreamExecutionEnvironment,
    )
    env = StreamExecutionEnvironment.get_execution_environment(spark)

    # batch run of the identical program body
    batch_src = env.from_dataframe(
        spark.read.format("ftbs_eventlog").option("path", root).load())
    want = {(r.user_id): (r.n, r.total)
            for r in program(batch_src).to_df().collect()}

    # streaming run: same body, streaming source, complete-mode sink
    name = f"ds_facade_{uuid.uuid4().hex[:8]}"
    stream_src = env.from_dataframe(
        spark.readStream.format("ftbs_eventlog").option("path", root).load())
    q = (program(stream_src).to_df()
         .writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.user_id): (r.n, r.total)
           for r in spark.table(name).collect()}
    assert got == want and got


def test_facade_keyed_process_function_per_key_fold(spark):
    """KeyedProcessFunction analogue: an order-dependent per-key fold
    (running max drawdown of value in event_id order) via process(),
    checked against an independent Python fold over the same fixture."""
    from flink_tutorial_broadcast_spark.datastream import (
        StreamExecutionEnvironment,
    )
    from flink_tutorial_broadcast_spark.io import load

    def drawdown(key, pdf):
        import pandas as pd
        pdf = pdf.sort_values("event_id")
        peak = pdf["value"].cummax()
        return pd.DataFrame({
            "user_id": [int(key[0])],
            "max_drawdown": [float((peak - pdf["value"]).max())],
        })

    env = StreamExecutionEnvironment.get_execution_environment(spark)
    got = {r.user_id: r.max_drawdown for r in (
        env.from_dataframe(load(spark, SF_SMOKE, "events"))
        .key_by("user_id")
        .process(drawdown, "user_id long, max_drawdown double")
        .to_df().collect())}

    rows = (load(spark, SF_SMOKE, "events")
            .select("user_id", "event_id", "value").collect())
    per_key = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.event_id)):
        peak, dd = per_key.get(r.user_id, (float("-inf"), 0.0))
        peak = max(peak, r.value)
        per_key[r.user_id] = (peak, max(dd, peak - r.value))
    want = {u: dd for u, (_, dd) in per_key.items()}
    assert set(got) == set(want)
    for u in want:
        assert abs(got[u] - want[u]) < 1e-9, u
