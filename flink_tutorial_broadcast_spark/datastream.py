"""A thin Flink-DataStream-style facade over DataFrame plans.

The reference's users write DataStream programs — env.from_collection()
.map().filter().key_by().window().reduce() chains and the broadcast-state
connect pattern [FLINK-API: StreamExecutionEnvironment / DataStream /
KeyedStream / BroadcastConnectedStream]. This module lets that PROGRAM
SHAPE run unchanged on the Spark engine: every fluent call appends to a
LOGICAL DataFrame plan, so Catalyst still sees one declarative query —
the facade never materializes between operators and never leaves the JVM.

Two argument styles per transform:
- SQL expression strings / dicts (the fast path — whole-stage codegen;
  `map({"doubled": "value * 2"})`, `filter("value > 10")`).
- Python callables (the Flink-lambda look) are ACCEPTED for `map` and
  `filter` but run as Arrow-batched pandas over `mapInPandas` — the
  documented slow path, for porting only; rewrite hot paths as
  expressions.

Scale posture is inherited, not reimplemented: `broadcast()` marks the
rule side exactly like the flagship's join, `key_by().window()` is a
groupBy over codegen'd time buckets, `reduce`-style aggs are partial-
aggregated — the plans the facade produces are the SAME plans the
operators/ modules ship (test-asserted against the oracle-backed keys).
"""
from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StreamExecutionEnvironment:
    """Entry point mirroring Flink's StreamExecutionEnvironment."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    @staticmethod
    def get_execution_environment(
            spark: SparkSession) -> "StreamExecutionEnvironment":
        return StreamExecutionEnvironment(spark)

    def from_collection(self, data, schema: str) -> "DataStream":
        return DataStream(self.spark.createDataFrame(data, schema))

    def from_parquet(self, path: str) -> "DataStream":
        return DataStream(self.spark.read.parquet(path))

    def from_dataframe(self, df: DataFrame) -> "DataStream":
        return DataStream(df)


class DataStream:
    """Fluent plan builder; `df` is always the underlying logical plan."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- stateless transforms -------------------------------------------
    def map(self, fn, output_schema: str | None = None) -> "DataStream":
        """dict of {out_col: sql_expr} (fast, codegen) or a Python
        callable row→dict (slow path: Arrow-batched mapInPandas;
        requires output_schema)."""
        if isinstance(fn, dict):
            cols = [F.expr(e).alias(n) for n, e in fn.items()]
            return DataStream(self.df.select(*cols))
        if not callable(fn) or output_schema is None:
            raise TypeError("map() needs a {col: expr} dict, or a "
                            "callable plus output_schema")

        def run(batches: Iterator) -> Iterator:
            import pandas as pd
            for pdf in batches:
                yield pd.DataFrame(
                    [fn(row) for row in pdf.to_dict("records")])
        return DataStream(self.df.mapInPandas(run, output_schema))

    def filter(self, pred) -> "DataStream":
        """SQL predicate string (fast) or Python callable row→bool
        (slow path)."""
        if isinstance(pred, str):
            return DataStream(self.df.filter(pred))
        if not callable(pred):
            raise TypeError("filter() needs a SQL string or a callable")

        def run(batches: Iterator) -> Iterator:
            for pdf in batches:
                yield pdf[[bool(pred(r))
                           for r in pdf.to_dict("records")]]
        return DataStream(self.df.mapInPandas(run, self.df.schema))

    def flat_map(self, out_col: str, array_expr: str) -> "DataStream":
        """Explode an array-valued SQL expression — the tokenizer shape
        (`flat_map("word", "split(text, ' ')")`)."""
        return DataStream(self.df.select(
            "*", F.explode(F.expr(array_expr)).alias(out_col)))

    def union(self, other: "DataStream") -> "DataStream":
        return DataStream(self.df.unionByName(other.df))

    # -- keying / windows / broadcast -----------------------------------
    def key_by(self, *cols: str) -> "KeyedStream":
        return KeyedStream(self.df, list(cols))

    def connect_broadcast(self, rules: DataFrame,
                          on: str) -> "DataStream":
        """The reference's broadcast-state pattern
        [FLINK-API: DataStream.connect(BroadcastStream) +
        KeyedBroadcastProcessFunction]: the rule side is broadcast to
        every task and joined by an arbitrary (theta) condition — the
        fact side never shuffles."""
        return DataStream(self.df.join(F.broadcast(rules), F.expr(on)))

    # -- sinks / escape hatches -----------------------------------------
    def to_df(self) -> DataFrame:
        return self.df

    def print(self, n: int = 20) -> None:
        self.df.show(n, truncate=False)


class KeyedStream:
    def __init__(self, df: DataFrame, keys: list[str]):
        self.df = df
        self.keys = keys

    def window_tumbling(self, time_col: str, unit: str) -> "KeyedStream":
        """Tumbling event-time window as an extra grouping column
        (`unit` per date_trunc: 'hour', 'day', ...) — EventTimeWindows
        parity for fully-arrived data; the streaming twins in
        streaming/jobs.py carry the watermark semantics."""
        bucket = F.date_trunc(unit, F.col(time_col)).alias("window_start")
        return KeyedStream(self.df.withColumn("window_start", bucket),
                           self.keys + ["window_start"])

    def aggregate(self, **aggs: str) -> DataStream:
        """Named SQL aggregate expressions over the keyed (windowed)
        groups: `aggregate(n_matches="count(*)", sum_value="round(sum(value), 2)")`."""
        exprs = [F.expr(e).alias(n) for n, e in aggs.items()]
        return DataStream(self.df.groupBy(*self.keys).agg(*exprs))

    def reduce_sum(self, col: str) -> DataStream:
        return self.aggregate(**{f"sum_{col}": f"sum({col})"})

    def count(self) -> DataStream:
        return self.aggregate(n="count(*)")

    def process(self, fn: Callable, output_schema: str) -> DataStream:
        """KeyedProcessFunction analogue: `fn(key_tuple, pandas_df) ->
        pandas_df` runs once per key group via applyInPandas — arbitrary
        per-key logic (custom folds, order-dependent state machines) on
        the Arrow slow path. Prefer `aggregate()` expressions when the
        logic is expressible; this exists for ports whose per-key code
        resists relational rewrite (the same rule udf_surface.py's
        grouped-map key documents: bucket hot keys if groups are tiny).
        """
        return DataStream(
            self.df.groupBy(*self.keys).applyInPandas(fn, output_schema))
