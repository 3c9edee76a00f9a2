"""Query registry — the single source of truth behind ``__spark_entry__.py``.

Each operator from SURVEY.md §2 registers one named query:

    @query("q_filter", oracle="SELECT ... FROM lineitem ...")
    def q_filter(spark, sf_dir):
        return load(spark, sf_dir, "lineitem").filter(...)

``oracle`` is the DuckDB-runnable ANSI SQL the driver compares against
(row-count + schema + order-insensitive value-hash). Omit it only for
genuinely non-SQL-expressible ops (the driver then records a weaker
rows-only check). Column names must match between both sides — alias every
computed column identically.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

# Modules that register queries on import. Order mirrors SURVEY.md §7.
_QUERY_MODULES = (
    "flink_tutorial_broadcast_spark.operators.flagship",
    "flink_tutorial_broadcast_spark.operators.scans",
    "flink_tutorial_broadcast_spark.operators.relational",
    "flink_tutorial_broadcast_spark.operators.aggregates",
    "flink_tutorial_broadcast_spark.operators.time_windows",
    "flink_tutorial_broadcast_spark.operators.analytic_windows",
    "flink_tutorial_broadcast_spark.operators.scalar_funcs",
    "flink_tutorial_broadcast_spark.operators.udf_surface",
    "flink_tutorial_broadcast_spark.operators.llm_ops",
    "flink_tutorial_broadcast_spark.operators.multimodal",
    "flink_tutorial_broadcast_spark.operators.olap_ext",
    "flink_tutorial_broadcast_spark.operators.composite",
    "flink_tutorial_broadcast_spark.operators.ml_ops",
    "flink_tutorial_broadcast_spark.operators.iterative",
    "flink_tutorial_broadcast_spark.operators.agg_ext",
    "flink_tutorial_broadcast_spark.operators.behavioral",
    "flink_tutorial_broadcast_spark.operators.sequence_ops",
    "flink_tutorial_broadcast_spark.operators.connectors",
    "flink_tutorial_broadcast_spark.operators.stats_ext",
    "flink_tutorial_broadcast_spark.operators.layout_ops",
    "flink_tutorial_broadcast_spark.operators.tpch_full",
    "flink_tutorial_broadcast_spark.operators.text_pipeline",
    "flink_tutorial_broadcast_spark.operators.governance",
    "flink_tutorial_broadcast_spark.operators.graph_setsim",
    "flink_tutorial_broadcast_spark.operators.temporal",
    "flink_tutorial_broadcast_spark.operators.vector_compress",
    "flink_tutorial_broadcast_spark.operators.dataset_ops",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver calls us with ITS session; engine confs that are
            # runtime-settable (UTC, Arrow, nanosAsLong…) must still apply.
            from flink_tutorial_broadcast_spark.session import tune_session
            tune_session(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE[name] = " ".join(oracle.split())
        return fn
    return deco


def load_all_queries() -> dict[str, QueryFn]:
    """Import every operator module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return QUERIES
