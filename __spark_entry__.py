"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``flink_tutorial_broadcast_spark`` — the engine package.
The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's headline pipeline in batch form:
    events ⋈ broadcast(rules) (equi+theta) → tumbling 1h event-time agg.
    """
    from flink_tutorial_broadcast_spark.operators.flagship import flagship
    from flink_tutorial_broadcast_spark.session import tune_session
    tune_session(spark)
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from flink_tutorial_broadcast_spark import load_all_queries
    return dict(load_all_queries())


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query key (same column aliases)."""
    from flink_tutorial_broadcast_spark import ORACLE, load_all_queries
    load_all_queries()
    return dict(ORACLE)
