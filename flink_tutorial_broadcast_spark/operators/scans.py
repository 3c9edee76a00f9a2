"""Sources/scans (SURVEY.md §2.A): inline collections and parquet scans.

Reference anchors: Flink ``StreamExecutionEnvironment#fromElements`` (A1)
and file sources (A3/A5). The engine's canonical scan is a parquet read
with an explicit schema — column pruning + predicate pushdown reach the
scan (see plans.scan_audit for the explain check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, StringType, StructField, StructType,
)

from flink_tutorial_broadcast_spark.io import load, local_rows_df
from flink_tutorial_broadcast_spark.registry import query

# A1 — the in-memory collection source (fromElements analogue).
_SENSORS = [
    (1, "alpha", 20.5), (2, "beta", 31.0), (3, "gamma", 15.25),
    (4, "delta", 42.75), (5, "epsilon", 28.0),
]
_SENSORS_SCHEMA = StructType([
    StructField("sensor_id", IntegerType(), False),
    StructField("sensor_name", StringType(), False),
    StructField("reading", DoubleType(), False),
])
_SENSORS_SQL = (
    "(VALUES " + ", ".join(f"({i}, '{n}', {r!r})" for i, n, r in _SENSORS)
    + ") AS sensors(sensor_id, sensor_name, reading)"
)


@query(
    "q_scan_inline",
    oracle=f"""
    SELECT sensor_id, upper(sensor_name) AS sensor_name_u,
           ROUND(reading * 2.0, 2) AS reading_x2
    FROM {_SENSORS_SQL} WHERE reading > 16.0
    """,
)
def q_scan_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: inline collection source + map + filter (fromElements→map→filter)."""
    df = local_rows_df(spark, _SENSORS, _SENSORS_SCHEMA)
    return (
        df.filter(F.col("reading") > 16.0)
        .select(
            "sensor_id",
            F.upper("sensor_name").alias("sensor_name_u"),
            F.round(F.col("reading") * 2.0, 2).alias("reading_x2"),
        )
    )


@query(
    "q_scan_parquet",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_totalprice > 400000.0
    """,
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: parquet scan with pruned columns + pushed-down predicate.

    The 3-column projection and the > filter must reach the parquet reader
    (ReadSchema / PushedFilters) — at 100 TB this is the difference between
    scanning 3 columns of row groups that survive min/max stats and
    scanning everything.
    """
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000.0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
