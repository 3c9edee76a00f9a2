"""Typed parquet IO for the engine.

Explicit ``StructType`` per table (FIXTURES.md) — the reference's
``TypeInformation`` discipline (static, code-defined schemas; SURVEY.md
§1.1 D7) re-expressed as Spark schemas. Never ``inferSchema``.

Scale note: at 100 TB the facts (lineitem/orders/events) would be
date-partitioned and the loader would carry partition filters; here the
fixtures are single files, and Catalyst still gets pushdown + pruning from
the parquet scan (verify with ``plans.scan_audit``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


SCHEMAS: dict[str, StructType] = {
    "region": _st(("r_regionkey", IntegerType()), ("r_name", StringType())),
    "nation": _st(
        ("n_nationkey", IntegerType()), ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "supplier": _st(
        ("s_suppkey", LongType()), ("s_name", StringType()),
        ("s_nationkey", IntegerType()), ("s_acctbal", DoubleType()),
    ),
    "customer": _st(
        ("c_custkey", LongType()), ("c_name", StringType()),
        ("c_nationkey", IntegerType()), ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "part": _st(
        ("p_partkey", LongType()), ("p_name", StringType()),
        ("p_brand", StringType()), ("p_type", StringType()),
        ("p_size", IntegerType()), ("p_retailprice", DoubleType()),
    ),
    "orders": _st(
        ("o_orderkey", LongType()), ("o_custkey", LongType()),
        ("o_orderstatus", StringType()), ("o_totalprice", DoubleType()),
        ("o_orderdate", TimestampType()), ("o_orderpriority", StringType()),
    ),
    "lineitem": _st(
        ("l_orderkey", LongType()), ("l_partkey", LongType()),
        ("l_suppkey", LongType()), ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()), ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()), ("l_tax", DoubleType()),
        ("l_returnflag", StringType()), ("l_linestatus", StringType()),
        ("l_shipdate", TimestampType()),
    ),
    # ts is timestamp[ns] in the file — illegal for Spark's parquet reader;
    # with spark.sql.legacy.parquet.nanosAsLong we scan it as raw int64
    # nanos and load() converts to µs TimestampType (ts div 1000, integer
    # division — float division would lose precision at ~1.7e18 ns).
    "events": _st(
        ("event_id", LongType()), ("ts", LongType()),
        ("user_id", LongType()), ("event_type", StringType()),
        ("value", DoubleType()), ("props", StringType()),
    ),
    "documents": _st(
        ("doc_id", LongType()), ("text", StringType()),
        ("lang", StringType()), ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _st(
        ("vec_id", LongType()), ("embedding", ArrayType(FloatType())),
        ("label", IntegerType()),
    ),
}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one fixture table with its pinned schema.

    The explicit schema keeps column pruning + predicate pushdown intact
    (the reader plans against it directly) and coerces events.ts from the
    file's timestamp[ns] to Spark's µs TimestampType deterministically.
    """
    path = os.path.join(sf_dir, f"{table}.parquet")
    if table == "events":
        # required to scan the file's timestamp[ns] column as int64 nanos;
        # set here too in case the caller's session lacks engine confs
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.schema(SCHEMAS[table]).parquet(path)
    if table == "events":
        # ns→µs like DuckDB's CAST(ts_ns AS TIMESTAMP): floor to microsecond
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (SQL-entry lifecycle §3.3)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
