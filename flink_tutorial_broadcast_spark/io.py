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
    # ts unit differs across fixture generations (timestamp[ns] vs [us]);
    # load() inspects the file footer and picks the right read path.
    "events": _st(
        ("event_id", LongType()), ("ts", TimestampType()),
        ("user_id", LongType()), ("event_type", StringType()),
        ("value", DoubleType()), ("props", StringType()),
    ),
    "events_ns": _st(
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


# keyed by PATH, storing the (mtime, size) stamp alongside the answer:
# fixtures regenerate between rounds, and a long-lived session must not
# serve a stale unit for a rewritten file — inserting a new stamp for a
# path REPLACES the superseded entry, so the cache is bounded by the
# number of distinct fixture paths, not the number of rewrites
_EVENTS_TS_IS_NANOS: dict[str, tuple[float, int, bool]] = {}


def _events_ts_is_nanos(path: str) -> bool:
    """True when events.ts is parquet timestamp[ns] (older fixture gens).

    `path` may be a single parquet file (the driver fixtures) or a
    DIRECTORY of part-files (multi-file layouts, e.g. the locally
    generated sf1 — r13): for a directory the first part-file's footer
    speaks for the table, since one table is written with one schema.
    """
    footer = path
    if os.path.isdir(path):
        parts = sorted(f for f in os.listdir(path)
                       if f.endswith(".parquet"))
        if not parts:
            raise FileNotFoundError(f"no parquet part-files in {path}")
        footer = os.path.join(path, parts[0])
    st = os.stat(footer)
    stamp = (st.st_mtime, st.st_size)
    hit = _EVENTS_TS_IS_NANOS.get(footer)
    if hit is None or hit[:2] != stamp:
        import pyarrow.parquet as pq

        unit = pq.read_schema(footer).field("ts").type.unit
        _EVENTS_TS_IS_NANOS[footer] = (*stamp, unit == "ns")
    return _EVENTS_TS_IS_NANOS[footer][2]


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one fixture table with its pinned schema.

    The explicit schema keeps column pruning + predicate pushdown intact
    (the reader plans against it directly). events.ts handling is
    unit-aware: fixture generations have shipped it as both timestamp[us]
    (read directly) and timestamp[ns] (illegal for Spark's parquet reader;
    scanned as int64 via spark.sql.legacy.parquet.nanosAsLong, then
    floored to µs with integer division — float division would lose
    precision at ~1.7e18 ns).
    """
    path = os.path.join(sf_dir, f"{table}.parquet")
    if table == "events" and _events_ts_is_nanos(path):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.schema(SCHEMAS["events_ns"]).parquet(path)
        # ns→µs like DuckDB's CAST(ts_ns AS TIMESTAMP): floor to microsecond
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.schema(SCHEMAS[table]).parquet(path)


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Inline rows (tiny dims, offset tables, fixtures) as a DataFrame
    via pandas + Arrow instead of ``spark.createDataFrame(list)``.

    The list path plans a Python-RDD scan (``applySchemaToPythonRDD``):
    EVERY evaluation of the query launches a Python worker round-trip to
    unpickle a handful of rows — measured +0.6-0.7 s per run on
    q_broadcast_rule_join at sf0.1 (r13, guide §4.1: keep the JVM↔Python
    boundary off the query path). The pandas+Arrow path ships the rows
    as Arrow batches the JVM reads directly; no Python worker at eval.

    ``schema`` may be a StructType or a DDL string; only flat scalar
    schemas are expected (all engine inline sources are). Empty row
    lists fall back to the list path (cold path, plans a LocalTableScan
    of zero rows either way).
    """
    import pandas as pd

    if not rows:
        return spark.createDataFrame(rows, schema)
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string
        schema = _parse_datatype_string(schema)
    pdf = pd.DataFrame(list(rows), columns=[f.name for f in schema.fields])
    return spark.createDataFrame(pdf, schema)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (SQL-entry lifecycle §3.3)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
