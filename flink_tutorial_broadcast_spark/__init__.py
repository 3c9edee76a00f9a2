"""flink_tutorial_broadcast_spark — a PySpark-native analytics engine.

Brand-new engine (not a port) with the query and data-processing
capabilities of the reference project ``nsengupta/Flink-tutorial-broadcast``
(a Flink DataStream broadcast-state tutorial; see SURVEY.md §0 — the
reference checkout was empty, so capability anchors are the public Flink
DataStream API as catalogued in SURVEY.md §2).

Layout
------
- ``session``    : SparkSession builder with engine defaults (AQE, UTC, Arrow).
- ``io``         : explicit schemas + typed parquet loaders for the fixtures.
- ``registry``   : the query registry backing ``__spark_entry__.py``.
- ``operators/`` : relational + streaming-batch-equivalent + LLM-pipeline ops.
- ``sources/``   : batch & streaming source helpers (inline, parquet, rate…).
- ``functions/`` : scalar/vector function surface (cosine, minhash, text…).
- ``plans/``     : plan-inspection helpers (explain capture, shuffle audit).
- ``streaming/`` : true Structured Streaming formulations (broadcast state,
                   watermarks, stateful dedup) — demo-grade, driver-checked
                   via ``entry`` smoke only.
"""

from flink_tutorial_broadcast_spark.registry import ORACLE, QUERIES, load_all_queries

__all__ = ["QUERIES", "ORACLE", "load_all_queries"]
