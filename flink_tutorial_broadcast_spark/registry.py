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
    # llm_ops was split in round 5 (keys unchanged): dedup / knn / scoring
    "flink_tutorial_broadcast_spark.operators.llm_knn",
    "flink_tutorial_broadcast_spark.operators.llm_dedup",
    "flink_tutorial_broadcast_spark.operators.llm_scoring",
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


# The driver's oracle sweep checks a 50-key prefix of the registry in dict
# order. This curated prefix puts one-or-more oracle-backed representatives
# of EVERY operator family first, so the independent DuckDB check spans the
# whole surface instead of exhausting itself inside the first few modules.
# Keys not listed keep their registration order after the prefix; no key is
# ever removed or renamed (the inventory is monotone).
#
# Round 7 rotation: 15 slots swapped toward keys the driver has NEVER
# sampled across r1-r6 (186 such keys remained; VERDICT_r6 item 1) —
# graph/iterative (PageRank, triangle count), layout (Bloom-filter
# join, Z-order), LM-pipeline gates (heavy hitters, unigram LM,
# repetition profile), behavioral/temporal (retention, transition
# matrix), the J1 scalar-UDF surface itself, semi-structured VARIANT
# extraction, random-projection compression, brute-force kNN, the JSONL
# source, and TPC-H Q12 — while keeping one-or-more representatives per
# A-K family AND per oracle-bearing module (test_contract guards both).
# Rotated-out keys stay registered right after the prefix and remain
# sweep-checked (tools/check.py runs all 300 at two scales).
_VERIFICATION_PREFIX = (
    "q_broadcast_rule_join",            # flagship (C1)
    "q_scan_parquet",                   # scans (A5)
    "q_join_inner", "q_star_join",      # C3, C6
    "q_bpe_merges",                     # text_pipeline — BPE trainer (r5)
    "q_agg_basic",                      # aggregates (D1)
    "q_window_tumbling", "q_asof_join",  # E1, C8
    "q_topk_per_group",                 # analytic windows (F4)
    "q_string_funcs",                   # scalar funcs (I1)
    "q_variant_extract",                # I7+ — VARIANT/JSON path (NEW r7)
    "q_video_features",                 # K5 — real Y4M video decode (r5)
    "q_pandas_udf_cosine",              # udf surface (J2)
    "q_py_udf",                         # J1 — THE scalar-UDF key (NEW r7)
    "q_dedup_exact_fast",               # K1
    "q_knn_vectorized", "q_knn_bruteforce",  # K3 (bruteforce NEW r7)
    "q_lang_id",                        # K4
    "q_heavy_hitters",                  # K4 — misra-gries gate (NEW r7)
    "q_unigram_lm_score",               # K4 — unigram LM gate (NEW r7)
    "q_knn_ivf", "q_knn_ivfpq",         # K3 — IVF / IVF-PQ ANN (r4)
    "q_bigram_lm_score",                # K4 — bigram-LM quality gate (r5)
    "q_random_projection",              # K3 — sign-RP compression (NEW r7)
    "q_cep_followed_by_all",            # CEP forking NFA (r5)
    "q_scan_eventlog",                  # Kafka-shape log source (r4)
    "q_scan_jsonl",                     # JSONL source (NEW r7)
    "q_broadcast_rule_mutation",        # E9 per-record rule mutation (r6)
    "q_range_join_bucketed",            # C7 — bucketed interval join (r4)
    "q_l_diversity",                    # governance l-diversity (r4)
    "q_zorder_cluster",                 # governance Z-order (NEW r7)
    "q_dedup_substr",                   # K2 — ExactSubstr coverage (r6)
    "q_compact_small_files",            # layout compaction (r3)
    "q_bloom_filter_join",              # layout Bloom pre-filter (NEW r7)
    "q_pivot",                          # olap_ext (L1)
    "q_tpch_q3",                        # composite
    "q_power_iteration",                # iterative — int matvec PCA (r6)
    "q_pagerank",                       # iterative — PageRank (NEW r7)
    "q_grouping_sets",                  # agg_ext
    "q_sessionize",                     # behavioral (L24)
    "q_retention",                      # behavioral cohorts (NEW r7)
    "q_mad_outliers",                   # stats_ext (L54)
    "q_tpch_q1", "q_tpch_q12",          # tpch_full (q12 NEW r7)
    "q_decontaminate",                  # text_pipeline (L46)
    "q_repetition_profile",             # text_pipeline (NEW r7)
    "q_setsim_join",                    # graph_setsim (L44)
    "q_triangle_count",                 # graph_setsim (NEW r7)
    "q_temporal_join",                  # temporal (L45)
    "q_transition_matrix",              # temporal Markov (NEW r7)
)


def load_all_queries() -> dict[str, QueryFn]:
    """Import every operator module (idempotent) and return the registry.

    The returned dict is ordered: `_VERIFICATION_PREFIX` first (the
    family-spanning oracle-backed sample the driver's capped sweep sees),
    then every remaining key in module registration order.
    """
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    ordered: dict[str, QueryFn] = {}
    for k in _VERIFICATION_PREFIX:
        ordered[k] = QUERIES[k]
    for k, fn in QUERIES.items():
        if k not in ordered:
            ordered[k] = fn
    return ordered
