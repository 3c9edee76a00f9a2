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
# Round 13 rotation (VERDICT_r12 items 1 + 8): after r12, exactly 30
# registered keys had never been driver-sampled across r1-r12 (union
# of the CORRECTNESS_r* artifacts vs this registry): 22 oracle-backed
# keys in 8 modules + the 8 rows-only sketch/LSH keys (each carrying
# an in-engine tolerance witness since r12). 20 modules are fully
# sampled, so test_contract's per-module rule pins 20 already-sampled
# reps — 20 + 22 + 8 = 50, the registry FINISHES this round: every
# key registered through r12 gets a driver CORRECTNESS row. Rows-only
# keys are admitted to the prefix exactly because their tolerance is
# witnessed in-engine (the driver's weaker rows-only check still sees
# the bound via the witness column); test_contract names the
# allowlist. New r13 keys register AFTER the prefix and rotate into
# the r14 prefix (no r12-era key may be displaced this round without
# un-finishing the registry).
_VERIFICATION_PREFIX = (
    # -- module coverage via ALREADY-SAMPLED reps (these 20 modules
    #    have no never-sampled keys left) --
    "q_scan_inline",                    # scans (A1; r12)
    "q_window_all_facade",              # flagship windowAll (r12)
    "q_join_null_safe",                 # relational <=> join (r12)
    "q_agg_basic",                      # aggregates (D1; r12)
    "q_window_session",                 # time_windows (E3; r12)
    "q_rank",                           # analytic_windows (F1; r12)
    "q_dup_clusters",                   # iterative conn-components (r12)
    "q_setsim_join",                    # graph_setsim (L44; r12)
    "q_dedup_vectors_bucketed",         # vector_compress dedup (r12)
    "q_pandas_udf_cosine",              # udf_surface pandas UDF (r12)
    "q_audio_frame_energy",             # multimodal PCM16 energy (r12)
    "q_embed_norm_stats",               # llm_knn (drained r11)
    "q_tpch_q14",                       # composite (drained r11)
    "q_resample_interp",                # temporal (drained r11)
    "q_scan_zstd",                      # connectors (drained r12)
    "q_observed_gate",                  # governance (drained r12)
    "q_dim_encode",                     # layout_ops (drained r12)
    "q_distinct",                       # llm_dedup (drained r12)
    "q_anomaly_zscore",                 # sequence_ops (drained r12)
    "q_tpch_q15",                       # tpch_full (drained r12)
    # -- 22 FIRST-TIME oracle keys (never driver-sampled r1-r12) --
    "q_array_setops",                   # scalar_funcs array set ops
    "q_autocorr",                       # stats_ext lag autocorrelation
    "q_ngram_novelty",                  # text_pipeline novelty profile
    "q_incremental_agg",                # agg_ext merge partial aggs
    "q_bit_aggs",                       # agg_ext bit_and/or/xor
    "q_collect_set",                    # agg_ext collect_set sorted
    "q_pareto_abc",                     # agg_ext ABC classification
    "q_profile",                        # agg_ext column profiler
    "q_cumulative_distinct",            # behavioral running distinct
    "q_growth_mom",                     # behavioral MoM growth
    "q_revenue_bridge",                 # behavioral revenue bridge
    "q_cycle_time",                     # behavioral stage durations
    "q_audience_overlap",               # behavioral segment overlap
    "q_corr_stats",                     # olap_ext corr/covar matrix
    "q_edit_distance",                  # olap_ext levenshtein pairs
    "q_allocate_proration",             # olap_ext integer proration
    "q_quartile_banding",               # olap_ext ntile banding
    "q_sql_pipe_syntax",                # olap_ext SQL pipe syntax
    "q_class_upsample",                 # dataset_ops class rebalance
    "q_domain_token_cap",               # dataset_ops per-domain cap
    "q_inverted_index",                 # llm_scoring posting lists
    "q_lm_quality_bucket",              # llm_scoring LM quality bands
    # -- 8 FIRST-TIME rows-only keys (tolerance-witnessed in-engine
    #    since r12; driver records the weaker rows-only row, the
    #    witness column carries the bound) --
    "q_approx_quantiles",               # llm_scoring sketch quantiles
    "q_dedup_minhash",                  # llm_dedup banded MinHash
    "q_simhash",                        # llm_dedup 64-bit SimHash
    "q_dedup_simhash",                  # llm_dedup SimHash dedup
    "q_dedup_embed_lsh",                # llm_dedup sign-LSH embed
    "q_dedup_minhash_ml",               # ml_ops MinHashLSH twin
    "q_dedup_embed_lsh_ml",             # ml_ops BRP-LSH twin
    "q_hll_sketch",                     # dataset_ops HLL distinct
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
