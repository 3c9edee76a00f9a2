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
# Round 12 rotation (VERDICT_r11 item 1): after r11, 52 oracle-backed
# keys had never been driver-sampled across r1-r11 (union of the
# CORRECTNESS_r* artifacts vs this registry). 36 of the 50 slots hold
# first-time keys — the structural MAXIMUM this round, because 14
# modules are now fully sampled (the 11 from r11 — scans, flagship,
# relational, aggregates, time_windows, analytic_windows, iterative,
# graph_setsim, vector_compress, udf_surface, multimodal — PLUS
# llm_knn, composite and temporal, drained by the r11 rotation) and
# test_contract's per-module rule forces one already-sampled rep each.
# The verdict's "size r12 at 39" predates those three drains; 36 is
# the cap. Deferred to r13 (22 keys after the r12 verb swaps,
# finishing the registry):
#   scalar_funcs: q_array_setops (displaced by q_cep_group_optional)
#   stats_ext: q_autocorr (displaced by q_cep_group_times_range)
#   text_pipeline: q_ngram_novelty (displaced by q_cep_group_zom)
#   agg_ext: q_incremental_agg q_bit_aggs q_collect_set q_pareto_abc
#            q_profile (displaced by q_cep_consecutive)
#   behavioral: q_cumulative_distinct q_growth_mom q_revenue_bridge
#               q_cycle_time
#               q_audience_overlap (displaced by
#               q_cep_allow_combinations)
#   olap_ext: q_corr_stats q_edit_distance q_allocate_proration
#             q_quartile_banding
#             q_sql_pipe_syntax (displaced by q_cep_group_loop)
#   dataset_ops: q_class_upsample q_domain_token_cap
#   llm_scoring: q_inverted_index q_lm_quality_bucket
# Mid-round swaps: new r12 verb keys enter as they land, displacing
# first-time picks whose module keeps >=1 rep (displaced keys join the
# r13 list above): q_cep_consecutive for q_profile (agg_ext keeps
# q_histogram/q_count_if_bool), q_cep_allow_combinations for
# q_audience_overlap (behavioral keeps q_stickiness/
# q_last_ignore_nulls), q_cep_group_loop for q_sql_pipe_syntax
# (olap_ext keeps q_unpivot/q_stratified_sample).
_VERIFICATION_PREFIX = (
    # -- module coverage via ALREADY-SAMPLED reps (these 14 modules
    #    have no never-sampled oracle keys left) --
    "q_scan_inline",                    # scans (A1; r10)
    "q_window_all_facade",              # flagship windowAll (r10)
    "q_join_null_safe",                 # relational <=> join (r10)
    "q_agg_basic",                      # aggregates (D1; r10)
    "q_window_session",                 # time_windows (E3; r10)
    "q_rank",                           # analytic_windows (F1; r10)
    "q_dup_clusters",                   # iterative conn-components (r10)
    "q_setsim_join",                    # graph_setsim (L44; r10)
    "q_dedup_vectors_bucketed",         # vector_compress dedup (r10)
    "q_pandas_udf_cosine",              # udf_surface pandas UDF (r8)
    "q_audio_frame_energy",             # multimodal PCM16 energy (r10)
    "q_embed_norm_stats",               # llm_knn (drained r11)
    "q_tpch_q14",                       # composite (drained r11)
    "q_resample_interp",                # temporal (drained r11)
    # -- 36 FIRST-TIME keys (never driver-sampled r1-r11) --
    "q_tpch_q15",                       # tpch_full top supplier (view)
    "q_tpch_q19",                       # tpch_full disjunct predicates
    "q_tpch_q11",                       # tpch_full important stock
    "q_tpch_q16",                       # tpch_full supplier count
    "q_anomaly_zscore",                 # sequence_ops z-score outliers
    "q_length_band_filter",             # sequence_ops run-length bands
    "q_local_maxima",                   # sequence_ops peak detection
    "q_activity_streaks",               # sequence_ops streak islands
    "q_scan_zstd",                      # connectors zstd parquet scan
    "q_scan_csv_malformed",             # connectors permissive CSV
    "q_mixture_temperature",            # governance temperature resample
    "q_observed_gate",                  # governance observed-only gate
    "q_dim_encode",                     # layout_ops dictionary encode
    "q_distinct",                       # llm_dedup D3 distinct docs
    "q_xml_extract",                    # scalar_funcs xpath extract
    "q_cep_group_optional",             # CEP group optional (NEW r12)
    "q_embed_centroid",                 # stats_ext per-class centroid
    "q_embed_quantile_norm",            # stats_ext quantile normalize
    "q_cep_group_times_range",          # CEP group times(a,b) (NEW r12)
    "q_text_pipeline_e2e",              # text_pipeline full chain
    "q_cep_group_zom",                  # CEP group zeroOrMore (NEW r12)
    "q_histogram",                      # agg_ext equi-width histogram
    "q_count_if_bool",                  # agg_ext count_if/bool_and/or
    "q_cep_consecutive",                # CEP strict-internal loop (NEW r12)
    "q_stickiness",                     # behavioral DAU/MAU stickiness
    "q_last_ignore_nulls",              # behavioral last ignore-nulls
    "q_cep_allow_combinations",         # CEP combos loop (NEW r12)
    "q_unpivot",                        # olap_ext wide->long unpivot
    "q_stratified_sample",              # olap_ext per-stratum sample
    "q_cep_group_loop",                 # CEP group one_or_more (NEW r12)
    "q_snapshot_diff",                  # dataset_ops snapshot compare
    "q_negative_sampling",              # dataset_ops negative pairs
    "q_mixture_pipeline",               # dataset_ops mixture e2e
    "q_vocab_coverage",                 # llm_scoring OOV coverage
    "q_ngram_counts",                   # llm_scoring n-gram counts
    "q_lang_confusion",                 # llm_scoring lang-ID confusion
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
