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
# Round 11 rotation (VERDICT_r10 item 1): 85 oracle-backed keys had
# never been driver-sampled across r1-r10 (the r10 comment's "<=75"
# was a miscount — fixed per the verdict). 39 of the 50 slots hold
# first-time keys — the structural MAXIMUM, because 11 modules
# (scans, flagship, relational, aggregates, time_windows,
# analytic_windows, iterative, graph_setsim, vector_compress,
# udf_surface, multimodal) are fully sampled and test_contract's
# per-module rule forces one already-sampled rep each. Led by the
# two SURVEY A-K planned keys with no driver row (q_dedup_exact K1,
# q_lang_stats K4) and q_tpch_q8 (the warmth-tail bench mover), plus
# the five FOUNDATIONAL CEP keys (followed_by/within/not_followed_by/
# one_or_more/times — registered r4, swapped out of every rotation
# since). Three single-key modules drain (llm_knn, composite,
# temporal). Mid-round swaps: new r11 verb keys enter as they land
# (q_cep_where_agg for q_tpch_q19, q_cep_where_prev_fork for
# q_vocab_coverage, q_cep_group_times for q_unpivot, q_cep_loop_agg
# for q_histogram — tpch_full keeps q8/q13/q22, llm_scoring keeps
# q_lang_stats/q_token_counts_regex, olap_ext keeps
# q_sample_deterministic/q_exists_correlated, agg_ext keeps
# q_string_agg/q_percentile_disc, q_cep_times_or_more for
# q_stickiness — behavioral keeps q_time_to_convert/q_cume_dist,
# q_cep_timeouts for q_snapshot_diff — dataset_ops keeps
# q_windowed_distinct;
# displaced keys are next-rotation picks). After this round 52 of the
# pre-r11 oracle keys remain never-sampled (33 first-time pre-r11 keys
# + 6 new r11 keys sampled) — r12 can take ~36 more (same per-module
# cap), r13/r14 finish.
_VERIFICATION_PREFIX = (
    # -- module coverage via ALREADY-SAMPLED reps (these 11 modules
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
    # -- 39 FIRST-TIME keys (never driver-sampled r1-r10) --
    "q_dedup_exact",                    # llm_dedup K1 (headline key!)
    "q_lang_stats",                     # llm_scoring K4
    "q_tpch_q8",                        # tpch_full 8-table (warmth tail)
    "q_dedup_embed",                    # llm_dedup embedding dedup
    "q_token_counts_regex",             # llm_scoring BPE-ish tokens
    "q_cep_where_prev_fork",            # CEP fork-family prev (NEW r11)
    "q_tpch_q13",                       # tpch_full cust distribution
    "q_tpch_q22",                       # tpch_full global sales opp
    "q_cep_where_agg",                  # CEP run-aggregate (NEW r11)
    "q_cep_followed_by",                # CEP foundation (r4 key!)
    "q_cep_within",                     # CEP horizon (r4 key!)
    "q_cep_not_followed_by",            # CEP absence (r4 key!)
    "q_cep_one_or_more",                # CEP loop (r4 key!)
    "q_cep_times",                      # CEP quantifier (r4 key!)
    "q_embed_norm_stats",               # llm_knn (drains the module)
    "q_tpch_q14",                       # composite (drains the module)
    "q_resample_interp",                # temporal (drains the module)
    "q_try_arith",                      # scalar_funcs try-arithmetic
    "q_regexp_extract_all",             # scalar_funcs regex extract
    "q_sample_deterministic",           # olap_ext seed-free sampling
    "q_exists_correlated",              # olap_ext correlated EXISTS
    "q_cep_group_times",                # CEP GroupPattern (NEW r11)
    "q_string_agg",                     # agg_ext listagg
    "q_cep_loop_agg",                   # CEP loop iter-cond (NEW r11)
    "q_percentile_disc",                # agg_ext discrete percentile
    "q_time_to_convert",                # behavioral funnel latency
    "q_cume_dist",                      # behavioral cumulative dist
    "q_cep_times_or_more",              # CEP timesOrMore (NEW r11)
    "q_nested_struct",                  # connectors struct flatten
    "q_from_csv",                       # connectors from_csv parse
    "q_nth_value",                      # stats_ext nth_value frame
    "q_benford",                        # stats_ext Benford digits
    "q_agg_pushdown_join",              # layout_ops agg-below-join
    "q_readability",                    # text_pipeline readability
    "q_zipf_fit",                       # text_pipeline Zipf slope
    "q_domain_mixture",                 # governance domain mixture
    "q_group_sample_cap",               # governance per-group cap
    "q_cep_timeouts",                   # CEP timeout output (NEW r11)
    "q_windowed_distinct",              # dataset_ops windowed distinct
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
