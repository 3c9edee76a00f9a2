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
# Round 10 rotation (VERDICT_r9 item 1): 41 of the 50 slots hold keys
# the driver has NEVER sampled across r1-r9 (116 oracle-backed
# remained) — led by the five late-r9 CEP keys the r9 rotation
# predates (q_cep_where_matches / absence_chain / not_between /
# strict_matches / loop_matches), the NINE new round-10 CEP keys
# (skip_to_next, skip_past_last, skip_to_first, skip_to_last, until,
# where_rel_fork, not_next, zero_or_more, where_prev — mid-round
# swaps for q_cep_followed_by, q_cep_times, q_try_arith, q_benford,
# q_inverted_index, q_domain_mixture, q_exists_correlated,
# q_time_to_convert, q_nested_struct, whose modules keep another
# prefix rep; those nine stay registered and sweep-checked, next
# rotation's first picks), the TPC-H tail (q2/q4/q7/q17/q20 from
# tpch_full; q10 — one of the three r9 host-drift movers — and q18
# from composite), and the eight keys the r9 comment named as
# next-rotation picks (q_median_mode, q_text_normalize, q_winsorize,
# q_ab_lift, q_psi_drift, q_hard_negatives, q_dedup_containment,
# q_audio_frame_energy). The remaining 9 slots keep already-sampled
# reps for the modules whose oracle keys are ALL sampled (scans,
# flagship, relational, aggregates, time_windows, analytic_windows,
# iterative, graph_setsim, vector_compress) — test_contract enforces
# the per-module coverage. Rotated-out keys stay registered right
# after the prefix and remain sweep-checked (tools/check.py runs all
# keys at two scales). After this round <=75 oracle keys remain
# never-sampled.
_VERIFICATION_PREFIX = (
    # -- module coverage via ALREADY-SAMPLED reps (these 9 modules have
    #    no never-sampled oracle keys left) --
    "q_scan_inline",                    # scans (A1; r9)
    "q_window_all_facade",              # flagship windowAll (r9)
    "q_join_null_safe",                 # relational <=> join (r9)
    "q_agg_basic",                      # aggregates (D1; r9)
    "q_window_session",                 # time_windows (E3; r9)
    "q_rank",                           # analytic_windows (F1; r9)
    "q_dup_clusters",                   # iterative conn-components (r9)
    "q_setsim_join",                    # graph_setsim (L44; r9)
    "q_dedup_vectors_bucketed",         # vector_compress dedup (r9)
    # -- 41 FIRST-TIME keys (never driver-sampled r1-r9) --
    "q_cep_where_matches",              # CEP binding extraction (late r9)
    "q_cep_absence_chain",              # CEP K-stage absence (late r9)
    "q_cep_not_between",                # CEP mid-pattern NFB (late r9)
    "q_cep_strict_matches",             # CEP strict bindings (late r9)
    "q_cep_loop_matches",               # CEP loop bindings (late r9)
    "q_cep_skip_to_next",               # CEP skip strategy (NEW r10)
    "q_cep_skip_past_last",             # CEP Flink-exact SPL (NEW r10)
    "q_tpch_q2",                        # tpch_full Q2 min-cost supplier
    "q_tpch_q4",                        # tpch_full Q4 EXISTS
    "q_tpch_q7",                        # tpch_full Q7 volume shipping
    "q_tpch_q17",                       # tpch_full Q17 avg-qty filter
    "q_tpch_q20",                       # tpch_full Q20 nested IN
    "q_tpch_q10",                       # composite Q10 (r9 bench mover)
    "q_tpch_q18",                       # composite Q18 large orders
    "q_cep_skip_to_first",              # CEP skip-to-first (NEW r10)
    "q_null_semantics",                 # scalar null algebra
    "q_batched_lookup_enrich",          # udf_surface batched lookup
    "q_hard_negatives",                 # llm_knn hard negatives
    "q_dedup_containment",              # llm_dedup containment
    "q_dedup_incremental",              # llm_dedup crawl rounds
    "q_cep_until",                      # CEP loop stop cond (NEW r10)
    "q_token_counts",                   # llm_scoring token counts
    "q_audio_frame_energy",             # multimodal PCM16 energy
    "q_cep_not_next",                   # CEP strict absence (NEW r10)
    "q_scalar_subquery",                # olap_ext scalar subquery
    "q_median_mode",                    # agg_ext median/mode
    "q_weighted_avg",                   # agg_ext weighted mean
    "q_cep_zero_or_more",               # CEP zeroOrMore sum (NEW r10)
    "q_ab_lift",                        # behavioral A/B lift
    "q_cep_where_prev",                 # CEP prev-element rel (NEW r10)
    "q_scan_orc",                       # connectors ORC scan
    "q_cep_skip_to_last",               # CEP skip-to-last (NEW r10)
    "q_psi_drift",                      # stats_ext PSI drift
    "q_join_shuffle_hash",              # layout_ops shuffle-hash hint
    "q_text_normalize",                 # text_pipeline normalize
    "q_split_leakage",                  # text_pipeline leakage check
    "q_cep_where_rel_fork",             # CEP fork-family rel (NEW r10)
    "q_term_redact",                    # governance term redaction
    "q_open_orders",                    # temporal open-interval count
    "q_winsorize",                      # dataset_ops winsorize
    "q_pii_redact",                     # dataset_ops PII redaction
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
