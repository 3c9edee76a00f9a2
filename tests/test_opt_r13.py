"""Round-13 optimization pins: each test freezes the CONTRACT of an
internals change made for performance (guide-driven), so a later round
cannot silently regress the equivalence the optimization relied on.

Covered:
- io.local_rows_df: the Arrow inline-rows path is row/schema-identical
  to spark.createDataFrame(list) and plans NO Python-RDD scan (the
  whole point: no Python worker launch per query evaluation).
- q_knn_bruteforce: the vectorized np.cumsum cosine is bit-identical to
  the JVM aggregate(zip_with(...)) left fold it replaced.
- q_tfidf: df derived from tf (count over distinct (doc, token) pairs)
  equals the countDistinct-over-raw-tokens formulation it replaced.
- q_pandas_udf_cosine: the sign-preserving round keeps IEEE -0.0 where
  Spark's BigDecimal Round would return +0.0 (the inherited sf0.001
  oracle mismatch).
- session parallelism floors: small scans split to more than the 1-3
  splits the 4 MB openCost default allowed.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_tutorial_broadcast_spark.io import load, local_rows_df
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_local_rows_df_matches_list_path_and_avoids_python_rdd(spark):
    from flink_tutorial_broadcast_spark.sources.rules import (
        RULES, RULES_SCHEMA)
    fast = local_rows_df(spark, RULES, RULES_SCHEMA)
    slow = spark.createDataFrame(RULES, RULES_SCHEMA)
    assert fast.schema == slow.schema
    assert sorted(map(tuple, fast.collect())) == \
        sorted(map(tuple, slow.collect()))
    # the list path plans applySchemaToPythonRDD (a Python-worker scan);
    # the Arrow path must not
    assert "PythonRDD" not in _plan(fast)


def test_local_rows_df_ddl_schema_and_nulls(spark):
    rows = [("a", 1, None), ("b", None, 2.5)]
    df = local_rows_df(spark, rows, "k string, n long, v double")
    got = sorted(map(tuple, df.collect()))
    assert got == [("a", 1, None), ("b", None, 2.5)]


def test_knn_bruteforce_cos_bit_identical_to_jvm_fold(spark, queries):
    """The np.cumsum dot/norm fold must reproduce the exact doubles of
    the aggregate(zip_with(...)) expression it replaced — same IEEE ops
    in the same order, so equality is exact, not approximate."""
    from flink_tutorial_broadcast_spark.operators.llm_knn import (
        _N_PROBES, _cosine)
    emb = load(spark, SF_SMOKE, "embeddings")
    probes = (emb.filter(F.col("vec_id") < _N_PROBES)
              .select(F.col("vec_id").alias("p_id"),
                      F.col("embedding").alias("p_emb")))
    pairs = (emb.crossJoin(F.broadcast(probes))
             .filter(F.col("vec_id") != F.col("p_id"))
             .select("p_id", "vec_id",
                     _cosine(F.col("embedding"), F.col("p_emb"))
                     .alias("cos")))
    jvm = {(r["p_id"], r["vec_id"]): r["cos"] for r in pairs.collect()}
    got = queries["q_knn_bruteforce"](spark, SF_SMOKE).collect()
    assert len(got) == _N_PROBES * 5
    for r in got:
        expect = round(jvm[(r["p_id"], r["vec_id"])], 6)
        assert r["cos_sim"] == expect, (r, expect)


def test_tfidf_df_from_tf_equals_count_distinct(spark, queries):
    d = load(spark, SF_SMOKE, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    naive = {r["token"]: r["df"]
             for r in toks.groupBy("token")
             .agg(F.countDistinct("doc_id").alias("df")).collect()}
    got = queries["q_tfidf"](spark, SF_SMOKE).collect()
    assert got, "tfidf returned no rows"
    n_docs = d.count()
    for r in got:
        assert r["df"] == naive[r["token"]]
        assert r["tfidf"] == round(
            r["tf"] * math.log(float(n_docs) / r["df"]), 6)


def test_pandas_udf_cosine_preserves_negative_zero(spark, queries):
    """vec_id 248 at sf0.001 has cosine -4.39e-5: ROUND(.., 4) must keep
    the IEEE sign (DuckDB semantics), not BigDecimal's unsigned zero."""
    rows = {r["vec_id"]: r["cos_sim"]
            for r in queries["q_pandas_udf_cosine"](spark, SF_SMOKE)
            .collect()}
    assert 248 in rows
    assert rows[248] == 0.0
    assert math.copysign(1.0, rows[248]) == -1.0, \
        "round dropped the negative-zero sign"


def test_dedup_substr_interval_union_equals_position_count(spark, queries):
    """The window interval-union sweep must count exactly the positions
    the ×w explode + countDistinct it replaced would count."""
    from flink_tutorial_broadcast_spark.operators.llm_dedup import _SUBSTR_W
    w = _SUBSTR_W
    docs = (load(spark, SF_SMOKE, "documents")
            .select("doc_id", F.split("text", " ").alias("toks"))
            .withColumn("n_tokens", F.size("toks").cast("long"))
            .filter(F.col("n_tokens") >= w))
    sh = (docs
          .select("doc_id", "n_tokens",
                  F.explode(F.expr(f"sequence(1, size(toks) - {w} + 1)"))
                  .alias("s"),
                  F.md5(F.array_join(F.slice("toks", F.col("s"), w), " "))
                  .alias("h")))
    rep = (sh.groupBy("h")
           .agg(F.countDistinct("doc_id").alias("nd"))
           .filter(F.col("nd") > 1).select("h"))
    naive = {(r["doc_id"], r["n_tokens"]): r["n_repeated_tokens"]
             for r in sh.join(rep, "h")
             .select("doc_id", "n_tokens",
                     F.explode(F.expr(f"sequence(s, s + {w} - 1)"))
                     .alias("p"))
             .groupBy("doc_id", "n_tokens")
             .agg(F.countDistinct("p").alias("n_repeated_tokens"))
             .collect()}
    got = queries["q_dedup_substr"](spark, SF_SMOKE).collect()
    assert {(r["doc_id"], r["n_tokens"]): r["n_repeated_tokens"]
            for r in got} == naive


def test_small_scan_splits_beyond_open_cost_floor(spark):
    """With the 128 KB openCostInBytes floor a ~600 KB fixture must scan
    as >1 split (the 4 MB default packed every fixture into 1-3 splits,
    serializing all map-side work)."""
    d = load(spark, "/root/testdata/sf0.1", "documents")
    assert d.rdd.getNumPartitions() > 1
