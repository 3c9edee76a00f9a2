"""Iterative algorithms (driver-loop-over-DataFrames class): near-dup
CLUSTERING — connected components over the duplicate-pair graph.

Pairwise near-dup detection (q_dedup_near & friends) yields edges; a real
dedup pipeline must then group transitive duplicates (A~B, B~C ⇒ {A,B,C})
and keep one survivor per cluster. Connected components is the canonical
iterative Spark computation: a driver loop of joins that converges in
O(graph diameter) rounds, with per-round `localCheckpoint()` to truncate
lineage — THE pattern for iteration at 100 TB (each round is a bounded
shuffle keyed by node; state never leaves the cluster).

Oracle: DuckDB recursive CTE computing the same transitive closure —
a full value-hash check on an iterative algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_tutorial_broadcast_spark.operators.llm_ops import q_dedup_near
from flink_tutorial_broadcast_spark.registry import query

# the same bounded near-dup edge set q_dedup_near oracle-checks
_EDGES_SQL = """
    WITH RECURSIVE docs AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 200
    ), shingled AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(toks)),
                           i -> toks[i] || '_' || toks[i + 1])) AS shingles
      FROM docs
    ), exploded AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM shingled
    ), sizes AS (
      SELECT doc_id, len(shingles) AS n_shingles FROM shingled
    ), common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM exploded a JOIN exploded b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), edges AS (
      SELECT c.doc_a, c.doc_b
      FROM common c
      JOIN sizes sa ON sa.doc_id = c.doc_a
      JOIN sizes sb ON sb.doc_id = c.doc_b
      WHERE CAST(c.n_common AS DOUBLE)
            / (sa.n_shingles + sb.n_shingles - c.n_common) >= 0.5
    )
"""


@query(
    "q_dup_clusters",
    oracle=_EDGES_SQL + """
    , undirected AS (
      SELECT doc_a AS a, doc_b AS b FROM edges
      UNION SELECT doc_b, doc_a FROM edges
    ), reach AS (
      SELECT a AS node, a AS root FROM undirected
      UNION
      SELECT u.b AS node, r.root FROM reach r JOIN undirected u ON u.a = r.node
    )
    SELECT node AS doc_id, MIN(root) AS cluster,
           COUNT(*) OVER (PARTITION BY MIN(root)) AS cluster_size
    FROM reach GROUP BY node
    """,
)
def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by iterative min-label propagation: every node
    starts as its own label; each round, a node takes the min label among
    itself and its neighbors; converged when no label changes (≤ diameter
    rounds). Cluster id = smallest doc_id in the component."""
    pairs = q_dedup_near(spark, sf_dir).select("doc_a", "doc_b")
    edges = (pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
             .union(pairs.select(F.col("doc_b").alias("a"),
                                 F.col("doc_a").alias("b")))
             .distinct()
             .persist())
    labels = (edges.select(F.col("a").alias("node"))
              .distinct()
              .withColumn("label", F.col("node")))
    for _ in range(50):  # bound >> any real diameter here
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select("node",
                    F.least("label", F.coalesce("nbr_label", "label"))
                    .alias("label"))
            .localCheckpoint()  # truncate lineage each round
        )
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.label") != F.col("o.label"))
                   .count())
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return (labels.select(F.col("node").alias("doc_id"),
                          F.col("label").alias("cluster"))
            .withColumn("cluster_size",
                        F.count("*").over(Window.partitionBy("cluster"))))
