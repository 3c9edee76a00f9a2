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

from flink_tutorial_broadcast_spark.io import load
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


_PAGERANK_ORACLE = """
    WITH e AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
      FROM lineitem l
      JOIN orders   o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey  = c.c_custkey
      JOIN supplier s ON l.l_suppkey  = s.s_suppkey
      GROUP BY 1, 2
    ),
    outw AS (SELECT src, SUM(w) AS tw FROM e GROUP BY src),
    t AS (SELECT e.src, e.dst, e.w / outw.tw AS p
          FROM e JOIN outw ON e.src = outw.src),
    nodes AS (SELECT n_nationkey AS node FROM nation),
    r0 AS (SELECT node, 1.0 / 25 AS r FROM nodes),
    {iters}
    SELECT node AS nationkey, ROUND(r, 6) AS rank FROM r5
"""

_PAGERANK_ITER = """
    r{k} AS (
      SELECT n.node,
             0.15 / 25 + 0.85 * COALESCE(SUM(p.r * t.p), 0) AS r
      FROM nodes n
      LEFT JOIN t ON t.dst = n.node
      LEFT JOIN r{km1} p ON p.node = t.src
      GROUP BY n.node
    )"""


@query(
    "q_pagerank",
    oracle=_PAGERANK_ORACLE.format(iters=",".join(
        _PAGERANK_ITER.format(k=k, km1=k - 1) for k in range(1, 6))),
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (5 iterations, damping 0.85) over the
    nation-level trade graph: edge src→dst weighted by how many lineitems
    customers of nation src bought from suppliers of nation dst.

    The canonical fixed-point iteration as a driver loop of join+agg
    rounds — the oracle is the SAME recurrence unrolled into 5 chained
    CTEs, so the hash check covers every iteration's arithmetic. Scale:
    the edge list (≤ N² nation pairs) and rank vector (N rows) are tiny
    FOREVER regardless of fact-table size — the only big work is the one
    edge-building join pass, after which iteration cost is independent of
    corpus scale. The transition matrix is checkpointed once (and
    coalesced to ONE partition — ≤ N² rows forever) and reused by all 5
    rounds instead of re-running the 4-way join; with the round count
    fixed at 5 the rank vector checkpoints only at the END (plan depth
    stays bounded), cutting five materialization jobs — a variable-round
    caller should checkpoint periodically instead (the facade iterate()
    verb keeps checkpoint_every for exactly that).
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    e = (li.join(o, li.l_orderkey == o.o_orderkey)
         .join(c, o.o_custkey == c.c_custkey)
         .join(s, li.l_suppkey == s.s_suppkey)
         .groupBy(F.col("c_nationkey").alias("src"),
                  F.col("s_nationkey").alias("dst"))
         .agg(F.count("*").alias("w")))
    outw = e.groupBy("src").agg(F.sum("w").alias("tw"))
    t = (e.join(outw, "src")
         .select("src", "dst", (F.col("w") / F.col("tw")).alias("p"))
         .coalesce(1).localCheckpoint(eager=True))
    nodes = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node")).coalesce(1)
    r = nodes.withColumn("r", F.lit(1.0 / 25))
    for i in range(1, 6):
        contrib = (t.join(r.withColumnRenamed("node", "src"), "src")
                   .groupBy(F.col("dst").alias("node"))
                   .agg(F.sum(F.col("p") * F.col("r")).alias("m")))
        r = (nodes.join(contrib, "node", "left")
             .select("node",
                     (F.lit(0.15 / 25)
                      + 0.85 * F.coalesce(F.col("m"), F.lit(0.0))).alias("r")))
        if i == 5:
            r = r.coalesce(1).localCheckpoint(eager=True)
    return r.select(F.col("node").alias("nationkey"),
                    F.round("r", 6).alias("rank"))


_KMEANS_ASSIGN_SQL = """
      SELECT vec_id, cid FROM (
        SELECT d.vec_id, d.cid,
               row_number() OVER (PARTITION BY d.vec_id
                                  ORDER BY d.dist, d.cid) AS rn
        FROM (
          SELECT l.vec_id, c.cid,
                 SUM((l.q - c.c) * (l.q - c.c)) AS dist
          FROM long l JOIN {cent} c ON c.dim = l.dim
          GROUP BY 1, 2
        ) d
      ) WHERE rn = 1
"""


@query(
    "q_kmeans_quantized",
    oracle=f"""
    WITH long AS (
      SELECT vec_id, CAST(i.range AS INT) AS dim,
             CAST(FLOOR(embedding[CAST(i.range AS INT) + 1] * 32) AS BIGINT)
               AS q
      FROM embeddings, range(64) i
    ), c0 AS (
      SELECT vec_id AS cid, dim, q AS c FROM long WHERE vec_id < 8
    ), a1 AS (
      {_KMEANS_ASSIGN_SQL.format(cent="c0")}
    ), c1 AS (
      SELECT a1.cid, l.dim,
             CAST(FLOOR(CAST(SUM(l.q) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
      FROM long l JOIN a1 ON a1.vec_id = l.vec_id
      GROUP BY 1, 2
    ), a2 AS (
      {_KMEANS_ASSIGN_SQL.format(cent="c1")}
    )
    SELECT cid AS cluster, COUNT(*) AS n_members,
           CAST(SUM(vec_id) AS BIGINT) AS id_checksum
    FROM a2 GROUP BY cid
    """,
)
def q_kmeans_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k=8, 2 rounds) over int-quantized embeddings —
    iterative ML with a bit-exact oracle. Every arithmetic step is
    engine-deterministic: codes are floor(x·32) (×32 is an exact IEEE
    scaling, so the floor is unambiguous), distances are INTEGER sums of
    squares (order-free), argmin tie-breaks on centroid id, and centroid
    updates floor an exactly-representable double ratio. The float
    pitfalls of k-means (summation-order-dependent distances flipping
    near-tie assignments) are engineered out rather than tolerated —
    the same trick production pipelines use to make clustering runs
    reproducible across partitionings.

    Spark shape: long-form codes (vec, dim, q); per round one join
    against the ≤8×64-row broadcast centroid table, a (vec, cid)
    aggregate, an argmin window, and the centroid re-aggregate;
    `localCheckpoint()` truncates lineage between rounds (the 100 TB
    iteration pattern, same as PageRank/components above).
    """
    e = load(spark, sf_dir, "embeddings")
    long = e.select(
        "vec_id",
        F.posexplode("embedding").alias("dim", "x"),
    ).select(
        "vec_id", "dim",
        F.floor(F.col("x") * 32).cast("long").alias("q"),
    )
    long = long.localCheckpoint()

    cent = (
        long.filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("cid"), "dim", F.col("q").alias("c"))
    )

    def assign(cent_df: DataFrame) -> DataFrame:
        d = (
            long.join(F.broadcast(cent_df), "dim")
            .groupBy("vec_id", "cid")
            .agg(
                F.sum(
                    (F.col("q") - F.col("c")) * (F.col("q") - F.col("c"))
                ).alias("dist")
            )
        )
        w = Window.partitionBy("vec_id").orderBy("dist", "cid")
        return (
            d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cid")
        )

    for _ in range(1):  # one update round → assignments a2 (2 assigns total)
        a = assign(cent)
        cent = (
            long.join(a, "vec_id")
            .groupBy("cid", "dim")
            .agg(
                F.floor(
                    F.sum("q").cast("double") / F.count("*")
                ).cast("long").alias("c")
            )
        ).localCheckpoint()
    a_final = assign(cent)
    return a_final.groupBy(F.col("cid").alias("cluster")).agg(
        F.count("*").alias("n_members"),
        F.sum("vec_id").alias("id_checksum"),
    )


@query(
    "q_power_iteration",
    oracle="""
    WITH x AS (
      SELECT vec_id, i.range AS pos,
             CAST(embedding[CAST(i.range AS INT) + 1] AS DOUBLE) AS v
      FROM embeddings, range(64) i
    ), stats AS (
      SELECT pos, MIN(v) AS mn, MAX(v) AS mx FROM x GROUP BY pos
    ), c AS (
      SELECT x.vec_id, x.pos,
             CAST(LEAST(FLOOR((x.v - s.mn) * 256 / (s.mx - s.mn)), 255)
                  AS BIGINT) AS code
      FROM x JOIN stats s USING (pos)
    ), w1 AS (
      SELECT c.pos, CAST(SUM(c0.code * c.code) AS BIGINT) AS w
      FROM c JOIN (SELECT vec_id, code FROM c WHERE pos = 0) c0
        USING (vec_id)
      GROUP BY c.pos
    ), u2 AS (
      SELECT c.vec_id, CAST(SUM(c.code * w1.w) AS BIGINT) AS u
      FROM c JOIN w1 USING (pos) GROUP BY c.vec_id
    ), w2 AS (
      SELECT c.pos, CAST(SUM(u2.u * c.code) AS BIGINT) AS w
      FROM c JOIN u2 USING (vec_id) GROUP BY c.pos
    ), mx AS (SELECT MAX(w) AS m FROM w2)
    SELECT w2.pos, w2.w AS raw,
           CAST(CAST(w2.w AS HUGEINT) * 1000000 // mx.m AS BIGINT) AS direction_ppm
    FROM w2, mx
    """,
)
def q_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed power iteration — the PCA/spectral primitive as two
    exact-integer matvec rounds: over the 256-level integer code matrix
    C (q_embed_quantize's transform), compute w = (CᵀC)² e₀ without
    ever materializing the d×d Gram matrix. Each half-round is one
    shuffle: u = C·w groups by vec_id, w' = Cᵀ·u groups by pos; the
    iterate vector (64 rows) rides a broadcast join. Everything stays
    int64 — the two unnormalized rounds are EXACT cross-engine (bound:
    n·d·255³ ≈ 1.1e18 < 2^63 at the fixture scales; at larger n,
    production normalizes the iterate between rounds in floats, same
    plan shape) — so this iterative linear-algebra kernel hash-matches
    the oracle, like q_kmeans_quantized's integer Lloyd discipline.
    Output: the unnormalized second iterate and its direction in
    integer ppm of the max component (the dominant right-singular
    direction estimate of C)."""
    from flink_tutorial_broadcast_spark.operators.vector_compress import (
        int_codes,
    )
    # the per-fixture cached code table (shared with the PQ index) feeds
    # all four matvec joins — no re-explode, no re-checkpoint
    c = int_codes(spark, sf_dir)
    c0 = (c.filter(F.col("pos") == 0)
          .select("vec_id", F.col("code").alias("code0")))
    w1 = (c.join(c0, "vec_id")
          .groupBy("pos")
          .agg(F.sum(F.col("code0") * F.col("code")).alias("w")))
    u2 = (c.join(F.broadcast(w1), "pos")
          .groupBy("vec_id")
          .agg(F.sum(F.col("code") * F.col("w")).alias("u")))
    w2 = (c.join(u2, "vec_id")
          .groupBy("pos")
          .agg(F.sum(F.col("u") * F.col("code")).alias("w")))
    mx = w2.agg(F.max("w").alias("m"))
    # w*1e6 exceeds int64 (w ~ n²·d·255³); route the scaling through an
    # exact DECIMAL so the floor-divide stays integer-exact cross-engine
    return (w2.crossJoin(F.broadcast(mx))
            .select(F.col("pos").cast("long").alias("pos"),
                    F.col("w").alias("raw"),
                    F.expr("CAST(CAST(w AS DECIMAL(30,0)) * 1000000 "
                           "DIV m AS BIGINT)").alias("direction_ppm")))
