"""100 TB layout behaviors, proven from executed physical plans
(docs/scale.md "Data layout"; runnable standalone via
``python -m flink_tutorial_broadcast_spark.plans.layout_demo``)."""

from __future__ import annotations

from flink_tutorial_broadcast_spark.plans.layout_demo import run_all


def test_layout_demos(spark):
    results = run_all(spark)
    assert len(results) == 3
    assert results[0].startswith("partition pruning: scan reads 1/")
    assert "dynamic partition pruning" in results[1]
    assert "zero Exchange" in results[2]


def test_cbo_stats_propagate_and_star_join_stays_broadcast(spark, tmp_path):
    """Cost-based optimization end-to-end: fixture tables registered in
    the catalog (required for ANALYZE), table + column stats computed,
    stats visible in the catalog and propagated into the optimized
    plan's cost model (EXPLAIN COST rowCount), and — with CBO and
    stats-based join reordering enabled — the star join still resolves
    both dims to broadcast and returns the same result as the
    catalog-free DataFrame form. At 100 TB, ANALYZE'd stats are what let
    Catalyst order multi-join chains by true selectivity instead of raw
    file sizes."""
    from pyspark.sql import functions as F

    from flink_tutorial_broadcast_spark.io import load
    from tests.conftest import SF_SMOKE

    db = "cbo_proof"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    spark.sql(f"CREATE DATABASE {db} LOCATION '{tmp_path / 'warehouse'}'")
    try:
        for t in ("customer", "orders", "nation"):
            load(spark, SF_SMOKE, t).write.saveAsTable(f"{db}.{t}")
            spark.sql(f"ANALYZE TABLE {db}.{t} COMPUTE STATISTICS "
                      "FOR ALL COLUMNS")

        # stats landed in the catalog
        stats = spark.sql(f"DESCRIBE TABLE EXTENDED {db}.orders").collect()
        stat_row = [r.data_type for r in stats if r.col_name == "Statistics"]
        assert stat_row and "rows" in stat_row[0]

        q = f"""
            SELECT n.n_name, COUNT(*) AS n_orders, SUM(o.o_totalprice) AS rev
            FROM {db}.orders o
            JOIN {db}.customer c ON o.o_custkey = c.c_custkey
            JOIN {db}.nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """
        old = {k: spark.conf.get(k, None) for k in
               ("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")}
        try:
            spark.conf.set("spark.sql.cbo.enabled", "true")
            spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
            # the cost model sees the ANALYZE'd row counts
            cost = spark.sql(f"EXPLAIN COST {q}").collect()[0][0]
            assert "rowCount=" in cost
            plan = spark.sql(q)._jdf.queryExecution().executedPlan().toString()
            assert plan.count("BroadcastHashJoin") == 2, plan
            got = {(r.n_name, r.n_orders) for r in spark.sql(q).collect()}
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

        exp_df = (
            load(spark, SF_SMOKE, "orders")
            .join(load(spark, SF_SMOKE, "customer"),
                  F.col("o_custkey") == F.col("c_custkey"))
            .join(load(spark, SF_SMOKE, "nation"),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name").count()
        )
        exp = {(r.n_name, r["count"]) for r in exp_df.collect()}
        assert got == exp
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
