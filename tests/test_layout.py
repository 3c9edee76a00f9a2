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
