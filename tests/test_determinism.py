"""Partition-invariance guard: results must not depend on
spark.sql.shuffle.partitions.

The driver runs queries in ITS OWN session; if any float aggregate's
rounding sat on a knife edge, a different partition count (different
summation order) could flip a hashed value there but not locally. This
test re-runs the most float-sensitive queries under a deliberately odd
partition count and demands EXACT equality of the collected results.
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_SMOKE

FLOAT_SENSITIVE = [
    "q_agg_basic",
    "q_broadcast_rule_join",
    "q_winsorize",
    "q_tpch_q1",
    "q_linreg",
    "q_autocorr",
    "q_zipf_fit",
    "q_share_of_total",
    "q_growth_mom",
    "q_resample_interp",
    "q_ewma",
    "q_mad_outliers",
    "q_gini",
    "q_weighted_median",
    "q_rolling_median",
    "q_winsorize",
]


def _canon(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append("nan" if math.isnan(v) else repr(v))
            else:
                vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.mark.parametrize("key", FLOAT_SENSITIVE)
def test_result_is_partition_count_invariant(spark, queries, key):
    base = _canon(queries[key](spark, SF_SMOKE).collect())
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        alt = _canon(queries[key](spark, SF_SMOKE).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == alt, f"{key} output depends on partition count"
