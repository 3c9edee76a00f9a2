"""Regression guard for the driver's value-hash dtype sensitivity.

Round-2 driver failure class: DuckDB's SUM over an integer expression
returns HUGEINT, which pandas renders float64, while Spark returns int64;
the driver hashes `5` and `5.0` differently even when rows/schema match
(7 keys red in CORRECTNESS_r02.json). Two layers of defence:

1. ``canon_cell`` in tools/check.py must be STRICT (no `3.0 ≡ 3` fold) so
   the local gate reproduces the driver's sensitivity.
2. A full dtype-kind sweep: every oracle-backed key's Spark schema kind
   must agree with its DuckDB output kind wherever the driver would see a
   `5`-vs-`5.0` split (int-vs-float with no nulls to promote both sides).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_SMOKE  # noqa: E402
from tools.check import canon_cell, kind_problems  # noqa: E402
from tools.dtype_sweep import pandas_kind, spark_kind  # noqa: E402


def test_canon_cell_is_dtype_strict():
    assert canon_cell(5) != canon_cell(5.0)
    assert canon_cell(0) != canon_cell(0.0)
    assert canon_cell(-3) != canon_cell(-3.0)
    # NULL ≡ NaN is intentionally kept: both engines' pandas conversions
    # promote nullable int64 to float64-with-NaN.
    assert canon_cell(None) == canon_cell(float("nan"))


def test_kind_problems_flags_int_vs_float():
    import pandas as pd
    spdf = pd.DataFrame({"a": [1, 2], "b": [1.5, 2.5]})
    odf = pd.DataFrame({"a": [1.0, 2.0], "b": [1.5, 2.5]})
    probs = kind_problems(spdf, odf)
    assert len(probs) == 1 and "dtype[a]" in probs[0]
    assert kind_problems(spdf, spdf) == []


def test_every_oracle_key_has_dtype_parity(spark, queries, duck):
    """The full sweep from tools/dtype_sweep.py, as a standing gate.

    Spark side is schema-only (no execution for lazily-planned queries);
    each oracle runs once at sf0.001, so the whole sweep stays cheap.
    """
    from flink_tutorial_broadcast_spark import ORACLE

    bad = []
    for name, fn in queries.items():
        if name not in ORACLE:
            continue
        sdf = fn(spark, SF_SMOKE)
        s_kinds = {f.name: spark_kind(f.dataType.simpleString())
                   for f in sdf.schema.fields}
        odf = duck.execute(ORACLE[name]).df()
        for c in odf.columns:
            sk, ok = s_kinds.get(c), pandas_kind(odf[c].dtype)
            if sk is None or sk == ok or {sk, ok} != {"i", "f"}:
                continue
            if ok == "f" and odf[c].isna().any():
                continue  # nulls promote BOTH sides to float at the driver
            bad.append(f"{name}.{c}: spark={sk} duckdb={ok}")
    assert not bad, "uncast integer aggregate in oracle SQL:\n" + "\n".join(bad)
