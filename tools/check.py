"""Local mimic of the driver's t2 correctness gate.

Runs every registered query at a given sf_dir on Spark AND its DuckDB
oracle SQL, then compares row-count + schema (sorted column names) +
order-insensitive canonical value-hash. Usage:

    python tools/check.py                 # all queries, sf0.01
    python tools/check.py q_filter q_agg  # subset
    SPARK_GRAFT_CHECK_SF=/root/testdata/sf0.001 python tools/check.py

Exit code 0 iff everything matches. On mismatch, prints a bounded diff of
canonical rows present on one side only.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def canon_cell(v) -> str:
    """Canonical string for one cell, shared by both engines' outputs.

    Driver-strict: floats are NOT folded to ints (`3.0` ≢ `3` — DuckDB's
    HUGEINT-from-integer-SUM renders float64 and the driver's hash sees the
    difference; the oracle SQL must CAST instead). NULL ≡ NaN is kept: both
    engines' pandas conversions promote nullable int64 to float64-with-NaN,
    so the driver never sees a None-vs-NaN split for matching results.
    """
    if v is None:
        return "∅"
    if isinstance(v, float):  # np.float64 subclasses float
        if math.isnan(v):
            return "∅"
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return ("{" + ",".join(f"{k}:{canon_cell(v[k])}"
                               for k in sorted(v)) + "}")
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v)).lower()
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append("|".join(canon_cell(v) for v in row))
    out.sort()
    return out


def value_hash(rows: list[str]) -> str:
    h = hashlib.md5()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    from flink_tutorial_broadcast_spark.io import TABLES
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def spark_to_pandas(sdf) -> pd.DataFrame:
    # toPandas(), not collect(): the driver converts via Arrow, which
    # promotes nullable int64 to float64 — the comparison must see the
    # same dtypes the driver's hash sees.
    return sdf.toPandas()


def dtype_kind(dtype) -> str:
    k = dtype.kind  # i/u/f/O/b/M/m
    return {"u": "i", "m": "M"}.get(k, k)


def kind_problems(spdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Driver-visible dtype divergences: int on one side, float on the
    other hashes `5` vs `5.0` even when values are semantically equal."""
    out = []
    for c in spdf.columns:
        if c not in odf.columns:
            continue
        sk, ok = dtype_kind(spdf[c].dtype), dtype_kind(odf[c].dtype)
        if sk != ok and {sk, ok} == {"i", "f"}:
            out.append(f"dtype[{c}] spark={spdf[c].dtype} duckdb={odf[c].dtype}")
    return out


def main(argv: list[str]) -> int:
    from flink_tutorial_broadcast_spark import ORACLE, load_all_queries
    from flink_tutorial_broadcast_spark.session import (
        get_spark, release_cached_blocks,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")
    queries = load_all_queries()
    names = argv or sorted(queries)
    spark = get_spark("check")
    con = duckdb_con(sf_dir)

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        # free the previous query's localCheckpoint/cache blocks — the
        # sweep builds hundreds of DataFrames in one session and eagerly
        # checkpointed subplans otherwise accumulate executor storage
        release_cached_blocks(spark)
        if name not in queries:
            print(f"  ?? {name}: not registered")
            n_fail += 1
            continue
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            spdf = spark_to_pandas(sdf)
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in ORACLE:
            print(f"rows {name}: {len(spdf)} rows (no oracle) [{dt:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(ORACLE[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if len(spdf) != len(odf):
            problems.append(f"rowcount spark={len(spdf)} duckdb={len(odf)}")
        if sorted(spdf.columns) != sorted(odf.columns):
            problems.append(
                f"schema spark={sorted(spdf.columns)} duckdb={sorted(odf.columns)}")
        if not problems:
            problems.extend(kind_problems(spdf, odf))
        if not problems:
            srows, orows = canon_rows(spdf), canon_rows(odf)
            if value_hash(srows) != value_hash(orows):
                sset, oset = set(srows), set(orows)
                only_s = sorted(sset - oset)[:5]
                only_o = sorted(oset - sset)[:5]
                problems.append(
                    "value-hash mismatch\n"
                    + "".join(f"    spark-only:  {r}\n" for r in only_s)
                    + "".join(f"    duckdb-only: {r}\n" for r in only_o))
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(spdf)} rows [{dt:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail "
          f"(sf_dir={sf_dir})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
