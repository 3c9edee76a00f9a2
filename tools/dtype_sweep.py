"""Dtype-parity sweep: find oracle keys whose DuckDB output dtype-kind
differs from the Spark query's schema dtype-kind per column.

The driver's value hash distinguishes `5` from `5.0`, so an oracle whose
integer SUM comes back as DuckDB HUGEINT (pandas float64) hash-mismatches
a Spark int64 even when values are semantically equal. This sweep is
cheap: Spark plans are built lazily (schema only, no execution) and each
oracle runs once at sf0.001.

    python tools/dtype_sweep.py            # all oracle-backed keys
    python tools/dtype_sweep.py q_foo ...  # subset
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.001")

# Spark SQL type name -> pandas-ish dtype kind for comparison purposes.
_SPARK_KIND = {
    "tinyint": "i", "smallint": "i", "int": "i", "integer": "i",
    "bigint": "i", "long": "i",
    "float": "f", "double": "f", "decimal": "f",
    "string": "O", "varchar": "O", "char": "O",
    "boolean": "b",
    "date": "M", "timestamp": "M", "timestamp_ntz": "M",
    "binary": "O", "array": "O", "map": "O", "struct": "O", "void": "O",
}


def spark_kind(dt_simple: str) -> str:
    base = dt_simple.split("(")[0].split("<")[0].strip().lower()
    return _SPARK_KIND.get(base, "O")


def pandas_kind(dtype) -> str:
    k = dtype.kind  # i/u/f/O/b/M/m
    if k == "u":
        return "i"
    if k == "m":
        return "M"
    return k


def main(argv: list[str]) -> int:
    from flink_tutorial_broadcast_spark import ORACLE, load_all_queries
    from flink_tutorial_broadcast_spark.io import TABLES
    from flink_tutorial_broadcast_spark.session import get_spark

    queries = load_all_queries()
    names = argv or sorted(k for k in queries if k in ORACLE)
    spark = get_spark("dtype-sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")

    n_bad = 0
    for name in names:
        if name not in ORACLE:
            print(f"  -- {name}: rows-only, skipped")
            continue
        try:
            sdf = queries[name](spark, SF_DIR)
            s_kinds = {f.name: spark_kind(f.dataType.simpleString())
                       for f in sdf.schema.fields}
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: spark: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        try:
            odf = con.execute(ORACLE[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: duckdb: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        o_kinds = {c: pandas_kind(odf[c].dtype) for c in odf.columns}
        diffs = []
        for c in sorted(set(s_kinds) & set(o_kinds)):
            sk, ok = s_kinds[c], o_kinds[c]
            # Only the driver-VISIBLE hazard: a no-null int-vs-float pair
            # renders `5` on one side and `5.0` on the other. A float
            # column that carries nulls is float on BOTH sides at the
            # driver (Arrow/pandas promote nullable int64 to float64), so
            # int-vs-float-with-nulls hashes equal and is not flagged.
            if sk != ok and {sk, ok} == {"i", "f"}:
                col = odf[c]
                if ok == "f" and col.isna().any():
                    continue
                diffs.append(f"{c}: spark={sk} duckdb={ok}")
        if diffs:
            n_bad += 1
            print(f"DIFF {name}: " + "; ".join(diffs))
    print(f"\n{n_bad} keys flagged of {len(names)} checked (sf={SF_DIR})")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
