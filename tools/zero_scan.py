"""Signed-zero scan: execute every oracle-backed key on BOTH engines and
flag float cells that are negative zero (-0.0). DuckDB's ROUND of a tiny
negative aggregate yields -0.0 where Spark's BigDecimal round yields
+0.0 — numerically equal, value-hash different, and typically visible
only at scales where a mean/sum lands just below zero. Oracles should
normalize with `+ 0.0` after ROUND (IEEE: -0.0 + 0.0 = +0.0).

Usage: python tools/zero_scan.py [sf_dir]   (default sf0.1 — the scale
that exposed the bug; sf0.01 is usually too small to land on -0.0)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from flink_tutorial_broadcast_spark import ORACLE, load_all_queries
    from flink_tutorial_broadcast_spark.session import (
        get_spark, release_cached_blocks,
    )
    spark = get_spark("zero-scan")
    spark.sparkContext.setLogLevel("ERROR")
    qs = load_all_queries()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    flagged = []
    for name in sorted(ORACLE):
        for df, tag in ((con.execute(ORACLE[name]).df(), "duckdb"),
                        (qs[name](spark, sf_dir).toPandas(), "spark")):
            for c in df.columns:
                if df[c].dtype.kind == "f":
                    v = df[c].to_numpy()
                    nz = int(np.sum((v == 0) & np.signbit(v)))
                    if nz:
                        flagged.append(f"{name} [{tag}] {c}: {nz} cells")
        release_cached_blocks(spark)
    for f in flagged:
        print("NEG-ZERO", f)
    print(f"{len(flagged)} flagged of {len(ORACLE)} keys ({sf_dir})")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
