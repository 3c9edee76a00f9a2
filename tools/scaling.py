"""Scale-factor scaling evidence (BASELINE.md "Interpretation").

Runs a subset of headline queries at sf0.001 / sf0.01 / sf0.1 (100× data
range) in one warm session and prints per-query wall-clock. The claim it
substantiates: Spark's per-query cost at these sizes is a fixed
scheduling floor plus a small marginal per-row cost — total time grows
far slower than data size (sublinear over 100×), which is exactly the
profile that wins once data no longer fits one embedded process.

Usage: python tools/scaling.py   (prints a JSON line per sf + a summary)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_tutorial_broadcast_spark import load_all_queries  # noqa: E402
from flink_tutorial_broadcast_spark.session import get_spark  # noqa: E402

QUERIES = ["q_broadcast_rule_join", "q_join_inner", "q_agg_basic",
           "q_window_tumbling", "q_dedup_exact", "q_token_counts"]
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]


def main() -> None:
    queries = load_all_queries()
    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    # warm every (query, sf) once: JIT, codegen cache, parquet footers
    for sf_dir in SF_DIRS:
        for name in QUERIES:
            queries[name](spark, sf_dir).count()

    totals: dict[str, float] = {}
    for sf_dir in SF_DIRS:
        per_query = {}
        for name in QUERIES:
            t0 = time.time()
            queries[name](spark, sf_dir).count()
            per_query[name] = round(time.time() - t0, 3)
        sf = os.path.basename(sf_dir).replace("sf", "")
        totals[sf] = round(sum(per_query.values()), 3)
        print(json.dumps({"sf": float(sf), "total_s": totals[sf],
                          "queries": per_query}))
    lo, hi = totals[min(totals)], totals[max(totals)]
    print(json.dumps({
        "data_range": "100x",
        "wall_clock_ratio": round(hi / lo, 2),
        "verdict": "sublinear" if hi / lo < 20 else "superlinear?",
    }))


if __name__ == "__main__":
    main()
