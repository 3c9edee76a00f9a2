"""Full side-by-side benchmark: EVERY oracle-checked query, Spark vs
DuckDB, at $SPARK_GRAFT_SF_DIR (default sf0.1). Warm single session for
each engine; one timed run per query (these are stable at this scale —
see tools/scaling.py). Prints a markdown table + summary JSON, and
writes the per-key numbers to a machine-diffable artifact
(BENCH_FULL_r<N>.json with $BENCH_FULL_ROUND, else bench_full.json) so
cross-round per-key regressions are diffable, not prose (VERDICT_r6
item 6).

Usage: [BENCH_FULL_ROUND=7] python tools/bench_full.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from flink_tutorial_broadcast_spark import load_all_queries  # noqa: E402
from flink_tutorial_broadcast_spark.session import (  # noqa: E402
    get_spark, release_cached_blocks,
)

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    queries = load_all_queries()
    oracles = entry_mod.oracle_sql()
    names = sorted(oracles)

    spark = get_spark("bench-full")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    rows = []
    for name in names:
        # FIXED alphabetical execution order (names = sorted above),
        # decoupled from queries() registration/rotation order, so
        # bench_diff compares like warmth positions across rounds
        # (the four r8 bench_diff flags were warmth-position swings on
        # single-rep sub-second keys). Timed value = MIN of 2 reps:
        # the min is the stable estimator under JVM/codegen warmth
        # noise that a single rep is not.
        queries[name](spark, sf_dir).count()       # warm spark
        t_spark = float("inf")
        for _ in range(2):
            t0 = time.time()
            queries[name](spark, sf_dir).count()   # timed: reuses the
            t_spark = min(t_spark, time.time() - t0)  # warm blocks
        # free checkpoint/cache blocks BEFORE timing DuckDB: storage
        # accumulated across 250+ queries squeezes the same process's
        # DuckDB into spilling (measured: its motif join went 33s ->
        # 254s late in a no-release sweep)
        release_cached_blocks(spark)
        con.execute(oracles[name]).fetchall()      # warm duck
        t_duck = float("inf")
        for _ in range(2):
            t0 = time.time()
            con.execute(oracles[name]).fetchall()
            t_duck = min(t_duck, time.time() - t0)
        rows.append((name, t_spark, t_duck))

    print(f"\n| query | spark (s) | duckdb (s) | ratio |  ({sf_dir})")
    print("|---|---|---|---|")
    for name, ts, td in rows:
        print(f"| {name} | {ts:.3f} | {td:.3f} | "
              f"{ts / max(td, 1e-9):.1f}x |")
    t_spark_total = sum(r[1] for r in rows)
    t_duck_total = sum(r[2] for r in rows)
    summary = {
        "n_queries": len(rows),
        "spark_total_s": round(t_spark_total, 2),
        "duckdb_total_s": round(t_duck_total, 2),
        "ratio": round(t_spark_total / t_duck_total, 2),
        "spark_median_s": round(sorted(r[1] for r in rows)[len(rows) // 2], 3),
    }
    print(json.dumps(summary))

    rnd = os.environ.get("BENCH_FULL_ROUND")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(
        repo_root, f"BENCH_FULL_r{rnd}.json" if rnd else "bench_full.json")
    artifact = {
        "sf_dir": sf_dir,
        "protocol": ("warm single session per engine; per query: 1 "
                     "warm rep then MIN of 2 timed reps (stable under "
                     "JVM-warmth noise); release_cached_blocks between "
                     "engines; execution order = FIXED alphabetical by "
                     "key, decoupled from queries() rotation order"),
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "summary": summary,
        "queries": {
            name: {"spark_s": round(ts, 3), "duckdb_s": round(td, 3),
                   "ratio": round(ts / max(td, 1e-9), 2)}
            for name, ts, td in rows},
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
