"""Diff two BENCH_FULL_r{N}.json artifacts (tools/bench_full.py output)
and print per-key Spark-time regressions/improvements beyond a noise
threshold — the machine check VERDICT_r6 item 6 asked the prose tables
to become.

Usage:
    python tools/bench_diff.py OLD.json NEW.json [threshold_pct=25]

Exit 0 always (informational); keys present in only one artifact are
listed separately. The default 25% threshold reflects the measured
same-code cross-run envelope on this host (BASELINE.md round-7 note);
sub-second keys routinely move ±15% with identical plans.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))["queries"]
    new = json.load(open(sys.argv[2]))["queries"]
    thr = float(sys.argv[3]) / 100 if len(sys.argv) > 3 else 0.25

    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    moved = []
    for k in sorted(set(old) & set(new)):
        a, b = old[k]["spark_s"], new[k]["spark_s"]
        if a <= 0:
            continue
        delta = (b - a) / a
        if abs(delta) >= thr:
            moved.append((delta, k, a, b))
    moved.sort(reverse=True)

    print(f"| key | old (s) | new (s) | delta |  (threshold ±{thr:.0%})")
    print("|---|---|---|---|")
    for delta, k, a, b in moved:
        print(f"| {k} | {a:.3f} | {b:.3f} | {delta:+.0%} |")
    if not moved:
        print("| (no key moved beyond the threshold) | | | |")
    if only_new:
        print(f"\nnew-only keys: {', '.join(only_new)}")
    if only_old:
        print(f"removed keys: {', '.join(only_old)}")
    tot_a = sum(v["spark_s"] for v in old.values())
    tot_b = sum(v["spark_s"] for k, v in new.items() if k in old)
    print(f"\nshared-key spark total: {tot_a:.1f}s -> {tot_b:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
