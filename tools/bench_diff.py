"""Diff two BENCH_FULL_r{N}.json artifacts (tools/bench_full.py output)
and print per-key Spark-time regressions/improvements beyond a noise
threshold — the machine check VERDICT_r6 item 6 asked the prose tables
to become.

Usage:
    python tools/bench_diff.py OLD.json NEW.json [threshold_pct=25] [--json]

Exit 0 always (informational); keys present in only one artifact are
listed separately. The default 25% threshold reflects the measured
same-code cross-run envelope on this host (BASELINE.md round-7 note);
sub-second keys routinely move ±15% with identical plans.

`--json` prints ONE machine-readable JSON line instead of the table —
the form tools/release_gate.py embeds in the gate artifact so per-key
regression detection is automatic on this noisy host (VERDICT r7
item 6). Tiny absolute moves are excluded from `moved` in this mode
(|new-old| < 0.3 s — sub-second keys breathe ±15% with identical
plans; a 0.2 s key "regressing 60%" is noise, not a plan change).
"""

from __future__ import annotations

import json
import sys

# Keys with a MEASURED same-code warmth envelope wider than the diff
# threshold (VERDICT_r10 item 8 / what's-wrong item 3): their flags
# auto-annotate with the adjudicated rationale instead of reading as
# plan regressions. Membership requires an isolated same-code
# re-measure recorded in BASELINE.md — don't add keys to silence real
# regressions.
WARMTH_TAIL = {
    "q_tpch_q8": ("8-table join; AQE+codegen warmth tail measured "
                  "0.43-1.19 s on IDENTICAL code (isolated re-measures, "
                  "BASELINE.md round-10 adjudication; 7.75 s cold "
                  "first run). Flags on this key are warmth/host "
                  "variance unless the diff touches tpch_full.py."),
}


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--json"]
    as_json = "--json" in sys.argv
    if len(argv) < 2:
        print(__doc__)
        return 2
    old = json.load(open(argv[0]))["queries"]
    new = json.load(open(argv[1]))["queries"]
    thr = float(argv[2]) / 100 if len(argv) > 2 else 0.25

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

    if as_json:
        tot_a = sum(v["spark_s"] for k, v in old.items() if k in new)
        tot_b = sum(v["spark_s"] for k, v in new.items() if k in old)
        print(json.dumps({
            "threshold_pct": round(thr * 100),
            "moved": [
                {"key": k, "old_s": round(a, 3), "new_s": round(b, 3),
                 "delta_pct": round(delta * 100),
                 **({"warmth_tail": WARMTH_TAIL[k]}
                    if k in WARMTH_TAIL else {})}
                for delta, k, a, b in moved if abs(b - a) >= 0.3],
            "only_new": only_new, "only_old": only_old,
            "shared_total_old_s": round(tot_a, 1),
            "shared_total_new_s": round(tot_b, 1),
        }))
        return 0

    print(f"| key | old (s) | new (s) | delta |  (threshold ±{thr:.0%})")
    print("|---|---|---|---|")
    for delta, k, a, b in moved:
        tail = " (warmth tail - see WARMTH_TAIL)" if k in WARMTH_TAIL \
            else ""
        print(f"| {k} | {a:.3f} | {b:.3f} | {delta:+.0%} |{tail}")
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
