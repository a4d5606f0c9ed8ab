#!/usr/bin/env python
"""Calibration-normalized bench comparison over bench_history.jsonl.

Usage: python tools/bench_compare.py [N_back] [M_back]

Compares the last run (default) against the N_back-th previous run,
NORMALIZED by the calibration probe: each query's ratio is
(t_new / c_new) / (t_old / c_old), where c is the mean of the run's
start/end probe medians. A ratio near 1.0 means the plan's cost is
unchanged regardless of how differently loaded the host was — the
mechanical version of the "compare unchanged scalar_* queries" triage
that rounds 8-9 did by hand (and that round 9's verdict showed going
wrong when done by eye).

Prints the biggest normalized regressions and wins, the median drift of
never-changed scalar_* queries (should sit at ~1.0 after normalization;
if it doesn't, the probe itself was contended — distrust the run), and
the normalized value_r1 trend.
"""

from __future__ import annotations

import json
import os
import statistics
import sys


def load_history(path: str) -> list[dict]:
    with open(path) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def calib(run: dict) -> float:
    c = run["calibration_sec"]
    return (c["start"] + c["end"]) / 2.0


def all_queries(run: dict) -> dict[str, float]:
    q = dict(run.get("medians", {}))
    q.update(run.get("extended", {}))
    return {n: t for n, t in q.items() if t and t > 0}


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hist = load_history(os.path.join(root, "bench_history.jsonl"))
    if len(hist) < 2:
        print(f"only {len(hist)} run(s) in history — nothing to compare")
        return 0
    new_i = -1 if len(sys.argv) < 3 else -int(sys.argv[2])
    old_i = -2 if len(sys.argv) < 2 else -int(sys.argv[1]) - 1
    new, old = hist[new_i], hist[old_i]
    cn, co = calib(new), calib(old)
    qn, qo = all_queries(new), all_queries(old)
    common = sorted(set(qn) & set(qo))
    print(
        f"comparing {old['ts']} (calib {co:.3f}s) -> {new['ts']} "
        f"(calib {cn:.3f}s); host speed ratio {cn / co:.2f}x; "
        f"{len(common)} comparable queries"
    )
    rows = sorted(
        ((qn[n] / cn) / (qo[n] / co), n, qn[n], qo[n]) for n in common
    )
    print("\nbiggest normalized regressions:")
    for r, n, tn, to in rows[:-9:-1]:
        print(f"  {r:5.2f}x  {n:42s} {to:7.2f} -> {tn:7.2f} s")
    print("\nbiggest normalized wins:")
    for r, n, tn, to in rows[:8]:
        print(f"  {r:5.2f}x  {n:42s} {to:7.2f} -> {tn:7.2f} s")
    scalars = [r for r, n, _, _ in rows if n.startswith("scalar_")]
    if scalars:
        med = statistics.median(scalars)
        flag = "" if 0.8 <= med <= 1.25 else "  <-- PROBE SUSPECT, distrust run"
        print(f"\nmedian scalar_* normalized drift: {med:.3f}{flag}")
    if "value_r1" in new and "value_r1" in old:
        print(
            f"value_r1: {old['value_r1']:.2f} -> {new['value_r1']:.2f} s "
            f"(normalized {(new['value_r1'] / cn) / (old['value_r1'] / co):.3f}x)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
