"""Summarise the A/B bench runs produced by ab_bench.sh: per-arm totals
and medians, plus a per-query paired comparison over the arms' shared
query set (each query's median across the arm's runs).

Usage: python scripts_dev/ab_report.py [results_dir]
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys


def load_runs(results: str) -> dict[str, list[dict]]:
    arms: dict[str, list[dict]] = {}
    for path in sorted(glob.glob(os.path.join(results, "*_*.json"))):
        arm = os.path.basename(path).rsplit("_", 1)[0]
        with open(path) as fh:
            first = fh.readline()
        try:
            rec = json.loads(first)
        except ValueError:
            print(f"skip unparseable {path}", file=sys.stderr)
            continue
        arms.setdefault(arm, []).append(rec)
    return arms


def main() -> None:
    results = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.ab/results"
    arms = load_runs(results)
    med_q: dict[str, dict[str, float]] = {}
    for arm, runs in sorted(arms.items()):
        totals = [r["value"] for r in runs]
        meds = [r.get("median_sec") for r in runs]
        loads = [r.get("load", {}).get("1m") for r in runs]
        print(
            f"{arm}: n={len(runs)} totals={[round(t,1) for t in totals]} "
            f"medians={meds} start-loads={loads}"
        )
        qs: dict[str, list[float]] = {}
        for r in runs:
            for q, s in (r.get("queries") or {}).items():
                qs.setdefault(q, []).append(s)
        med_q[arm] = {q: statistics.median(v) for q, v in qs.items()}
    if len(med_q) == 2:
        (a, qa), (b, qb) = sorted(med_q.items())
        shared = sorted(set(qa) & set(qb))
        ratios = sorted(
            ((qb[q] / qa[q] if qa[q] > 0 else float("inf")), q) for q in shared
        )
        rs = [r for r, _ in ratios]
        print(
            f"\npaired {b}/{a} over {len(shared)} shared queries: "
            f"median ratio {statistics.median(rs):.3f}, "
            f"p90 {rs[int(len(rs)*0.9)]:.3f}"
        )
        print("worst 8:")
        for r, q in ratios[-8:][::-1]:
            print(f"  {r:6.2f}x  {q}  ({qa[q]:.3f}s -> {qb[q]:.3f}s)")
        print("best 8:")
        for r, q in ratios[:8]:
            print(f"  {r:6.2f}x  {q}  ({qa[q]:.3f}s -> {qb[q]:.3f}s)")
        only_b = sorted(set(qb) - set(qa))
        if only_b:
            t = sum(qb[q] for q in only_b)
            print(f"\nqueries only in {b}: {len(only_b)} totalling {t:.1f}s")
            for q in only_b:
                print(f"  {qb[q]:7.3f}s  {q}")


if __name__ == "__main__":
    main()
