"""Drift-corrected bench comparison: divide this run's per-query
timings by the canary host-speed ratio before reading them against the
previous round, so cross-round VM drift (r6->r7 measured ~1.3-1.7x on
untouched queries) never masquerades as a regression.

Usage: python tools/bench_delta.py [bench_result.json] [BENCH_rN.json]
Defaults: ./bench_result.json vs the highest-round BENCH_r*.json with
a canary.  Prints a table of the largest corrected deltas and a
summary line; exit 0 always (advisory).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def load(path):
    with open(path) as fh:
        rec = json.load(fh)
    return rec.get("parsed", rec)


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cur_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        here, "bench_result.json"
    )
    cur = load(cur_path)
    if len(sys.argv) > 2:
        prev_path = sys.argv[2]
        prev_round = prev_path
    else:
        cands = []
        for pth in glob.glob(os.path.join(here, "BENCH_r*.json")):
            m = re.search(r"BENCH_r(\d+)\.json$", pth)
            if m and (load(pth) or {}).get("canary"):
                cands.append((int(m.group(1)), pth))
        if not cands:
            print("no previous BENCH_r*.json with a canary")
            return 0
        prev_round, prev_path = max(cands)
    prev = load(prev_path)

    c_cur, c_prev = cur.get("canary"), prev.get("canary")
    if not (c_cur and c_prev):
        print("canary missing on one side — raw comparison only")
        drift = 1.0
    else:
        # shuffle tracks the query mix best; geometric mean with cpu
        # hedges against one micro-op hitting a scheduler pothole
        drift = (
            (c_cur["cpu"] / c_prev["cpu"])
            * (c_cur["shuffle"] / c_prev["shuffle"])
        ) ** 0.5
        print(
            f"canary drift vs r{prev_round}: cpu "
            f"{c_cur['cpu'] / c_prev['cpu']:.2f}x, shuffle "
            f"{c_cur['shuffle'] / c_prev['shuffle']:.2f}x, "
            f"combined {drift:.2f}x"
        )

    qc, qp = cur.get("queries", {}), prev.get("queries", {})
    common = [
        k for k in qc
        if k in qp and qc[k] and qp[k] and qc[k] > 0 and qp[k] > 0
    ]
    if not common:
        print("no common queries")
        return 0
    tot_c = sum(qc[k] for k in common)
    tot_p = sum(qp[k] for k in common)
    corr = tot_c / drift
    print(
        f"common {len(common)} queries: {tot_p:.1f}s -> {tot_c:.1f}s "
        f"raw ({tot_c / tot_p:.2f}x); drift-corrected {corr:.1f}s "
        f"({corr / tot_p:.2f}x)"
    )
    rows = sorted(
        (
            (qc[k] / drift - qp[k], k, qp[k], qc[k], qc[k] / drift)
            for k in common
        ),
        reverse=True,
    )
    print("largest corrected deltas (s): prev -> raw (corrected)")
    for dlt, k, p0, c0, c1 in rows[:8]:
        if abs(dlt) < 0.75:
            break
        print(f"  {k:36s} {p0:6.1f} -> {c0:6.1f} ({c1:6.1f})  {dlt:+5.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
