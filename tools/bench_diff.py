"""Compare two bench result JSONs per-query (mechanical regression
check between rounds).

Usage: python tools/bench_diff.py BENCH_r01.json BENCH_r02.json
       python tools/bench_diff.py BENCH_r01.json          # vs. last
                                                          # BENCH_HISTORY.jsonl line
"""

from __future__ import annotations

import json
import os
import sys


def _load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    a = _load(sys.argv[1])
    if len(sys.argv) > 2:
        b = _load(sys.argv[2])
    else:
        with open(os.path.join(repo, "BENCH_HISTORY.jsonl")) as fh:
            b = json.loads(fh.read().strip().splitlines()[-1])
    qa, qb = a.get("queries", {}), b.get("queries", {})
    print(f"{'query':38s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for name in sorted(set(qa) | set(qb)):
        va, vb = qa.get(name), qb.get(name)
        if va is None:
            print(f"{name:38s} {'-':>8} {vb:8.3f}   (new)")
            continue
        if vb is None:
            print(f"{name:38s} {va:8.3f} {'-':>8}   (gone)")
            continue
        ratio = vb / va if va > 0 else float("inf")
        flag = "  <-- regressed" if ratio > 2.0 and vb > 0.2 else ""
        print(f"{name:38s} {va:8.3f} {vb:8.3f} {ratio:6.2f}x{flag}")
    print(f"{'TOTAL':38s} {a.get('value', 0):8.3f} {b.get('value', 0):8.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
