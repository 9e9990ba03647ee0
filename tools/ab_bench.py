"""Same-host code A/B for bench WARN(regression) adjudication
(VERDICT r6 task 6 — automates the manual procedure in SCALE.md
"Round-6: bench WARN adjudication by code A/B").

For each flagged query (plus a scan-bound ``q1_pricing_summary``
control), runs the bench harness twice minutes apart on the same
host: once against HEAD's library code, once against a baseline
commit checked out in a throwaway git worktree (PYTHONPATH +
PYTHONSAFEPATH swap, preflight-probed so each leg provably imports
its own checkout; each leg runs its own bench.py so the baseline
harness matches the baseline library). Per-query verdict:

- ``code_regression``  HEAD best-of-N > AB_RATIO x baseline best-of-N
  (the code really got slower);
- ``host_drift``       otherwise (the elevation vs the history median
  is host state — both code versions measure it today).

The verdict is appended to BENCH_HISTORY.jsonl as a
``kind=ab_adjudication`` record; tools/bench_gate.py reports it the
next time the same query WARNs instead of re-asking for the A/B.

Usage:
    python tools/ab_bench.py --baseline <commit> --queries q1,q2 \
        [--reps 6] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

AB_RATIO = 1.25  # beyond same-host back-to-back noise for best-of-6
CONTROL = "q1_pricing_summary"


def _run_leg(
    repo: str, code_root: str, queries: list[str], reps: int, sf_dir: str
) -> dict[str, float]:
    # PYTHONSAFEPATH: without it Python puts the SCRIPT's directory
    # (the main repo, since we invoke repo/bench.py) at sys.path[0],
    # AHEAD of PYTHONPATH — so `import metastore_spark` would resolve
    # to HEAD in BOTH legs and every A/B would trivially report
    # host_drift. Safe-path keeps the harness (bench.py) constant
    # while the library code really comes from ``code_root``.
    env = dict(
        os.environ,
        PYTHONPATH=code_root,
        PYTHONSAFEPATH="1",
        SPARK_GRAFT_BENCH_ONLY=",".join(queries),
        SPARK_GRAFT_BENCH_REPS=str(reps),
        SPARK_GRAFT_SF_DIR=sf_dir,
    )
    # preflight under the leg's exact env: fail loudly if the leg
    # would measure some other checkout's code
    probe = subprocess.run(
        [
            sys.executable,
            "-c",
            "import os, metastore_spark; "
            "print(os.path.abspath(metastore_spark.__file__))",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=code_root,
    )
    resolved = probe.stdout.strip()
    want = os.path.abspath(code_root) + os.sep
    if probe.returncode != 0 or not resolved.startswith(want):
        raise RuntimeError(
            f"leg would import metastore_spark from {resolved!r}, "
            f"not {code_root!r} — refusing to record a bogus A/B"
        )
    # run the LEG'S OWN bench.py when it has one: the harness evolves
    # with the library (e.g. a warmup step referencing a symbol the
    # baseline library lacks would crash the baseline leg under
    # HEAD's harness); the measurement loop itself is stable across
    # rounds, and the probe above already pins WHICH library each leg
    # measures.
    bench_py = os.path.join(code_root, "bench.py")
    if not os.path.exists(bench_py):
        bench_py = os.path.join(repo, "bench.py")
    proc = subprocess.run(
        [sys.executable, bench_py],
        capture_output=True,
        text=True,
        env=env,
        cwd=code_root,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)["queries"]
    raise RuntimeError(
        f"bench leg produced no JSON line (rc={proc.returncode}):\n"
        f"{proc.stderr[-2000:]}"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", required=True, help="prior-round commit")
    ap.add_argument(
        "--queries", required=True, help="comma-separated flagged queries"
    )
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    queries = [q for q in args.queries.split(",") if q]
    if CONTROL not in queries:
        queries.append(CONTROL)

    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, cwd=repo,
    ).stdout.strip()
    wt = os.path.join("/tmp", f"ab-{args.baseline}")
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, args.baseline],
            check=True, cwd=repo,
        )
    try:
        # baseline leg first, HEAD second: if anything external loads
        # the host mid-run it biases AGAINST HEAD, so a HEAD win is
        # conservative evidence
        base_t = _run_leg(repo, wt, queries, args.reps, args.sf_dir)
        head_t = _run_leg(repo, repo, queries, args.reps, args.sf_dir)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=repo, capture_output=True,
        )
        shutil.rmtree(wt, ignore_errors=True)

    verdict: dict[str, str] = {}
    detail: dict[str, dict[str, float]] = {}
    for q in queries:
        if q == CONTROL or q not in base_t or q not in head_t:
            continue
        ratio = head_t[q] / base_t[q] if base_t[q] else float("inf")
        verdict[q] = (
            "code_regression" if ratio > AB_RATIO else "host_drift"
        )
        detail[q] = {
            "baseline_best": base_t[q],
            "head_best": head_t[q],
            "ratio": round(ratio, 3),
        }
        print(
            f"{q}: baseline {base_t[q]:.3f}s vs HEAD {head_t[q]:.3f}s "
            f"({ratio:.2f}x) -> {verdict[q]}"
        )
    if CONTROL in base_t and CONTROL in head_t:
        print(
            f"control {CONTROL}: baseline {base_t[CONTROL]:.3f}s vs "
            f"HEAD {head_t[CONTROL]:.3f}s (equal-ish validates the "
            "legs ran under comparable host state)"
        )

    record = {
        "kind": "ab_adjudication",
        "ts": int(time.time()),
        "baseline": args.baseline,
        "head": head,
        "sf_dir": args.sf_dir,
        "reps": args.reps,
        "control": {
            q: {"baseline_best": base_t.get(q), "head_best": head_t.get(q)}
            for q in [CONTROL]
        },
        "detail": detail,
        "verdict": verdict,
    }
    with open(os.path.join(repo, "BENCH_HISTORY.jsonl"), "a") as fh:
        fh.write(json.dumps(record) + "\n")
    print(json.dumps({"recorded": True, **{"verdict": verdict}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
