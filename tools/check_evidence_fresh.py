"""Evidence-freshness invariant (VERDICT r5 task 1).

Round 5 shipped sweeps that PREDATED the last two code commits — the
committed sf1/sf3 rows described a plan that no longer existed. This
check makes that impossible to repeat silently: it FAILS (exit 1)
unless every committed selfcheck

1. is NEWER than the last commit touching code that can change query
   results (`metastore_spark/`, `__spark_entry__.py`) — compared on
   the sweep's own recorded ``ts`` vs the commit timestamp;
2. was produced from a CLEAN tree (no uncommitted code changes now —
   a dirty tree means the sweep can't be tied to any commit);
3. COVERS the registry: every non-tagged registry query has a result
   row (tagged validation twins may be absent at high SF by design —
   tests/test_registry_contract.py pins that tag shape).

Usage:
    python tools/check_evidence_fresh.py [selfcheck.json ...]
    # default: the newest SELFCHECK_r*.json + SELFCHECK_sf1/sf3.json

Run it at the end of the round, AFTER the final sweeps, BEFORE the
final commit of the evidence files.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CODE_PATHS = ["metastore_spark", "__spark_entry__.py"]


def _last_code_commit_ts() -> int:
    out = subprocess.run(
        ["git", "log", "-1", "--format=%ct", "--", *_CODE_PATHS],
        cwd=_REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    return int(out)


def _dirty_code_paths() -> list[str]:
    out = subprocess.run(
        ["git", "status", "--porcelain", "--", *_CODE_PATHS],
        cwd=_REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.splitlines()
    return [l for l in out if l.strip()]


def _default_targets() -> list[str]:
    rounds = sorted(
        glob.glob(os.path.join(_REPO, "SELFCHECK_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    targets = rounds[-1:] if rounds else []
    for sf in ("sf1", "sf3"):
        p = os.path.join(_REPO, f"SELFCHECK_{sf}.json")
        if os.path.exists(p):
            targets.append(p)
    return targets


def main() -> int:
    sys.path.insert(0, _REPO)
    import __spark_entry__  # noqa: F401 — populates the registry

    from metastore_spark.queries import REGISTRY

    targets = sys.argv[1:] or _default_targets()
    if not targets:
        print("check_evidence_fresh: no selfcheck files found", file=sys.stderr)
        return 1

    code_ts = _last_code_commit_ts()
    failures = []

    dirty = _dirty_code_paths()
    if dirty:
        failures.append(
            "code tree is dirty — evidence cannot be tied to a commit:\n  "
            + "\n  ".join(dirty)
        )

    untagged = {n for n, s in REGISTRY.items() if not s.validation_only}
    for path in targets:
        name = os.path.basename(path)
        with open(path) as fh:
            data = json.load(fh)
        ts = data.get("ts")
        if not ts:
            failures.append(f"{name}: no ts field")
            continue
        if ts < code_ts:
            failures.append(
                f"{name}: sweep ts {ts} PREDATES last code commit "
                f"{code_ts} ({code_ts - ts}s stale) — re-run the sweep"
            )
        missing = sorted(untagged - set(data.get("results", {})))
        if missing:
            failures.append(
                f"{name}: {len(missing)} untagged registry queries have "
                f"no result row: {', '.join(missing[:10])}"
                + (" ..." if len(missing) > 10 else "")
            )
        # a {"skipped": true} row is NOT coverage: only
        # validation_only-tagged queries may be skipped (their
        # scale_path sibling carries the production evidence) — an
        # untagged skip is a silent coverage hole (VERDICT r9 #1)
        skipped_untagged = sorted(
            n
            for n, r in data.get("results", {}).items()
            if isinstance(r, dict) and r.get("skipped") and n in untagged
        )
        if skipped_untagged:
            failures.append(
                f"{name}: {len(skipped_untagged)} UNTAGGED queries were "
                f"skipped, not run: {', '.join(skipped_untagged[:10])}"
                + (" ..." if len(skipped_untagged) > 10 else "")
            )
        print(
            f"{name}: ts={ts} (+{ts - code_ts}s after last code commit), "
            f"{len(data.get('results', {}))} rows, "
            f"{len(untagged - set(data.get('results', {})))} untagged missing"
        )

    for f in failures:
        print(f"STALE-EVIDENCE: {f}", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
