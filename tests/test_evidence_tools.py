"""Skip-labeling enforcement (VERDICT r9 what's-wrong #1): only
validation_only-tagged queries may be skipped in a sweep, enforced at
BOTH ends — tools/check_oracle.py refuses an untagged
CHECK_ORACLE_SKIP before Spark even starts, and
tools/check_evidence_fresh.py fails on a recorded untagged
{"skipped": true} row instead of counting it as coverage."""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, env=None):
    return subprocess.run(
        [sys.executable, *args],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )


def test_check_oracle_refuses_untagged_skip():
    env = dict(os.environ, CHECK_ORACLE_SKIP="q1_pricing_summary")
    p = _run(
        ["tools/check_oracle.py", "/root/testdata/sf0.001",
         "q1_pricing_summary"],
        env=env,
    )
    assert p.returncode == 2, p.stderr[-2000:]
    assert "not validation_only-tagged" in p.stderr
    assert "q1_pricing_summary" in p.stderr


def _fake_sweep(tmp_path, skipped_names):
    import __spark_entry__  # noqa: F401 — populates the registry
    from metastore_spark.queries import REGISTRY

    results = {}
    for n in REGISTRY:
        if n in skipped_names:
            results[n] = {"skipped": True, "err": None}
        else:
            results[n] = {
                "rows_match": True,
                "schema_match": True,
                "hash_match": True,
                "err": None,
            }
    path = tmp_path / "SELFCHECK_fake.json"
    path.write_text(
        json.dumps(
            # far-future ts so only the skip labeling is under test
            {"sf_dir": "fake", "ts": int(time.time()) + 10**6,
             "results": results}
        )
    )
    return str(path)


def test_evidence_checker_fails_on_untagged_skip(tmp_path):
    p = _fake_sweep(tmp_path, {"q1_pricing_summary"})
    r = _run(["tools/check_evidence_fresh.py", p])
    assert r.returncode == 1
    assert "UNTAGGED queries were skipped" in r.stderr
    assert "q1_pricing_summary" in r.stderr


def test_evidence_checker_accepts_tagged_skip(tmp_path):
    # the two tagged validation twins may be skipped at degenerate SF
    # — their scale_path siblings carry the production evidence
    p = _fake_sweep(tmp_path, {"dedup_jaccard_pairs", "emb_semdedup"})
    r = _run(["tools/check_evidence_fresh.py", p])
    assert "UNTAGGED queries were skipped" not in r.stderr
    assert "have no result row" not in r.stderr
