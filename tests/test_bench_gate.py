"""bench_gate adjudication trust (ADVICE r6): WARN(noise) must only be
granted by a SAME-CODE same-session peer; an older-code run inside the
session window must not launder a real regression, and a surviving
regression must emit the ready-to-run ab_bench escalation."""

import json
import os
import subprocess
import sys

_GATE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "bench_gate.py",
)


def _run_gate(tmp_path, lines):
    hist = tmp_path / "hist.jsonl"
    hist.write_text("".join(json.dumps(l) + "\n" for l in lines))
    proc = subprocess.run(
        [sys.executable, _GATE],
        capture_output=True,
        text=True,
        env=dict(os.environ, BENCH_GATE_HISTORY=str(hist)),
        timeout=60,
    )
    return proc


def _line(ts, head, t, sf=0.1):
    return {
        "ts": ts,
        "git_head": head,
        "value": t,
        "sf": sf,
        "queries": {"qx": t},
    }


def test_old_code_peer_cannot_launder_regression(tmp_path):
    lines = [
        _line(1000, "aaa", 1.0),
        _line(2000, "aaa", 1.0),
        _line(3000, "aaa", 1.0),
        # fast old-code peer INSIDE the 4h window of the gated run
        _line(9000, "aaa", 1.0),
        # gated run: new code, 3x slower
        _line(9100, "bbb", 3.0),
    ]
    proc = _run_gate(tmp_path, lines)
    out = proc.stdout
    assert "WARN(regression) qx" in out
    assert "WARN(noise)" not in out
    # escalation names the most recent OTHER-code commit as baseline
    assert "ab_bench.py --baseline aaa --queries qx" in out
    assert proc.returncode == 1  # 3x total also trips the 1.3x gate


def test_same_code_peer_classifies_noise(tmp_path):
    lines = [
        _line(1000, "aaa", 1.0),
        _line(2000, "aaa", 1.0),
        _line(3000, "aaa", 1.0),
        # same-code peer inside the window measured it fast
        _line(9000, "bbb", 1.0),
        _line(9100, "bbb", 3.0),
    ]
    out = _run_gate(tmp_path, lines).stdout
    assert "WARN(noise) qx" in out
    assert "ESCALATE" not in out


def test_prior_ab_verdict_reported_instead_of_reescalating(tmp_path):
    lines = [
        _line(1000, "aaa", 1.0),
        _line(2000, "aaa", 1.0),
        _line(3000, "aaa", 1.0),
        {
            "kind": "ab_adjudication",
            "ts": 8000,
            "baseline": "aaa",
            "head": "bbb",
            "verdict": {"qx": "host_drift"},
        },
        _line(9100, "bbb", 3.0),
    ]
    out = _run_gate(tmp_path, lines).stdout
    assert "prior A/B verdict=host_drift" in out
    assert "ESCALATE" not in out


def test_evidence_commit_does_not_strip_peers(tmp_path):
    """git_code_head is the peer identity: a docs/evidence commit that
    moves HEAD without touching code must not strip a run of its
    same-code peers (the round-7 run-3 incident)."""
    lines = [
        _line(1000, "aaa", 1.0),
        _line(2000, "aaa", 1.0),
        _line(3000, "aaa", 1.0),
        # same code, different full HEAD (evidence commit in between)
        dict(_line(9000, "h1", 1.0), git_code_head="ccc"),
        dict(_line(9100, "h2", 3.0), git_code_head="ccc"),
    ]
    out = _run_gate(tmp_path, lines).stdout
    assert "WARN(noise) qx" in out
    assert "ESCALATE" not in out
