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


def _calib(start, end, reps=None):
    cal = {
        "calib_ref_jobs_sec": 1.0,
        "spark_jobs10_sec": start,
        "spark_jobs10_end_sec": end,
    }
    if reps is not None:
        cal["spark_jobs10_reps"] = reps
        cal["probe_spread"] = round(max(reps) / min(reps), 2)
    return cal


def test_normalizer_uses_min_probe_not_mean(tmp_path):
    """The r10 same-code flip (probe 1.43 s vs 4.64 s seventeen
    minutes apart turned 105 s vs 52 s normalized out of raw totals
    8% apart): min-of-probes normalization + the spread guard must
    keep identical code from tripping the gate."""
    lines = [
        dict(_line(1000, "aaa", 1.0), calib=_calib(1.0, 1.1)),
        dict(_line(2000, "aaa", 1.0), calib=_calib(1.0, 0.9)),
        dict(_line(3000, "aaa", 1.0), calib=_calib(1.1, 1.0)),
        # gated run: raw 8% slower, but one probe rep burst 3x — the
        # old mean normalizer would have ABSOLVED it to 0.54x; min
        # keeps it honest at ~1.08x (no WARN either way)
        dict(_line(9100, "aaa", 1.08), calib=_calib(3.0, 1.0)),
    ]
    proc = _run_gate(tmp_path, lines)
    verdict = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert 0.9 < verdict["total_ratio"] < 1.2
    assert proc.returncode == 0


def test_unstable_probe_demotes_regressions_and_never_fails(tmp_path):
    lines = [
        dict(_line(1000, "aaa", 1.0), calib=_calib(1.0, 1.0)),
        dict(_line(2000, "aaa", 1.0), calib=_calib(1.0, 1.0)),
        dict(_line(3000, "aaa", 1.0), calib=_calib(1.0, 1.0)),
        # gated run 3x slower BUT its own probe spread is 5x: the
        # normalization is untrusted — demote, demand a rerun, exit 0
        dict(
            _line(9100, "bbb", 3.0),
            calib=_calib(1.0, 5.0, reps=[1.0, 1.1, 1.0, 5.0, 4.8, 5.0]),
        ),
    ]
    proc = _run_gate(tmp_path, lines)
    out = proc.stdout
    assert "UNSTABLE" in out
    assert "WARN(unstable_probe) qx" in out
    assert "WARN(regression)" not in out
    assert "ESCALATE" not in out
    assert proc.returncode == 0


def test_unstable_probe_history_line_excluded_from_medians(tmp_path):
    lines = [
        dict(_line(1000, "aaa", 1.0), calib=_calib(1.0, 1.0)),
        dict(_line(2000, "aaa", 1.0), calib=_calib(1.0, 1.0)),
        # an unstable-probe line whose min-normalization would halve
        # the median must not contaminate the pool
        dict(_line(3000, "aaa", 1.0), calib=_calib(0.2, 5.0)),
        dict(_line(9100, "aaa", 1.0), calib=_calib(1.0, 1.0)),
    ]
    proc = _run_gate(tmp_path, lines)
    verdict = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert 0.9 < verdict["total_ratio"] < 1.1
    assert proc.returncode == 0


def test_ab_leg_refuses_wrong_code_root(tmp_path):
    """ADVICE r7 (high): the A/B baseline leg must PROVE it imports
    metastore_spark from the leg's code_root — sys.path[0] (the
    script's dir, i.e. HEAD) used to outrank PYTHONPATH, so both legs
    silently measured HEAD and every A/B laundered real regressions as
    host_drift. A code_root without the package must abort the leg,
    not fall back to HEAD."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(_GATE))
    )
    try:
        import ab_bench
    finally:
        sys.path.pop(0)
    empty = tmp_path / "not-a-checkout"
    empty.mkdir()
    try:
        ab_bench._run_leg(
            os.path.dirname(os.path.dirname(_GATE)),
            str(empty),
            ["qx"],
            1,
            "/root/testdata/sf0.01",
        )
    except RuntimeError as e:
        assert "refusing" in str(e)
    else:
        raise AssertionError("leg ran against the wrong code root")


def test_ab_leg_probe_accepts_real_code_root(tmp_path, monkeypatch):
    """Positive leg: with a code_root that DOES hold the package, the
    probe passes and the leg proceeds to invoke bench.py (stubbed via
    a captured subprocess.run)."""
    import shutil
    import types

    sys.path.insert(0, os.path.join(os.path.dirname(_GATE)))
    try:
        import ab_bench
    finally:
        sys.path.pop(0)
    repo = os.path.dirname(os.path.dirname(_GATE))
    code_root = tmp_path / "wt"
    (code_root / "metastore_spark").mkdir(parents=True)
    shutil.copy(
        os.path.join(repo, "metastore_spark", "__init__.py"),
        code_root / "metastore_spark" / "__init__.py",
    )
    calls = []
    real_run = subprocess.run

    def fake_run(cmd, **kw):
        if cmd[-1].endswith("bench.py"):
            calls.append(kw["env"])
            return types.SimpleNamespace(
                stdout='{"queries": {"qx": 1.0}}\n', returncode=0,
                stderr="",
            )
        return real_run(cmd, **kw)

    monkeypatch.setattr(ab_bench.subprocess, "run", fake_run)
    out = ab_bench._run_leg(
        repo, str(code_root), ["qx"], 1, "/root/testdata/sf0.01"
    )
    assert out == {"qx": 1.0}
    assert calls and calls[0]["PYTHONSAFEPATH"] == "1"
    assert calls[0]["PYTHONPATH"] == str(code_root)
