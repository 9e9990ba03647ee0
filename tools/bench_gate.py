"""Per-query bench regression gate (VERDICT r4 task 5).

Compares the LATEST BENCH_HISTORY.jsonl entry (or an explicit bench
JSON) against the calibration-normalized per-query history medians:

- WARN  any query whose normalized time is > 1.5x its history median
  (queries under the noise floor are exempt — job-overhead-scale
  timings on this box jitter 2x run-to-run);
- FAIL  (exit 1) if the normalized headline total over the query set
  shared with history regresses > 1.3x the sum of history medians.

Per-query normalization uses each run's own jobs-probe calibration
(t_norm = t * calib_ref_jobs / min(start, end) jobs probe), the same
corrector bench.py applies to the headline total — so medians are
comparable across hosts of different scheduler speed. Pre-probe
history lines (rounds 1-3) carry no jobs probe and are used raw;
the median is robust to those.

Usage:
    python tools/bench_gate.py                # gate the latest history line
    python tools/bench_gate.py BENCH_r05.json # gate an explicit result
"""

from __future__ import annotations

import json
import os
import statistics
import sys

WARN_RATIO = 1.5
FAIL_RATIO = 1.3
NOISE_FLOOR_SEC = 0.25  # normalized; below this, scheduler jitter dominates
SESSION_WINDOW_SEC = 4 * 3600  # runs this close together share the host state


PROBE_SPREAD_MAX = 2.0  # beyond this the run's own probe is untrusted


def _norm_factor(entry: dict) -> float:
    cal = entry.get("calib", {})
    ref = cal.get("calib_ref_jobs_sec")
    start = cal.get("spark_jobs10_sec")
    end = cal.get("spark_jobs10_end_sec", start)
    if not ref or not start:
        return 1.0  # pre-probe history line: raw seconds
    # MIN of the start/end probes (VERDICT r10 task 2): external load
    # only ever ADDS time, so the smaller probe is the least-
    # contaminated estimate — the old mean let one bursty probe flip
    # a same-code normalized total 2x.
    return ref / min(start, end)


def _probe_spread(entry: dict) -> float:
    """max/min over the run's recorded probe reps (median-of-3 runs
    record all six; older lines fall back to the start/end pair). 1.0
    when the line predates probes."""
    cal = entry.get("calib", {})
    if cal.get("probe_spread"):
        return float(cal["probe_spread"])
    start = cal.get("spark_jobs10_sec")
    end = cal.get("spark_jobs10_end_sec")
    if not start or not end:
        return 1.0
    return max(start, end) / min(start, end)


def _normed_queries(entry: dict) -> dict[str, float]:
    f = _norm_factor(entry)
    return {q: t * f for q, t in entry.get("queries", {}).items()}


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hist_path = os.environ.get("BENCH_GATE_HISTORY") or os.path.join(
        repo, "BENCH_HISTORY.jsonl"
    )
    with open(hist_path) as fh:
        lines = [json.loads(l) for l in fh.read().strip().splitlines()]
    # adjudication records (tools/ab_bench.py verdicts) live in the
    # same ledger but are not bench runs — split them out
    ab_records = [l for l in lines if l.get("kind") == "ab_adjudication"]
    history = [l for l in lines if "kind" not in l]
    if len(sys.argv) > 1:
        with open(sys.argv[1]) as fh:
            latest = json.load(fh)
        if "parsed" in latest:  # driver-written BENCH_r{N}.json wrapper
            if latest["parsed"] is None:
                # the driver truncates stdout; the bench run itself
                # appended the full line to BENCH_HISTORY.jsonl
                print(
                    "bench_gate: driver JSON has no parsed payload — "
                    "gating the latest history line instead"
                )
                latest = history[-1]
                history = history[:-1]
            else:
                latest = latest["parsed"]
        # drop any history line that IS this run (same raw total)
        history = [
            h for h in history if h.get("value") != latest.get("value")
        ]
    else:
        latest = history[-1]
        history = history[:-1]
    # never compare across scale factors: a latest sf0.01 smoke run
    # must not be judged against (or later contaminate) sf0.1 medians
    sf = latest.get("sf")
    history = [h for h in history if h.get("sf") == sf]
    # a history line whose own probe was unstable carries an
    # untrustworthy normalization — keep it out of the median pool
    history = [h for h in history if _probe_spread(h) <= PROBE_SPREAD_MAX]
    if not history:
        print("bench_gate: no same-sf history to gate against — pass (vacuous)")
        return 0

    latest_n = _normed_queries(latest)
    hist_n = [_normed_queries(h) for h in history]

    # Same-session peers: other history lines captured within
    # SESSION_WINDOW_SEC of the gated run AND stamped with the SAME
    # code hash — identical code on the same host minutes apart. The
    # hash requirement (ADVICE r6) closes the hole where an older-code
    # run inside the window could launder a real mid-session
    # regression into WARN(noise). The code identity is git_code_head
    # (last commit touching metastore_spark/__spark_entry__/bench —
    # the check_evidence_fresh definition) so a docs/evidence commit
    # between runs does not strip legitimate peers; pre-r7 lines fall
    # back to their full-HEAD stamp. A query that regressed ONLY in
    # the gated run while a same-code peer measured it inside the
    # gate is host noise (external load can only ADD time), not a
    # code regression. No hash on the gated run, or no matching
    # peers -> conservatively adjudicate as regression.
    def _code_id(entry: dict):
        return entry.get("git_code_head") or entry.get("git_head")

    latest_ts = latest.get("ts", 0)
    latest_head = _code_id(latest)
    session_n = [
        _normed_queries(h)
        for h in history
        if abs(h.get("ts", 0) - latest_ts) <= SESSION_WINDOW_SEC
        and latest_head is not None
        and _code_id(h) == latest_head
    ]

    # a gated run whose OWN probe was unstable cannot distinguish
    # "code got slower" from "the normalizer divided by a bad probe":
    # demote its would-be regressions and ask for a rerun instead of
    # escalating to an A/B (VERDICT r10 task 2)
    # timing-basis note (r13): reps are now cache-cold (clearCache
    # before every rep), so cache-using queries legitimately read
    # slower than medians built from warm-rep-era lines.
    if latest.get("timing_basis") == "cold_reps" and any(
        h.get("timing_basis") != "cold_reps" for h in history
    ):
        n_warm = sum(
            1 for h in history if h.get("timing_basis") != "cold_reps"
        )
        print(
            f"bench_gate: NOTE timing basis changed to cold reps this "
            f"run; {n_warm} history line(s) in the median pool timed "
            "warm reps — expect cache-using queries to read slower"
        )

    latest_spread = _probe_spread(latest)
    unstable = latest_spread > PROBE_SPREAD_MAX
    if unstable:
        print(
            f"bench_gate: this run's jobs probe is UNSTABLE "
            f"(spread {latest_spread:.1f}x > {PROBE_SPREAD_MAX}x) — "
            "normalization untrusted; regressions demoted to "
            "WARN(unstable_probe), rerun bench.py to adjudicate"
        )

    warns = []
    gated_total = 0.0
    median_total = 0.0
    for q, t in sorted(latest_n.items()):
        series = [hn[q] for hn in hist_n if q in hn]
        if not series:
            continue  # new query this round: no history to regress against
        med = statistics.median(series)
        gated_total += t
        median_total += med
        if t > WARN_RATIO * med and t > NOISE_FLOOR_SEC:
            peers = [sn[q] for sn in session_n if q in sn]
            kind = (
                "noise"
                if peers and min(peers) <= WARN_RATIO * med
                else ("unstable_probe" if unstable else "regression")
            )
            warns.append((q, med, t, kind, min(peers) if peers else None))

    for q, med, t, kind, peer_best in warns:
        peer_note = (
            f"; same-session same-code best {peer_best:.3f}s"
            if peer_best is not None
            else "; no same-session same-code peer run"
        )
        print(
            f"WARN({kind}) {q}: {t:.3f}s normalized vs history median "
            f"{med:.3f}s ({t / med:.2f}x){peer_note}"
        )

    # Escalation for WARNs that survive same-session adjudication
    # (VERDICT r6 task 6): a same-host code A/B against the most
    # recent PRIOR-code history line separates "host got slower" from
    # "code got slower" in one measurement. If an adjudication record
    # already covers the query, report its verdict; otherwise emit the
    # ready-to-run command.
    regressions = [w[0] for w in warns if w[3] == "regression"]
    if regressions:
        adjudicated = {}
        for rec in ab_records:
            for q, v in rec.get("verdict", {}).items():
                adjudicated[q] = (v, rec)
        open_qs = []
        for q in regressions:
            if q in adjudicated:
                v, rec = adjudicated[q]
                print(
                    f"WARN(regression) {q}: prior A/B verdict={v} "
                    f"(baseline {rec.get('baseline')}, ts {rec.get('ts')})"
                )
            else:
                open_qs.append(q)
        if open_qs:
            baseline = next(
                (
                    _code_id(h)
                    for h in reversed(history)
                    if _code_id(h) and _code_id(h) != latest_head
                ),
                None,
            )
            base_arg = baseline or "<prior-round-commit>"
            print(
                "ESCALATE: adjudicate surviving WARN(regression) with a "
                "same-host code A/B:\n"
                f"  python tools/ab_bench.py --baseline {base_arg} "
                f"--queries {','.join(open_qs)}"
            )
    verdict = {
        "queries_gated": sum(1 for q in latest_n if any(q in h for h in hist_n)),
        "queries_new": sum(1 for q in latest_n if not any(q in h for h in hist_n)),
        "per_query_warnings": len(warns),
        "warns_noise": sum(1 for w in warns if w[3] == "noise"),
        "warns_regression": sum(1 for w in warns if w[3] == "regression"),
        "warns_unstable_probe": sum(
            1 for w in warns if w[3] == "unstable_probe"
        ),
        "normalized_total_common": round(gated_total, 3),
        "history_median_total_common": round(median_total, 3),
        "total_ratio": round(gated_total / median_total, 3)
        if median_total
        else None,
    }
    verdict["probe_spread"] = round(latest_spread, 2)
    print(json.dumps(verdict))
    if unstable:
        # an untrusted normalization must not hard-fail the round;
        # the demoted warns above already demand a rerun
        return 0
    if median_total and gated_total > FAIL_RATIO * median_total:
        print(
            f"FAIL: normalized total {gated_total:.1f}s regressed "
            f"{gated_total / median_total:.2f}x vs history median "
            f"{median_total:.1f}s (gate {FAIL_RATIO}x)",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
