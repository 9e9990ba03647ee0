"""Oracle-dialect portability gate (VERDICT r11 task 6).

Every correctness claim in this repo rests on the DuckDB oracles, so
the oracle SQL itself needs a CI-style defense against engine drift:

1. **Bind check** — every registered oracle must EXPLAIN (parse +
   bind + typecheck, no execution) against the installed DuckDB over
   the real sf0.001 table schemas. A dialect construct the local
   DuckDB can't even bind would otherwise surface only on the
   driver's host.
2. **Drift lint** — constructs that have (or plausibly could) come
   back with different VALUES on a different DuckDB/host are banned
   in NEW oracles:
   - single-argument ``ROUND(x)`` on doubles: the half-case
     tie-break differs between Spark's BigDecimal HALF_UP on the
     shortest-decimal rendering and the C-library round — use
     ``CAST(floor(x + 0.5) AS BIGINT)`` (the repo's cents-canon
     idiom) unless the argument is already integer-snapped;
   - ``list_sum(list_transform(...))`` folds feeding aggregates:
     list-aggregate typing is the most version-churned DuckDB
     surface, and the one driver hash-mismatch in 11 rounds
     (``events_integrity_checksum`` r11) landed on exactly this
     construct — new oracles must spell folds as scalar SQL (see
     ``queries_analytics._CHECKSUM_FOLD``).
   Existing green oracles are grandfathered by NAME below: every
   name in the freeze lists has driver- or sweep-verified value
   matches on the pinned DuckDB, so the lint only stops the set
   from growing.

Verified DuckDB pin: 1.0.0 (see README "Oracle portability").
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest

import __spark_entry__ as entrymod
from metastore_spark.queries import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_TINY_SF", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# Oracles allowed to keep list_sum(list_transform(...)) — all carried
# green driver rows / three-tier sweep value matches before the lint
# landed (r11). Do NOT add names here; unroll the fold instead.
# After the r12 unroll of every fixed-width HASH fold (queries_dedup
# _ph60 and its curation/sampling copies now emit scalar SQL), what
# remains is arithmetic over genuine LIST VALUES — PQ subspace
# distances, per-char entropy, audio sample windows — where the fold
# sums DOUBLE list elements (stable typing, unlike the BIGINT
# bit-fold that drifted) or the list is variable-length and cannot be
# unrolled.
LIST_FOLD_FREEZE = {
    "ann_ivf_pq_topk",
    "ann_ivf_pq_topk_trained",
    "ann_ivf_recall_trained",
    "ann_pq_recall",
    "ann_pq_recall_trained",
    "ann_pq_topk",
    "docs_char_entropy",
    "docs_token_stats",
    "emb_kmeans_quantized",
    "multimodal_audio_codec_windows",
    "multimodal_audio_windows",
    "multimodal_video_codec_frames",
}

# Single-arg ROUND freeze: docs_quality_trained's inner
# round(round(p, 6)*1e6) snaps an already-integer-valued double (the
# *1e6 of a 6-dp quantity) — tie-free by construction, value-verified
# in sweeps. Same rule: don't add names, use floor(x + 0.5).
SINGLE_ROUND_FREEZE = {"docs_quality_trained"}

# ROUND(CAST(x AS DOUBLE), n) freeze (r13): when x is an exact
# DECIMAL, casting FIRST throws away exactness and leaves the round
# at the mercy of engine-specific double tie-breaking — this is what
# made events_multires_rollup the one never-green query (fixed r13 by
# rounding in the decimal domain: CAST(ROUND(x, n) AS DOUBLE), with
# the same swap on the Spark side). The names below are the verified
# remainder where x is ALREADY a double (or an integer ratio), so the
# CAST is a no-op and the construct is just ROUND(double, n) — green
# in driver rows/sweeps. Don't add names: either drop the pointless
# cast or round in the value's own exact domain.
ROUND_CAST_DOUBLE_FREEZE = {
    "docs_token_stats",
    "docs_repetition_signals",
    "docs_contamination",
    "events_journey_transitions",
    "q1_pricing_summary",
    "q9_product_profit",
}


def _oracles() -> dict[str, str]:
    return entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            c.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{path}')"
            )
    return c


def test_every_oracle_binds_in_installed_duckdb(con):
    """EXPLAIN every oracle: parse + bind + typecheck without
    execution. Catches dialect constructs the pinned DuckDB can't
    resolve before the driver's host does."""
    failures = []
    for name, sql in _oracles().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001 — collecting a report
            failures.append(f"{name}: {exc}")
    assert not failures, "\n".join(failures)


def _single_arg_round_names() -> set[str]:
    hits = set()
    for name, sql in _oracles().items():
        for m in re.finditer(r"\bround\s*\(", sql, re.I):
            depth, i, top_comma = 1, m.end(), False
            while depth and i < len(sql):
                c = sql[i]
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                elif c == "," and depth == 1:
                    top_comma = True
                i += 1
            if not top_comma:
                hits.add(name)
                break
    return hits


def test_no_new_single_arg_round():
    extra = _single_arg_round_names() - SINGLE_ROUND_FREEZE
    assert not extra, (
        f"single-arg ROUND(x) in new oracle(s) {sorted(extra)}: "
        "half-case tie-breaking drifts between engines — use "
        "CAST(floor(x + 0.5) AS BIGINT)"
    )


def _round_cast_double_names() -> set[str]:
    """Oracles containing ROUND(CAST(<expr> AS DOUBLE)[, n])."""
    hits = set()
    for name, sql in _oracles().items():
        for m in re.finditer(r"\bround\s*\(\s*cast\s*\(", sql, re.I):
            # Walk the CAST's parens to their close; the depth-1 tail
            # must end with "AS DOUBLE".
            depth, i, start = 1, m.end(), m.end()
            while depth and i < len(sql):
                c = sql[i]
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                i += 1
            inner = sql[start : i - 1]
            if re.search(r"\bAS\s+DOUBLE\s*$", inner, re.I):
                hits.add(name)
                break
    return hits


def test_no_new_round_cast_double():
    extra = _round_cast_double_names() - ROUND_CAST_DOUBLE_FREEZE
    assert not extra, (
        f"ROUND(CAST(x AS DOUBLE), n) in new oracle(s) {sorted(extra)}: "
        "if x is an exact DECIMAL this drifts across engines at double "
        "ties (the events_multires_rollup bug) — round in the decimal "
        "domain first: CAST(ROUND(x, n) AS DOUBLE); if x is already a "
        "double, drop the pointless cast"
    )


def test_no_new_list_fold_aggregates():
    hits = {
        name
        for name, sql in _oracles().items()
        if re.search(r"list_sum\s*\(\s*list_transform", sql, re.I)
    }
    extra = hits - LIST_FOLD_FREEZE
    assert not extra, (
        f"list_sum(list_transform(...)) in new oracle(s) "
        f"{sorted(extra)}: list-aggregate typing churns across "
        "DuckDB releases — unroll the fold to scalar SQL "
        "(queries_analytics._CHECKSUM_FOLD is the template)"
    )


def test_freeze_lists_stay_minimal():
    """Names leave the freeze lists when their oracles are rewritten;
    stale entries would quietly re-open the door."""
    oracles = _oracles()
    gone_fold = {
        n
        for n in LIST_FOLD_FREEZE
        if n in oracles
        and not re.search(
            r"list_sum\s*\(\s*list_transform", oracles[n], re.I
        )
    }
    gone_round = SINGLE_ROUND_FREEZE - _single_arg_round_names()
    gone_rcd = ROUND_CAST_DOUBLE_FREEZE - _round_cast_double_names()
    assert not gone_fold and not gone_round and not gone_rcd, (
        "freeze entries no longer needed: "
        f"{sorted(gone_fold | gone_round | gone_rcd)}"
    )
