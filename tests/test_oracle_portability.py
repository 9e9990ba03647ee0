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
    assert not gone_fold and not gone_round, (
        f"freeze entries no longer needed: {sorted(gone_fold | gone_round)}"
    )
