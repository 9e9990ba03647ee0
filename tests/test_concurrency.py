"""Concurrent registry queries on ONE shared session must produce the
same results as sequential runs — exercises the shared-state seams:
serving-store build races (atomic rename), the query decorator's
clearCache, and operator-internal materialization (global_rank
checkpoints, per-query persists)."""

from __future__ import annotations

import threading

SF = "/root/testdata/sf0.001"

QUERIES = [
    "q1_pricing_summary",
    "search_bm25_docs",
    "events_user_hll_registers",
    "customer_spend_deciles",
]


def _norm(rows):
    return sorted(tuple(str(v) for v in r) for r in rows)


def test_concurrent_queries_match_sequential(spark):
    import __spark_entry__ as entry

    qs = entry.queries()
    sequential = {n: _norm(qs[n](spark, SF).collect()) for n in QUERIES}

    results: dict[str, list] = {}
    errors: list = []

    def run(name):
        try:
            results[name] = _norm(qs[name](spark, SF).collect())
        except Exception as e:  # surface to the assert below
            errors.append((name, repr(e)))

    threads = [threading.Thread(target=run, args=(n,)) for n in QUERIES]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    for n in QUERIES:
        assert results[n] == sequential[n], n
