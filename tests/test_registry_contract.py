"""The `validation_only` contract, made self-checking (VERDICT r5
task 5): the tag set is the only thing standing between a
programmatic consumer and an all-pairs plan, so CI must fail the
moment a tag, its scale_path sibling, or the at-scale hash evidence
for an untagged query is dropped.

Split of responsibilities (tag SHAPE is pinned by
tests/test_registry_tags.py):
- THIS test pins the no-skip rule for every query PRESENT in the
  newest committed sf3 selfcheck;
- the evidence tool (run in the end-of-round flow) additionally
  requires the selfcheck to COVER the whole registry and to postdate
  the last code commit — so a query added mid-round is caught there,
  without turning this suite red between sweep refreshes.
"""

import json
import os

import __spark_entry__  # noqa: F401 — populates the registry

from metastore_spark.queries import REGISTRY

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _highest_sf_selfcheck() -> dict:
    with open(os.path.join(_REPO, "SELFCHECK_sf3.json")) as fh:
        return json.load(fh)


def test_untagged_queries_hash_matched_at_highest_swept_sf():
    """Every query NOT tagged validation_only that appears in the
    newest committed sf3 selfcheck must be value-hash-matched there —
    skipped/rows-only rows are reserved for tagged quadratic twins. An
    untagged query that cannot survive the highest swept SF has no
    business being untagged."""
    res = _highest_sf_selfcheck()["results"]
    offenders = [
        (name, res[name])
        for name, spec in REGISTRY.items()
        if name in res
        and not spec.validation_only
        and not res[name].get("hash_match")
    ]
    assert not offenders, (
        "untagged queries without sf3 hash evidence: "
        + ", ".join(f"{n} ({r.get('err') or 'no hash_match'})"
                    for n, r in offenders)
    )


def test_tagged_queries_are_the_only_selfcheck_skips():
    """The inverse direction: every non-hash row in the sf3 selfcheck
    must belong to a tagged query — a sweep that silently skipped a
    production query would otherwise go unnoticed."""
    res = _highest_sf_selfcheck()["results"]
    stray = [
        name
        for name, r in res.items()
        if not r.get("hash_match")
        and not (name in REGISTRY and REGISTRY[name].validation_only)
    ]
    assert not stray, f"non-hash selfcheck rows for untagged queries: {stray}"
