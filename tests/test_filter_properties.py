"""Property-based tests for the filter algebra (SURVEY.md §5: the
reference pins AND/OR/typing only pointwise; properties pin the whole
combinator space).

Oracle: a pure-Python evaluator of the documented semantics —
AND across fields, OR within a field's value list, term = exact
typed equality, match = analyzed token containment.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from metastore_spark.operators.filters import apply_filters
from metastore_spark.params import parse_params
from metastore_spark.search.analysis import analyze

FIELDS = ["f_str", "f_num", "f_bool"]

doc_strategy = st.fixed_dictionaries(
    {
        "doc_id": st.integers(0, 10**6),
        "f_str": st.sampled_from(["alpha", "beta", "gamma delta", "the x"]),
        "f_num": st.integers(0, 5),
        "f_bool": st.booleans(),
    }
)

value_strategy = st.one_of(
    # includes stop-word-bearing and stop-word-only values: both sides
    # of a match must analyze identically (the corner a type-blind
    # tokenizer on the query side silently breaks)
    st.sampled_from(
        ["alpha", "beta", "gamma", "zeta", "the x", "the", "gamma delta"]
    ),
    st.integers(0, 6),
    st.booleans(),
)

filters_strategy = st.dictionaries(
    st.sampled_from(FIELDS),
    st.lists(value_strategy, min_size=1, max_size=3),
    min_size=0,
    max_size=3,
)


def _match_one(field_value, filter_value) -> bool:
    if isinstance(filter_value, bool):
        text = "true" if filter_value else "false"
    else:
        text = str(filter_value)
    want = analyze(text, stem=False)
    if not want:
        return False
    if isinstance(field_value, bool):
        field_text = "true" if field_value else "false"
    else:
        field_text = str(field_value)
    have = set(analyze(field_text, stem=False))
    return all(t in have for t in want)


def _term_one(field_value, filter_value) -> bool:
    """SQL comparison-coercion semantics (what the engine documents):
    bool↔number compares via int cast (False≡0, True≡1); string↔number
    compares via numeric cast of the string (non-numeric → no match);
    bool↔string compares via boolean cast of the string."""
    fv, qv = field_value, filter_value
    fb, qb = isinstance(fv, bool), isinstance(qv, bool)
    if fb and qb:
        return fv == qv
    if fb != qb:
        b, other = (fv, qv) if fb else (qv, fv)
        if isinstance(other, (int, float)):
            return int(b) == other
        return str(other).strip().lower() in (
            ("true", "t", "yes", "y", "1") if b else ("false", "f", "no", "n", "0")
        )
    if isinstance(fv, str) != isinstance(qv, str):
        s, num = (fv, qv) if isinstance(fv, str) else (qv, fv)
        try:
            return float(s) == num
        except ValueError:
            return False
    return fv == qv


def _python_eval(doc: dict, filters: dict, mode: str) -> bool:
    one = _term_one if mode == "term" else _match_one
    return all(
        any(one(doc[f], v) for v in vals) for f, vals in filters.items()
    )


@pytest.fixture(scope="module")
def mk_df(spark):
    def make(docs):
        return spark.createDataFrame(
            docs, "doc_id bigint, f_str string, f_num bigint, f_bool boolean"
        )

    return make


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(doc_strategy, min_size=1, max_size=8, unique_by=lambda d: d["doc_id"]),
       filters=filters_strategy)
@pytest.mark.parametrize("mode", ["term", "match"])
def test_filters_match_python_reference(mk_df, docs, filters, mode):
    df = mk_df(docs)
    got = {
        r["doc_id"] for r in apply_filters(df, filters, mode=mode).collect()
    }
    want = {d["doc_id"] for d in docs if _python_eval(d, filters, mode)}
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(filters=filters_strategy)
def test_parse_roundtrip(filters):
    """JSON-encoding params and parsing them back yields the same
    typed filter spec (the wire contract is lossless)."""
    params = {k: [json.dumps(v) for v in vs] for k, vs in filters.items()}
    spec = parse_params(params)
    assert spec.filters == filters


# ---------------------------------------------------------------------------
# _validate_filter_fields vs Spark's own resolver (VERDICT r7 task 7):
# the schema walk must accept exactly the dotted paths Spark resolves,
# under BOTH case-sensitivity modes, across struct/array/map nesting.
# ---------------------------------------------------------------------------

_NESTED_SCHEMA = (
    "id string, "
    "Outer struct<Inner: struct<Leaf: int, other: string>, "
    "arr: array<struct<Elem: int>>, m: map<string,string>>, "
    "tags array<string>"
)
_NESTED_ROWS = [
    (
        "a",
        ((1, "x"), [(2,)], {"any-key": "v"}),
        ["t1"],
    )
]

_PATHS = [
    "id",
    "ID",
    "outer",
    "Outer.Inner.Leaf",
    "outer.inner.leaf",
    "OUTER.INNER.LEAF",
    "Outer.arr.Elem",
    "outer.ARR.elem",
    "Outer.m.flow-id",
    "Outer.m.anything.at.all",
    "tags",
    "nope",
    "Outer.nope",
    "Outer.Inner.nope",
    "Outer.arr.nope",
    "id.sub",
]


@pytest.mark.parametrize("case_sensitive", [False, True])
def test_validate_filter_fields_matches_spark_resolver(
    spark, case_sensitive
):
    """For every probe path: our schema walk accepts it iff Spark's
    analyzer resolves `col(path)` on the frame, under the session's
    spark.sql.caseSensitive setting. Pins the one divergence VERDICT
    r7 flagged: the walk was unconditionally case-insensitive."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from metastore_spark.api import _validate_filter_fields
    from metastore_spark.params import ParamError

    df = spark.createDataFrame(_NESTED_ROWS, _NESTED_SCHEMA)
    old = spark.conf.get("spark.sql.caseSensitive")
    spark.conf.set("spark.sql.caseSensitive", str(case_sensitive).lower())
    try:
        for path in _PATHS:
            try:
                df.select(F.col(path).alias("_probe")).schema
                spark_ok = True
            except AnalysisException:
                spark_ok = False
            try:
                _validate_filter_fields(df, {path: ["v"]})
                walk_ok = True
            except ParamError:
                walk_ok = False
            assert walk_ok == spark_ok, (
                f"{path!r}: walk={walk_ok} spark={spark_ok} "
                f"(caseSensitive={case_sensitive})"
            )
    finally:
        spark.conf.set("spark.sql.caseSensitive", old)
