"""The DuckDB Porter mirror must agree with the Python stemmer — on the
classic vectors from the 1980 paper AND on every distinct token of the
real test corpus (the vocabulary the stemmed BM25 oracle actually
stems)."""

import duckdb
import pytest

from metastore_spark.search.analysis import porter_stem
from metastore_spark.search.sql_stem import porter_ctes

CLASSIC = [
    "caresses", "ponies", "ties", "caress", "cats", "feed", "agreed",
    "plastered", "bled", "motoring", "sing", "conflated", "troubled",
    "sized", "hopping", "tanned", "falling", "hissing", "fizzed",
    "failing", "filing", "happy", "sky", "relational", "conditional",
    "rational", "valenci", "hesitanci", "digitizer", "conformabli",
    "radicalli", "differentli", "vileli", "analogousli", "vietnamization",
    "predication", "operator", "feudalism", "decisiveness", "hopefulness",
    "callousness", "formaliti", "sensitiviti", "sensibiliti", "triplicate",
    "formative", "formalize", "electriciti", "electrical", "hopeful",
    "goodness", "revival", "allowance", "inference", "airliner",
    "gyroscopic", "adjustable", "defensible", "irritant", "replacement",
    "adjustment", "dependent", "adoption", "homologou", "communism",
    "activate", "angulariti", "homologous", "effective", "bowdlerize",
    "probate", "rate", "cease", "controll", "roll", "syzygy", "abyss",
    "oscillate", "generalization", "y", "a", "be", "ski", "skies",
    "sties", "tie", "news", "innings",
]


def _sql_stems(words: list[str]) -> dict[str, str]:
    con = duckdb.connect()
    con.execute("CREATE TEMP TABLE vocab(w VARCHAR)")
    con.executemany("INSERT INTO vocab VALUES (?)", [(w,) for w in words])
    rows = con.execute(
        f"WITH {porter_ctes('vocab')} SELECT tok, stem FROM stems"
    ).fetchall()
    return dict(rows)


def test_classic_vectors_match_python():
    got = _sql_stems(CLASSIC)
    for w in CLASSIC:
        assert got[w] == porter_stem(w), f"{w}: sql={got[w]} py={porter_stem(w)}"


def test_full_corpus_vocabulary_matches_python():
    con = duckdb.connect()
    try:
        rows = con.execute(
            """
            SELECT DISTINCT t FROM (
              SELECT trim(CASE WHEN lower(rt) LIKE '%''s'
                          THEN left(lower(rt), len(rt) - 2)
                          ELSE lower(rt) END, '''') AS t
              FROM (SELECT unnest(string_split_regex(text,
                        '[^0-9a-zA-Z'']+')) AS rt
                    FROM read_parquet(
                        '/root/testdata/sf0.01/documents.parquet'))
              WHERE rt <> ''
            ) WHERE t <> ''
            """
        ).fetchall()
    except duckdb.Error:
        pytest.skip("test corpus not available")
    vocab = [r[0] for r in rows]
    assert len(vocab) > 20  # synthetic corpus has a deliberately tiny vocab
    got = _sql_stems(vocab)
    bad = {w: (got[w], porter_stem(w)) for w in vocab if got[w] != porter_stem(w)}
    assert not bad, f"{len(bad)} mismatches, first: {dict(list(bad.items())[:5])}"
