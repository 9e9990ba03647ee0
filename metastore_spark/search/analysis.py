"""English text analysis: tokenize → possessive strip → lowercase →
stop words → Porter stem.

Reproduces the semantics the reference gets from Elasticsearch's
``english`` analyzer on title/description/readme fields
(tests/test_controllers.py:16-17,52-60): stop-word removal pinned by
tests/test_controllers.py:254-272 ("the Mauna Loa" ↔ "Mauna Loa") and
stemming pinned by tests/test_controllers.py:527-552
("countries" ↔ "country").

Two tiers, chosen by call site:

- ``analyze_terms_column``: pure JVM Column expression (lowercase +
  regex split + stop-word array_except). Stays in whole-stage codegen;
  used for per-query filter predicates where stemming isn't needed.
- ``analyze_udf``: Arrow-batched pandas UDF including the Porter
  stemmer, used at *index build* time (one pass over the corpus, cost
  amortized across all queries — the same trade ES makes by analyzing
  at ingest).

The Porter stemmer below is implemented from the published algorithm
(M.F. Porter, "An algorithm for suffix stripping", Program 14(3) 1980)
— public knowledge, no code copied from any engine.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# Lucene's default English stop set (public constant).
ENGLISH_STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
)

_TOKEN_SPLIT = r"[^0-9a-zA-Z']+"


# --------------------------------------------------------------------------
# Porter stemmer (pure Python, from the published 1980 algorithm)
# --------------------------------------------------------------------------

_VOWELS = set("aeiou")


def _is_consonant(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Count VC sequences (the 'm' of the paper)."""
    m = 0
    prev_c = True
    started = False
    for i in range(len(stem)):
        c = _is_consonant(stem, i)
        if not c:
            started = True
        elif started and not prev_c:
            m += 1
        prev_c = c
    return m


def _contains_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if not (
        _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
    ):
        return False
    return word[-1] not in "wxy"


def porter_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _contains_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
    elif w.endswith("ing"):
        if _contains_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_consonant(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _contains_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    step2 = (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"),
    )
    for suf, rep in step2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 3
    step3 = (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    )
    for suf, rep in step3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 4
    step4 = (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    )
    for suf in step4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and not stem.endswith(("s", "t")):
                    break
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _ends_double_consonant(w) and w.endswith("l"):
        w = w[:-1]

    return w


# --------------------------------------------------------------------------
# Analyzer
# --------------------------------------------------------------------------


def analyze(text: str | None, stem: bool = True) -> list[str]:
    """English analysis of one string (driver-side / UDF kernel).

    Two tiers, and the tier decides possessive handling so each tier
    is internally consistent with its column-side counterpart:
    - stem=True (full english): possessive strip + Porter stem — pairs
      with ``analyze_udf`` (index build) for the search API.
    - stem=False (light): tokens exactly as ``analyze_terms_column``
      produces them (no possessive strip, no stem) — the pair used by
      match predicates and the stem-free BM25 oracle path. Mixing
      tiers between query and field side breaks matching (e.g. the
      query token 'world' vs the field token "world's").
    """
    if not text:
        return []
    out: list[str] = []
    for raw in re.split(_TOKEN_SPLIT, str(text)):
        if not raw:
            continue
        tok = raw.lower()
        if stem:
            if tok.endswith("'s"):
                tok = tok[:-2]
            tok = tok.strip("'")
        if not tok or tok in ENGLISH_STOPWORDS:
            continue
        out.append(porter_stem(tok) if stem else tok)
    return out


@F.pandas_udf(ArrayType(StringType()))
def analyze_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched full analysis (with stemming) — index-build path."""
    return texts.map(lambda t: analyze(t, stem=True))


def analyze_terms_column(col: Column) -> Column:
    """JVM-side analysis without stemming: lowercase, split, stop words.

    Preserves duplicate tokens (term frequency!) — stop words are
    dropped via chained array_remove, NOT array_except (which dedupes).
    Stays inside whole-stage codegen — safe for per-row predicates and
    for index builds where tf matters.
    """
    toks = F.array_remove(F.split(F.lower(col), _TOKEN_SPLIT), "")
    for s in ENGLISH_STOPWORDS:
        toks = F.array_remove(toks, s)
    return toks
