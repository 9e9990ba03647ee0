"""Text-analysis operators for a large-scale training-data pipeline.

Everything here is a pure Column expression (JVM-side, whole-stage
codegen) — no Python in the per-row hot path. These are the building
blocks a 100 TB document-corpus pipeline runs on every row, so they
must vectorize: tokenization is one regexp split, ratios are
higher-order array functions, fingerprints are built-in hashes.

Operators:
- ``tokens`` / ``token_count``   : whitespace + regex tokenization
- ``quality_features``           : length/word/stopword-ratio scoring
- ``langid_expr``                : marker-word n-gram language heuristic
- ``fingerprint``                : normalized-text content fingerprint
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from metastore_spark.search.analysis import ENGLISH_STOPWORDS

# Marker words per language for the n-gram/stopword language-ID
# heuristic. Tiny profile sets keep the expression JVM-evaluable; a
# production profile would be a broadcast dict of char-trigram
# frequencies applied the same way.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "que", "es"),
    "fr": ("le", "la", "les", "que", "est"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # pinyin-romanized markers
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization of trimmed text → array<string>."""
    return F.split(F.trim(col), r"\s+")


def word_tokens(col: Column) -> Column:
    """Alphanumeric-run tokenization of lowercased text.

    array_remove (codegen'd builtin) instead of a higher-order filter
    lambda: HOF lambdas are interpreted per element and measured ~10×
    slower on this hot path.
    """
    return F.array_remove(F.split(F.lower(col), r"[^a-z0-9]+"), "")


def _count_occurrences(arr: Column, values: tuple[str, ...]) -> Column:
    """How many elements of ``arr`` are in ``values`` (with duplicates).

    Chained array_remove keeps this in whole-stage codegen; a
    size-difference instead of a per-element lambda.
    """
    removed = arr
    for v in values:
        removed = F.array_remove(removed, v)
    return F.size(arr) - F.size(removed)


def token_count(col: Column) -> Column:
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(tokens(col))
    )


def avg_token_len(col: Column) -> Column:
    """Mean token length, 4dp — a cheap garbled-text signal."""
    toks = tokens(col)
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    return F.round(total.cast("double") / F.size(toks), 4)


def stopword_ratio(col: Column) -> Column:
    """Share of tokens that are English stop words, 4dp.

    Natural prose sits around 0.3-0.5; keyword spam and boilerplate
    sit near 0 — a standard quality-filter feature.
    """
    toks = word_tokens(col)
    n_stop = _count_occurrences(toks, ENGLISH_STOPWORDS)
    return F.round(n_stop.cast("double") / F.size(toks), 4)


def langid_expr(col: Column) -> Column:
    """Greatest-marker-hits language guess over LANG_MARKERS profiles.

    Ties break by profile order (en first), mirroring a stable argmax.

    Shape matters: an argmax built as a chained ``F.when`` ladder
    embeds every previous best-score subtree TWICE per step (condition
    + otherwise), so the expression tree grows 2^n copies of the
    marker-count expressions — measured ~200s for 50k docs at sf1.
    Instead each score is evaluated exactly once inside an array of
    structs and ``array_max`` does the argmax via struct ordering
    (score desc, then profile order via negated index — en first on
    ties, identical semantics to the ladder).
    """
    toks = word_tokens(col)
    cands = [
        F.struct(
            _count_occurrences(toks, markers).alias("s"),
            F.lit(-i).alias("ni"),
            F.lit(lang).alias("l"),
        )
        for i, (lang, markers) in enumerate(LANG_MARKERS.items())
    ]
    return F.array_max(F.array(*cands))["l"]


# Simplified GPT-2-style byte-pair pre-tokenization pattern (public:
# the openai/gpt-2 regex, minus unicode classes and lookahead so it
# runs identically under Java regex and RE2): contractions, letter
# runs, digit runs, punctuation runs — each optionally space-prefixed.
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def bpe_token_count(col: Column) -> Column:
    """Token count under BPE-ish pre-tokenization — the standard
    'how many LLM tokens is this corpus' estimator (one regexp pass,
    JVM-side)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_SPLIT_PATTERN), F.lit(0)))


def fingerprint(col: Column) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text.

    The exact-dedup key: whitespace/case variations collapse to one
    fingerprint; any semantic change produces a new one.
    """
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(normalized)


def rolling_hashes(col: Column, window: int = 8, mod: int = 1 << 31) -> Column:
    """Polynomial rolling hashes of every ``window``-gram of tokens.

    The winnowing-style fingerprint set for near-dup detection
    (Schleimer et al., SIGMOD 2003 'Winnowing' — public algorithm).
    JVM-side: transform over token positions, aggregate for the
    polynomial hash. Returns array<bigint>.
    """
    toks = word_tokens(col)
    n = F.size(toks)
    base = F.lit(1000003).cast("bigint")

    def gram_hash(i: Column) -> Column:
        gram = F.slice(toks, i + 1, window)
        return F.aggregate(
            gram,
            F.lit(0).cast("bigint"),
            lambda acc, t: (acc * base + F.xxhash64(t)) % F.lit(mod),
        )

    idx = F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)))
    return F.when(n < window, F.array().cast("array<bigint>")).otherwise(
        F.transform(idx, gram_hash)
    )
