"""DuckDB-SQL mirror of the Porter stemmer in analysis.porter_stem.

Generates a chain of CTEs that stem a vocabulary relation entirely in
SQL, so the stemmed-tier BM25 pipeline can be value-hash oracled: the
oracle re-derives every stem independently inside DuckDB instead of
trusting the engine's analyzer (tests/test_sql_stem.py proves the two
stemmers agree on the whole corpus vocabulary plus the classic vectors
from the 1980 paper).

Building blocks mirror the Python helpers one-for-one:
- the c/v pattern is a character fold (list_reduce) with the paper's
  y-rule (y is a consonant at position 0 or after a vowel),
- measure m counts 'v+c+' blocks of the pattern,
- *v* / *d / *o are LIKE / pattern-suffix checks.

Every step is a CASE chain in its own CTE; rule order inside a step
and first-match-wins ("break") semantics match the Python exactly.
"""

from __future__ import annotations

# --- expression builders (compose SQL text; {x} is any string expr) --------


def _pat(x: str) -> str:
    """c/v pattern of ``x`` — the fold mirrors _is_consonant."""
    return (
        f"list_reduce(list_prepend('', string_split({x}, '')), "
        "(acc, ch) -> acc || (CASE WHEN ch IN ('a','e','i','o','u') THEN 'v' "
        "WHEN ch = 'y' THEN (CASE WHEN acc = '' OR right(acc, 1) = 'v' "
        "THEN 'c' ELSE 'v' END) ELSE 'c' END))"
    )


def _m(x: str) -> str:
    """measure(x): number of VC sequences."""
    return f"len(regexp_extract_all({_pat(x)}, 'v+c+'))"


def _cv(x: str) -> str:
    """contains_vowel(x)."""
    return f"({_pat(x)} LIKE '%v%')"


def _cut(w: str, n: int) -> str:
    return f"left({w}, len({w}) - {n})"


def _dblc(w: str) -> str:
    """ends_double_consonant(w)."""
    return (
        f"(len({w}) >= 2 AND substr({w}, len({w}), 1) = "
        f"substr({w}, len({w}) - 1, 1) AND right({_pat(w)}, 1) = 'c')"
    )


def _cvc(w: str) -> str:
    """ends_cvc(w) (with the w/x/y exclusion)."""
    return (
        f"(len({w}) >= 3 AND right({_pat(w)}, 3) = 'cvc' "
        f"AND right({w}, 1) NOT IN ('w', 'x', 'y'))"
    )


# rule tables — identical content and order to analysis.porter_stem
_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
    ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
    ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
    ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
    ("biliti", "ble"),
)
_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def _suffix_rules_m_gt(rules, threshold: int) -> str:
    """CASE chain for step 2/3 style rules: first matching suffix wins;
    the replacement applies only when measure(stem) > threshold."""
    whens = []
    for suf, rep in rules:
        stem = _cut("w", len(suf))
        rep_sql = f"{stem} || '{rep}'" if rep else stem
        whens.append(
            f"WHEN w LIKE '%{suf}' THEN "
            f"(CASE WHEN {_m(stem)} > {threshold} THEN {rep_sql} ELSE w END)"
        )
    return "CASE " + " ".join(whens) + " ELSE w END"


def porter_ctes(vocab: str = "vocab") -> str:
    """CTE chain ``p1..p8, stems`` over ``vocab(w)`` ending in
    stems(tok, stem). Paste after a vocab CTE inside WITH."""
    step1a = (
        "CASE WHEN w LIKE '%sses' THEN " + _cut("w", 2) +
        " WHEN w LIKE '%ies' THEN " + _cut("w", 2) +
        " WHEN w LIKE '%ss' THEN w"
        " WHEN w LIKE '%s' THEN " + _cut("w", 1) +
        " ELSE w END"
    )
    # step 1b: new word and the 'suffix removed' flag, computed together
    step1b_w = (
        "CASE WHEN w LIKE '%eed' THEN (CASE WHEN "
        + _m(_cut("w", 3)) + " > 0 THEN " + _cut("w", 1) + " ELSE w END)"
        " WHEN w LIKE '%ed' THEN (CASE WHEN " + _cv(_cut("w", 2))
        + " THEN " + _cut("w", 2) + " ELSE w END)"
        " WHEN w LIKE '%ing' THEN (CASE WHEN " + _cv(_cut("w", 3))
        + " THEN " + _cut("w", 3) + " ELSE w END)"
        " ELSE w END"
    )
    step1b_flag = (
        "CASE WHEN w LIKE '%eed' THEN false"
        " WHEN w LIKE '%ed' THEN " + _cv(_cut("w", 2)) +
        " WHEN w LIKE '%ing' THEN " + _cv(_cut("w", 3)) +
        " ELSE false END"
    )
    step1b_fix = (
        "CASE WHEN NOT flag THEN w"
        " WHEN w LIKE '%at' OR w LIKE '%bl' OR w LIKE '%iz' THEN w || 'e'"
        " WHEN " + _dblc("w") +
        " AND NOT (w LIKE '%l' OR w LIKE '%s' OR w LIKE '%z')"
        " THEN " + _cut("w", 1) +
        " WHEN " + _m("w") + " = 1 AND " + _cvc("w") + " THEN w || 'e'"
        " ELSE w END"
    )
    step1c = (
        "CASE WHEN w LIKE '%y' AND " + _cv(_cut("w", 1))
        + " THEN " + _cut("w", 1) + " || 'i' ELSE w END"
    )
    # step 4: bare removal when m > 1, with the (s|t) guard before 'ion'
    whens4 = []
    for suf in _STEP4:
        stem = _cut("w", len(suf))
        cond = f"{_m(stem)} > 1"
        if suf == "ion":
            cond += f" AND ({stem} LIKE '%s' OR {stem} LIKE '%t')"
        whens4.append(
            f"WHEN w LIKE '%{suf}' THEN "
            f"(CASE WHEN {cond} THEN {stem} ELSE w END)"
        )
    step4 = "CASE " + " ".join(whens4) + " ELSE w END"
    stem5a = _cut("w", 1)
    step5a = (
        "CASE WHEN w LIKE '%e' THEN (CASE WHEN " + _m(stem5a) + " > 1 OR ("
        + _m(stem5a) + " = 1 AND NOT " + _cvc(stem5a) + ") THEN "
        + stem5a + " ELSE w END) ELSE w END"
    )
    step5b = (
        "CASE WHEN " + _m("w") + " > 1 AND " + _dblc("w")
        + " AND w LIKE '%l' THEN " + _cut("w", 1) + " ELSE w END"
    )
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and the
    # chained stemmer steps re-expand each other's CASE/list_reduce
    # trees combinatorially — the planner never returns. Materializing
    # evaluates each step once over the (tiny) vocabulary.
    return f"""
    p1 AS MATERIALIZED (SELECT w AS w0, {step1a} AS w FROM {vocab}),
    p2 AS MATERIALIZED (SELECT w0, {step1b_w} AS w, {step1b_flag} AS flag FROM p1),
    p3 AS MATERIALIZED (SELECT w0, {step1b_fix} AS w FROM p2),
    p4 AS MATERIALIZED (SELECT w0, {step1c} AS w FROM p3),
    p5 AS MATERIALIZED (SELECT w0, {_suffix_rules_m_gt(_STEP2, 0)} AS w FROM p4),
    p6 AS MATERIALIZED (SELECT w0, {_suffix_rules_m_gt(_STEP3, 0)} AS w FROM p5),
    p7 AS MATERIALIZED (SELECT w0, {step4} AS w FROM p6),
    p8 AS MATERIALIZED (SELECT w0, {step5a} AS w FROM p7),
    stems AS MATERIALIZED (
      SELECT w0 AS tok,
             CASE WHEN len(w0) <= 2 THEN w0 ELSE {step5b} END AS stem
      FROM p8
    )"""
