"""Text-analysis query bindings: documents-table operators with
DuckDB oracles. See metastore_spark/text/ops.py for the operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metastore_spark.queries import query, _t
from metastore_spark.search.analysis import ENGLISH_STOPWORDS
from metastore_spark.text import ops

_STOPLIST_SQL = ", ".join(f"'{s}'" for s in ENGLISH_STOPWORDS)


@query(
    "docs_match_token",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE list_contains(string_split_regex(lower(text), '[^a-z0-9]+'), 'spark')
      AND lang = 'en'
    """,
)
def docs_match_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/O5 analyzed `match`: token containment on an analyzed text
    field AND'd with a keyword filter (reference match semantics,
    tests/test_controllers.py:319-331)."""
    d = _t(spark, sf_dir, "documents")
    toks = ops.word_tokens(F.col("text"))
    return d.filter(F.array_contains(toks, "spark") & (F.col("lang") == "en")).select(
        "doc_id", "lang", "source"
    )


@query(
    "docs_token_stats",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, n_chars,
             string_split_regex(trim(text), '\\s+')            AS toks,
             string_split_regex(lower(text), '[^a-z0-9]+')     AS wtoks_raw
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS INTEGER)                          AS n_tokens,
           ROUND(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                 / len(toks), 4)                               AS avg_token_len,
           ROUND(CAST(len(list_filter(wtoks_raw,
                     t -> t IN ({_STOPLIST_SQL}))) AS DOUBLE)
                 / len(list_filter(wtoks_raw, t -> t <> '')), 4) AS stopword_ratio,
           n_chars
    FROM tok
    """,
)
def docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality features, all JVM-side expressions."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        ops.token_count(F.col("text")).alias("n_tokens"),
        ops.avg_token_len(F.col("text")).alias("avg_token_len"),
        ops.stopword_ratio(F.col("text")).alias("stopword_ratio"),
        "n_chars",
    )


@query(
    "docs_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
    FROM documents
    """,
)
def docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (normalized md5) per document."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", ops.fingerprint(F.col("text")).alias("fp"))


@query(
    "docs_quality_filter",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS wtoks
      FROM documents
      WHERE n_chars >= 200
    )
    SELECT doc_id, lang,
           CAST(len(wtoks) AS INTEGER) AS n_words
    FROM tok
    WHERE CAST(len(list_filter(wtoks, t -> t IN ({_STOPLIST_SQL}))) AS DOUBLE)
          / len(wtoks) >= 0.05
    """,
)
def docs_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate: min length + min stopword ratio — the standard
    pre-training corpus filter shape, fully pushdown-friendly."""
    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars") >= 200)
    wtoks = ops.word_tokens(F.col("text"))
    ratio = (
        ops._count_occurrences(wtoks, ENGLISH_STOPWORDS).cast("double")
        / F.size(wtoks)
    )
    return (
        d.select(
            "doc_id",
            "lang",
            F.size(wtoks).alias("n_words"),
            ratio.alias("_ratio"),
        )
        .filter(F.col("_ratio") >= 0.05)
        .drop("_ratio")
    )


def _marker_sql(markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(w, x -> x IN ({lst})))"


_LANG_SCORES = ",\n             ".join(
    f"{_marker_sql(m)} AS s_{lang}" for lang, m in ops.LANG_MARKERS.items()
)


@query(
    "docs_langid",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    s AS (
      SELECT doc_id, lang,
             {_LANG_SCORES}
      FROM t
    )
    SELECT doc_id, lang,
           CASE
             WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr
                  AND s_en >= s_zh THEN 'en'
             WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
             WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
             WHEN s_fr >= s_zh THEN 'fr'
             ELSE 'zh'
           END AS lang_pred
    FROM s
    """,
)
def docs_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: first-in-order argmax over marker-word
    profiles, mirrored as a CASE chain in the oracle."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang", ops.langid_expr(F.col("text")).alias("lang_pred")
    )


@query(
    "docs_bpe_tokens",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+'))
             AS INTEGER) AS n_bpe_tokens,
           n_chars
    FROM documents
    """,
)
def docs_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-token estimator: BPE-ish pre-tokenization count per doc."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        ops.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
        "n_chars",
    )
