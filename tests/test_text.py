"""Text-analysis operator unit tests."""

import pytest
from pyspark.sql import functions as F

from metastore_spark.text import ops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox and the lazy dog"),
        (1, "der hund und die katze ist das"),
        (2, "spark spark spark"),
        (3, ""),
        (4, "  padded   whitespace  text  "),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _one(df, col_expr, doc_id):
    return df.filter(F.col("doc_id") == doc_id).select(col_expr.alias("v")).first()["v"]


def test_token_count(docs):
    assert _one(docs, ops.token_count(F.col("text")), 0) == 8
    assert _one(docs, ops.token_count(F.col("text")), 3) == 0
    assert _one(docs, ops.token_count(F.col("text")), 4) == 3


def test_stopword_ratio(docs):
    # 'the','and','the' of 8 tokens
    assert _one(docs, ops.stopword_ratio(F.col("text")), 0) == round(3 / 8, 4)
    assert _one(docs, ops.stopword_ratio(F.col("text")), 2) == 0.0


def test_langid(docs):
    assert _one(docs, ops.langid_expr(F.col("text")), 0) == "en"
    assert _one(docs, ops.langid_expr(F.col("text")), 1) == "de"


def test_fingerprint_normalizes(spark):
    rows = [(0, "Hello  World"), (1, "hello world"), (2, "hello world!")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    fps = [r["fp"] for r in df.select(ops.fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]  # punctuation is content


def test_rolling_hashes(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e f g h i j"), (1, "short text")],
        "doc_id bigint, text string",
    )
    out = df.select(ops.rolling_hashes(F.col("text"), window=8).alias("h")).collect()
    assert len(out[0]["h"]) == 3  # 10 tokens, window 8 → 3 grams
    assert out[1]["h"] == []  # under window → empty
