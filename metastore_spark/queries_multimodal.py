"""Multimodal query bindings: binary-typed columns as first-class
query surface.

Two tiers, per SURVEY §2's north-star extensions:
- ``multimodal_binary_dedup`` treats the documents table's text as an
  opaque binary payload (the shape every image/audio/video table has:
  content bytes + typed metadata) and runs content-hash exact dedup
  JVM-side — fully DuckDB-oracled (sha256 over identical bytes).
- ``multimodal_decode_features`` runs the real Arrow pipeline
  (mapInPandas decode → features); the decode kernel is the
  deterministic stub (no codecs in this environment), so it's a
  rows-only driver check — the value-level pinning lives in
  tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metastore_spark import multimodal as mm
from metastore_spark.queries import query, _t


@query(
    "multimodal_binary_dedup",
    oracle="""
    SELECT sha256(text)                      AS content_sha256,
           CAST(MIN(octet_length(CAST(text AS BLOB))) AS BIGINT) AS n_bytes,
           CAST(MIN(doc_id) AS BIGINT)       AS keep_id,
           CAST(COUNT(*) AS BIGINT)          AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def multimodal_binary_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup over a BINARY column — the media-table exact
    dedup (SCALE.md 'Multimodal'): sha2 runs JVM-side on the bytes, the
    groupBy shuffles 32-byte keys with partial aggregation, bytes
    themselves never shuffle. Identical shape for images/audio/video;
    here the payload is the utf-8 encoding of documents.text so DuckDB
    can mirror it bit-for-bit."""
    d = _t(spark, sf_dir, "documents")
    content = F.encode(F.col("text"), "utf-8")
    return (
        d.select(
            F.lower(F.sha2(content, 256)).alias("content_sha256"),
            F.length(content).cast("bigint").alias("nb"),
            "doc_id",
        )
        .groupBy("content_sha256")
        .agg(
            F.min("nb").alias("n_bytes"),
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query("multimodal_decode_features", oracle=None)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract over binary media via the Arrow-batched
    mapInPandas pipeline (stub kernel — deterministic synthetic format;
    swapping in PIL changes one function, not the plan). Corpus size
    scales with sf so the driver exercises real multi-batch Arrow
    transfer. Non-SQL (binary parsing); value pinning in
    tests/test_multimodal.py."""
    n_docs = _t(spark, sf_dir, "documents").count()
    media = mm.make_media_df(spark, min(n_docs, 500))
    feats = mm.decode_image_features(media)
    return feats.select(
        "media_id",
        "width",
        "height",
        "n_bytes",
        F.round("mean_intensity", 4).alias("mean_intensity"),
        "content_sha256",
    )
