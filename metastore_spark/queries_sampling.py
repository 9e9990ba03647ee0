"""Deterministic sampling operators for training-data curation.

Random sampling is useless in a reproducible data pipeline; these use
content/id hashing as the randomness source, so every engine, every
run, and every retry selects the same rows — and the DuckDB oracle
can verify the exact selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metastore_spark.queries import query, _t


@query(
    "docs_stratified_sample",
    oracle="""
    SELECT doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) t
    WHERE rn <= 20
    """,
)
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified quota sample: exactly 20 docs per language, chosen
    by hash order — deterministic, balanced, reproducible (the
    per-language rebalancing step of corpus curation).

    Scale notes: one shuffle on the stratum key; for heavy strata the
    window can be preceded by a per-partition top-k. Hash order = a
    uniform permutation, so the quota is an unbiased sample.
    """
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang", "source")
    )


@query(
    "docs_pii_scrub",
    oracle="""
    SELECT doc_id,
           md5(
             regexp_replace(
               regexp_replace(text,
                 '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}',
                 '<EMAIL>', 'g'),
               '[0-9]{7,}', '<NUM>', 'g')
           ) AS scrubbed_fp,
           CAST(length(text) AS BIGINT) AS orig_len
    FROM documents
    """,
)
def docs_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: emails and long digit runs replaced by
    placeholder tokens — one JVM regexp pipeline per row, fused into
    the scan (the mandatory scrub step before any corpus leaves the
    pipeline). Output fingerprints the scrubbed text so the oracle
    verifies the exact transform."""
    d = _t(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.col("text"),
            r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
            "<EMAIL>",
        ),
        r"[0-9]{7,}",
        "<NUM>",
    )
    return d.select(
        "doc_id",
        F.md5(scrubbed).alias("scrubbed_fp"),
        F.length("text").cast("bigint").alias("orig_len"),
    )


@query(
    "docs_weighted_mixture",
    oracle="""
    SELECT doc_id, source
    FROM documents
    WHERE (source IN ('src0', 'src1')
           AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN
               ('0','1','2','3','4','5','6','7'))
       OR (source NOT IN ('src0', 'src1')
           AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1'))
    """,
)
def docs_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-weighted mixture: keep ~50% of the preferred sources and
    ~12.5% of the rest, by hash bucket — the deterministic version of
    dataset mixing weights. Pure predicate: pushes to the scan, no
    shuffle at all."""
    d = _t(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    preferred = F.col("source").isin("src0", "src1")
    keep = (preferred & bucket.isin(*"01234567")) | (
        ~preferred & bucket.isin("0", "1")
    )
    return d.filter(keep).select("doc_id", "source")


def _split_oracle() -> str:
    from metastore_spark.queries_dedup import _ph60

    return f"""
    WITH h AS (
      SELECT doc_id, lang,
             {_ph60("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
      FROM documents
    )
    SELECT lang,
           CASE WHEN bucket < 90 THEN 'train' ELSE 'val' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_id
    FROM h
    GROUP BY 1, 2
    """


@query(
    "docs_train_val_split",
    oracle=_split_oracle(),
)
def docs_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/val split by CONTENT-INDEPENDENT id
    hash — the split every training pipeline needs to be reproducible
    across runs, engines, and re-partitions (row order and partition
    layout must not change membership; a hash of the stable id is the
    only assignment with that property). Uses the portable md5-prefix
    hash so the oracle reproduces membership bit-for-bit. Map-only +
    one tiny rollup."""
    from metastore_spark.dedup.ops import portable_hash60

    d = _t(spark, sf_dir, "documents")
    bucket = portable_hash60(F.col("doc_id").cast("string")) % 100
    return (
        d.select(
            "lang",
            F.when(bucket < 90, "train").otherwise("val").alias("split"),
            "doc_id",
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_id"),
        )
    )


def _leak_safe_oracle() -> str:
    from metastore_spark.queries_dedup import _SHINGLE_PAIR_CTES, _ph60

    ph = _ph60("CAST(gkey AS VARCHAR)")
    return f"""
    WITH RECURSIVE {_SHINGLE_PAIR_CTES},
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT u FROM edges),
    reach(u, v) AS (
      SELECT u, u FROM nodes
      UNION
      SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u
    ),
    labels AS (
      SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u
    ),
    keyed AS (
      SELECT d.doc_id,
             COALESCE(l.cluster_id, d.doc_id) AS gkey,
             l.cluster_id IS NOT NULL        AS grouped
      FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
    )
    SELECT doc_id,
           CASE WHEN ({ph}) % 100 < 90 THEN 'train' ELSE 'val' END AS split,
           grouped
    FROM keyed
    """


@query("docs_split_leakage_safe", oracle=_leak_safe_oracle())
def docs_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val split: membership hashes the near-dup
    CLUSTER representative (verified-Jaccard connected component), so
    two near-duplicate documents can never land on opposite sides of
    the split — the contamination mode a plain per-doc hash split
    leaves open. Unclustered docs hash their own id; the whole
    assignment stays deterministic, engine-portable, and
    layout-independent. Composition shape: the cluster labels are
    near-dup-sized (broadcastable at any corpus scale), left-joined
    onto the corpus scan, then a map-only hash bucket."""
    from metastore_spark.dedup.ops import portable_hash60
    from metastore_spark.queries_dedup import dedup_clusters_verified

    clusters = dedup_clusters_verified(spark, sf_dir)
    d = _t(spark, sf_dir, "documents").join(
        F.broadcast(clusters), "doc_id", "left"
    )
    key = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    bucket = portable_hash60(key.cast("string")) % 100
    return d.select(
        "doc_id",
        F.when(bucket < 90, "train").otherwise("val").alias("split"),
        F.col("cluster_id").isNotNull().alias("grouped"),
    )


@query(
    "docs_mixture_temperature_weights",
    oracle="""
    WITH src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    p AS (
      SELECT source, n_docs,
             n_docs * 1.0 / (SELECT SUM(n_docs) FROM src) AS p_raw,
             POW(n_docs * 1.0 / (SELECT SUM(n_docs) FROM src), 0.7) AS p_temp
      FROM src
    )
    SELECT source, n_docs,
           ROUND(p_raw, 6) AS p_raw,
           ROUND(p_temp / (SELECT SUM(p_temp) FROM p), 6) AS p_sample,
           ROUND((p_temp / (SELECT SUM(p_temp) FROM p)) / p_raw, 4)
             AS upsample_factor
    FROM p
    ORDER BY source
    """,
)
def docs_mixture_temperature_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-scaled mixture weights: per-source sampling
    probability p_s ∝ (n_s/N)^α with α=0.7 — the exponential-
    smoothing rebalance multilingual/ multi-source LLM training uses
    (XLM-R's sampling formula; public method) so small sources are
    upsampled without letting them dominate. Emits raw share,
    temperature share, and the upsample factor a data loader applies.

    Scale shape: one partial-agg groupBy to |sources| rows; the
    normalizers are 1-row broadcast scalars over that tiny frame.
    The pow() operates on identical doubles both engines (exact
    integer counts in, one division), and outputs round to 6/4dp."""
    d = _t(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    src.persist()
    tot = src.agg(F.sum("n_docs").alias("n_total"))
    p = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        (F.col("n_docs") * 1.0 / F.col("n_total")).alias("p_raw"),
        F.pow(F.col("n_docs") * 1.0 / F.col("n_total"), 0.7).alias(
            "p_temp"
        ),
    )
    z = p.agg(F.sum("p_temp").alias("z"))
    return (
        p.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            F.round("p_raw", 6).alias("p_raw"),
            F.round(F.col("p_temp") / F.col("z"), 6).alias("p_sample"),
            F.round(
                (F.col("p_temp") / F.col("z")) / F.col("p_raw"), 4
            ).alias("upsample_factor"),
        )
        .orderBy("source")
    )


def _training_shards_oracle() -> str:
    from metastore_spark.queries_dedup import _ph60

    return f"""
    SELECT CAST({_ph60("CAST(doc_id AS VARCHAR)")} % 64 AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(list_filter(
                  string_split_regex(lower(text), '[^a-z0-9]+'),
                  t -> t <> ''))) AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY 1
    ORDER BY shard
    """


@query("docs_training_shards", oracle=_training_shards_oracle())
def docs_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment: every document lands in
    shard = portable_hash60(doc_id) % 64 — content-independent,
    partition-layout-independent, reproducible across engines and
    re-runs (the property a training corpus needs so that resuming,
    re-sharding workers, or regenerating the corpus never reshuffles
    which examples a worker sees). Emits per-shard document and token
    counts — the balance report that decides whether 64 shards feed
    64 data-loader workers evenly (hash sharding bounds skew at
    ~1/sqrt(docs/shards) relative).

    Scale shape: one scan computing (shard, token count) per row in
    codegen, one partial-agg shuffle carrying 64 groups. The shard
    column is exactly what a production writer passes to
    partitionBy(): the assignment IS the layout, so this query also
    documents the write path."""
    from metastore_spark.dedup.ops import portable_hash60
    from metastore_spark.text.ops import word_tokens

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            (portable_hash60(F.col("doc_id").cast("string")) % 64)
            .cast("bigint")
            .alias("shard"),
            F.size(word_tokens(F.col("text"))).alias("nt"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("n_tokens"),
        )
        .orderBy("shard")
    )
