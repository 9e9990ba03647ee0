"""The end-to-end corpus-curation pipeline, as ONE verified query.

Every LLM training-data pipeline runs this exact chain before any
token reaches a tokenizer: quality gate → scrub → exact dedup →
benchmark decontamination → deterministic mixture. Each stage exists
in this repo as a standalone operator; this module composes them into
the shape a production run has, and the DuckDB oracle verifies the
composition end-to-end (stage boundaries are where silent bugs live —
a filter applied after the dedup instead of before changes survivors).

Scale shape: scrub fuses into the scan; the quality gate is one
explode + partial-agg (gram counts never leave the JVM); dedup is one
16-byte-key shuffle; decontamination is a hash semi-join against the
(small) benchmark shingle set; the mixture quota is one shuffle on
the stratum key. Nothing quadratic, nothing Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metastore_spark.dedup.ops import shingle_stream
from metastore_spark.queries import query, _t, _t_compute
from metastore_spark.queries_dedup import _ph60 as _dedup_ph60
from metastore_spark.text import ops

_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_BENCH_SRC = ("src0", "src1", "src2")


@query(
    "docs_curation_pipeline",
    oracle="""
    WITH scrubbed AS (
      SELECT doc_id, lang, source,
             regexp_replace(
               regexp_replace(text,
                 '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}',
                 '<EMAIL>', 'g'),
               '[0-9]{7,}', '<NUM>', 'g') AS text
      FROM documents
    ),
    tok AS (
      SELECT doc_id, lang, source, text,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS toks
      FROM scrubbed
    ),
    topcnt AS (
      SELECT doc_id, MAX(cnt) AS top_cnt
      FROM (
        SELECT doc_id, tk, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(toks) AS tk FROM tok)
        GROUP BY doc_id, tk
      )
      GROUP BY doc_id
    ),
    quality AS (
      SELECT tok.doc_id, lang, source, text, len(toks) AS n_tokens
      FROM tok JOIN topcnt ON tok.doc_id = topcnt.doc_id
      WHERE len(toks) >= 20
        AND CAST(top_cnt AS DOUBLE) / len(toks) <= 0.25
    ),
    deduped AS (
      SELECT * FROM quality
      WHERE doc_id IN (
        SELECT MIN(doc_id) FROM quality
        GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
      )
    ),
    sh AS (
      SELECT doc_id, source,
             list_distinct(CASE WHEN len(toks) < 5
               THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(1, len(toks) - 3),
                      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2],
                                     toks[i+3], toks[i+4]))
             END) AS shingles
      FROM tok
    ),
    bench AS (
      SELECT DISTINCT unnest(shingles) AS s FROM sh
      WHERE source IN ('src0', 'src1', 'src2')
    ),
    contaminated AS (
      SELECT DISTINCT doc_id
      FROM (SELECT doc_id, unnest(shingles) AS s FROM sh
            WHERE source NOT IN ('src0', 'src1', 'src2')) r
      JOIN bench USING (s)
    ),
    clean AS (
      SELECT * FROM deduped
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        AND source NOT IN ('src0', 'src1', 'src2')
    )
    SELECT doc_id, lang, source, CAST(n_tokens AS BIGINT) AS n_tokens
    FROM (
      SELECT doc_id, lang, source, n_tokens,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM clean
    )
    WHERE rn <= 50
    ORDER BY doc_id
    """,
)
def docs_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate (≥20 tokens, top-token ≤25%) → PII scrub → exact
    dedup (scrub-then-fingerprint, min doc_id survives) → benchmark
    decontamination (5-gram overlap with src0-2, computed on the PRE-
    dedup corpus so a contaminated duplicate can't launder its twin)
    → deterministic per-language quota (50, hash order).

    Stage-order subtleties the oracle pins: quality runs on SCRUBBED
    text (a redacted email shortens the doc), dedup groups only
    quality survivors, contamination is detected on the full corpus
    (not survivors), and the benchmark sources themselves are excluded
    from the final mixture."""
    d = _t(spark, sf_dir, "documents")
    scrub = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL, "<EMAIL>"),
        r"[0-9]{7,}",
        "<NUM>",
    )
    toks = (
        d.select("doc_id", "lang", "source", scrub.alias("text"))
        .withColumn("toks", ops.word_tokens(F.col("text")))
        .cache()
    )

    # -- stage 1: quality gate. Top-token count via explode +
    #    partial-agg (the repetition-signals shape), not a per-doc
    #    lambda — grams collapse map-side before the doc_id shuffle.
    topcnt = (
        toks.select("doc_id", F.explode("toks").alias("tk"))
        .groupBy("doc_id", "tk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top_cnt"))
    )
    quality = (
        toks.withColumn("n_tokens", F.size("toks"))
        .join(topcnt, "doc_id")
        .filter(
            (F.col("n_tokens") >= 20)
            & (F.col("top_cnt").cast("double") / F.col("n_tokens") <= 0.25)
        )
    )

    # -- stage 2: exact dedup on normalized scrubbed text
    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    keep = (
        quality.select(fp.alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = quality.join(keep, "doc_id", "left_semi")

    # -- stage 3: decontamination. Benchmark and candidate shingle
    #    streams are built from the cached token frame, filtered by
    #    source BEFORE shingling (no corpus-sized join), hash-keyed.
    bench = (
        shingle_stream(
            toks.filter(F.col("source").isin(*_BENCH_SRC)),
            "text",
            "doc_id",
            5,
            tokens_col="toks",
        )
        .select(F.xxhash64("shingle").alias("h"))
        .distinct()
    )
    contaminated = (
        shingle_stream(
            toks.filter(~F.col("source").isin(*_BENCH_SRC)),
            "text",
            "doc_id",
            5,
            tokens_col="toks",
        )
        .select("doc_id", F.xxhash64("shingle").alias("h"))
        .join(bench, "h", "left_semi")
        .select("doc_id")
        .distinct()
    )
    # the benchmark documents themselves never enter the training mix
    # (they ARE the eval corpus — review finding: without this, a
    # src0-2 doc could pass quality+dedup and reach the quota stage)
    clean = deduped.join(contaminated, "doc_id", "left_anti").filter(
        ~F.col("source").isin(*_BENCH_SRC)
    )

    # -- stage 4: deterministic per-language mixture quota
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        clean.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select(
            "doc_id",
            "lang",
            "source",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


@query(
    "docs_pack_sequences",
    oracle="""
    WITH sized AS (
      SELECT doc_id,
             CAST(len(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'),
               t -> t <> '')) AS BIGINT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS ord
      FROM documents
    ),
    placed AS (
      SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS start_offset
      FROM sized
    )
    SELECT doc_id, n_tokens, start_offset,
           CAST(start_offset // 2048 AS BIGINT) AS chunk_id,
           (start_offset // 2048) <>
             ((start_offset + GREATEST(n_tokens, 1) - 1) // 2048)
             AS spans_boundary
    FROM placed
    ORDER BY doc_id
    """,
)
def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-split sequence packing: docs laid out in
    deterministic hash order, split into 2048-token training windows —
    each doc gets its global token offset, window id, and a
    spans-boundary flag. This is the layout step between curation and
    tokenization in every pretraining pipeline.

    The global running offset is computed as a DISTRIBUTED PREFIX SUM,
    not a single-partition window: docs bucket by their hash-order
    prefix (256 buckets), each bucket computes a local cumulative sum
    in parallel, bucket totals (a 256-row frame) broadcast back as
    bucket base offsets. The oracle states the same thing as the naive
    global window — at 100 TB the naive form serializes on one task;
    this form's only global object is the 256-row offset table.
    Two-phase prefix sum per Blelloch 1990 ("Prefix sums and their
    applications")."""
    d = _t(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        F.size(ops.word_tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("ord"),
    ).withColumn("bucket", F.substring("ord", 1, 2))

    # phase 1: parallel per-bucket cumulative sums (hash-prefix
    # buckets preserve the global md5 order across bucket boundaries)
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = sized.withColumn(
        "local_off", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )

    # phase 2: bucket base offsets — a 256-row aggregate, broadcast
    w_bucket = (
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = (
        sized.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("bucket_total"))
        .withColumn(
            "base", F.coalesce(F.sum("bucket_total").over(w_bucket), F.lit(0))
        )
        .select("bucket", "base")
    )

    budget = F.lit(2048).cast("bigint")
    placed = local.join(F.broadcast(bases), "bucket").withColumn(
        "start_offset", (F.col("base") + F.col("local_off")).cast("bigint")
    )
    chunk = F.floor(F.col("start_offset") / budget)
    # greatest(n,1) keeps the numerator non-negative — a zero-token doc
    # at offset 0 would otherwise hit floor(-1/2048) = -1 in Spark vs
    # DuckDB //'s truncate-to-0, and an empty doc spans nothing anyway
    last_chunk = F.floor(
        (F.col("start_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
        / budget
    )
    return placed.select(
        "doc_id",
        "n_tokens",
        "start_offset",
        chunk.cast("bigint").alias("chunk_id"),
        (chunk != last_chunk).alias("spans_boundary"),
    ).orderBy("doc_id")


@query(
    "docs_chunk_split",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    st AS (
      SELECT doc_id, toks,
             unnest(generate_series(1, greatest(len(toks) - 32, 1), 96))
               AS start
      FROM toks WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST((start - 1) // 96 AS INT)                       AS chunk_idx,
           CAST(start AS INT)                                   AS start,
           CAST(least(start + 127, len(toks)) - start + 1 AS INT) AS n_tokens,
           array_to_string(toks[start : least(start + 127, len(toks))], ' ')
             AS chunk_text
    FROM st
    """,
)
def docs_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-window chunking: every doc split into 128-token windows
    with stride 96 (32-token overlap) — the standard context-window
    prep before tokenization. Pure codegen (sequence → explode →
    slice), map-only: chunks never shuffle, the operator fuses into
    the scan; a doc shorter than one window yields itself. chunk_idx
    is derived arithmetically from the start offset so both engines
    agree without ordinality."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", ops.word_tokens(F.col("text")).alias("_toks"))
    n = F.size("_toks")
    window, stride = 128, 96
    starts = F.sequence(
        F.lit(1),
        F.greatest(n - F.lit(window - stride), F.lit(1)),
        F.lit(stride),
    )
    ex = toks.filter(n > 0).select(
        "doc_id", "_toks", F.explode(starts).alias("start")
    )
    chunk = F.slice("_toks", F.col("start"), window)
    return ex.select(
        "doc_id",
        F.floor((F.col("start") - 1) / stride).cast("int").alias("chunk_idx"),
        F.col("start").cast("int").alias("start"),
        F.size(chunk).alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


# Shared unrolled scalar fold — see queries_dedup._ph60's rationale.
_GS_PH60 = _dedup_ph60(
    "CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)"
)


@query(
    "docs_global_shuffle",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id,
             CAST(len(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'),
               t -> t <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    e AS (
      SELECT doc_id, n_tokens, CAST(epoch AS INT) AS epoch
      FROM sized, (SELECT UNNEST([1, 2]) AS epoch)
    ),
    keyed AS (
      SELECT doc_id, n_tokens, epoch, {_GS_PH60} AS k
      FROM e
    ),
    o AS (
      SELECT epoch, k >> 57 AS shard, k, n_tokens,
             ROW_NUMBER() OVER (
               PARTITION BY epoch, k >> 57 ORDER BY k, doc_id
             ) AS r,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY epoch, k >> 57 ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS off
      FROM keyed
    )
    SELECT epoch,
           CAST(shard AS BIGINT)                      AS shard,
           CAST(COUNT(*) AS BIGINT)                   AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT)              AS total_tokens,
           CAST(SUM((r % 1000003) * (k % 1000003))
                % 1000000007 AS BIGINT)               AS order_checksum,
           CAST(SUM((r % 1000003) * (off % 1000003))
                % 1000000007 AS BIGINT)               AS offset_checksum,
           CAST(MIN(k) AS BIGINT)                     AS min_key,
           CAST(MAX(k) AS BIGINT)                     AS max_key
    FROM o
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def docs_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC GLOBAL CORPUS SHUFFLE (VERDICT r9 task 7): the
    operator every training run needs between curation and packing —
    a content-independent, seed-keyed TOTAL ORDER over the corpus,
    materialized shard-preserving, one fresh permutation per epoch.

    The sort key is ``portable_hash60(doc_id ':' epoch)``: stable
    across runs and engines, independent of document content (a
    one-byte edit moves nothing), re-keyed per epoch (epoch 2 is a
    different permutation of the same corpus). Shard = the key's top
    3 bits, so shards ARE hash ranges: workers can materialize each
    shard independently and concatenating shards 0..7 reproduces the
    global order — no global rank needed. Within each shard, the
    packing offset (cumulative token count in shuffle order) composes
    this with `docs_pack_sequences`' layout.

    Output pins the permutation EXACTLY: per (epoch, shard), the
    rank-weighted key checksum fixes the order (any transposition
    changes it) and the rank-weighted offset checksum fixes the
    packed layout; counts/min/max pin membership. All checksums are
    modular-integer arithmetic — cross-engine exact.

    Scale shape: one hash exchange on (epoch, shard) + per-shard
    sorts, NO single-partition global sort and no range-sampling
    pass (tests/test_plans.py asserts the plan). At 100 TB: raise
    the shard bit-width (top-k bits) so each hash range fits an
    executor — the order stays identical, only the parallelism
    changes. Reference anchor: the epoch-shuffle every data loader
    (e.g. MosaicML StreamingDataset's deterministic shuffle) performs
    ahead of sequence packing."""
    from metastore_spark.dedup.ops import portable_hash60

    d = _t(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        F.size(ops.word_tokens(F.col("text"))).cast("bigint").alias(
            "n_tokens"
        ),
    )
    e = sized.select(
        "*",
        F.explode(F.array(F.lit(1), F.lit(2))).alias("epoch"),
    )
    keyed = e.select(
        "doc_id",
        "n_tokens",
        "epoch",
        portable_hash60(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("epoch").cast("string"),
            )
        ).alias("k"),
    ).withColumn("shard", F.shiftright(F.col("k"), 57))
    w = Window.partitionBy("epoch", "shard").orderBy("k", "doc_id")
    o = keyed.select(
        "epoch",
        "shard",
        "k",
        "n_tokens",
        F.row_number().over(w).cast("bigint").alias("r"),
        F.coalesce(
            F.sum("n_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("bigint").alias("off"),
    )
    return (
        o.groupBy("epoch", F.col("shard").cast("bigint").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            (
                F.sum((F.col("r") % 1000003) * (F.col("k") % 1000003))
                % 1000000007
            ).cast("bigint").alias("order_checksum"),
            (
                F.sum((F.col("r") % 1000003) * (F.col("off") % 1000003))
                % 1000000007
            ).cast("bigint").alias("offset_checksum"),
            F.min("k").cast("bigint").alias("min_key"),
            F.max("k").cast("bigint").alias("max_key"),
        )
        .orderBy("epoch", "shard")
    )
