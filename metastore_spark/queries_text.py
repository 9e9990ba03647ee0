"""Text-analysis query bindings: documents-table operators with
DuckDB oracles. See metastore_spark/text/ops.py for the operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metastore_spark.queries import query, _t, _t_compute
from metastore_spark.search.analysis import ENGLISH_STOPWORDS
from metastore_spark.text import ops
from metastore_spark.dedup.ops import shingles_from_tokens as dd_shingles
from metastore_spark.dedup import ops as dd

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
    pre-training corpus filter shape, fully pushdown-friendly.

    Stopword counting is explode → conditional count with an `isin`
    InSet (hash-set probe, whole-stage codegen) — ONE pass over the
    token stream. The previous chained-array_remove counter rescanned
    (and reallocated) every doc's token array once per stopword:
    33 passes, measured 32s Spark-side at sf1 vs ~3s for this shape.
    The added exchange is partial-aggregated to one row per doc
    map-side, so shuffle volume is O(docs), not O(tokens). Docs whose
    token array is empty drop out of the explode — identical to the
    old null-ratio filter outcome."""
    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars") >= 200)
    toks = d.select(
        "doc_id", "lang", F.explode(ops.word_tokens(F.col("text"))).alias("t")
    )
    agg = toks.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.count(F.when(F.col("t").isin(*ENGLISH_STOPWORDS), 1)).alias("_stop"),
    )
    return (
        agg.filter(
            F.col("_stop").cast("double") / F.col("n_words") >= 0.05
        )
        .select("doc_id", "lang", F.col("n_words").cast("int"))
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


@query(
    "docs_repetition_signals",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    uni AS (
      SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_uniq,
             MAX(cnt) AS top_cnt
      FROM (
        SELECT doc_id, t, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(toks) AS t FROM tok)
        GROUP BY doc_id, t
      )
      GROUP BY doc_id
    ),
    big AS (
      SELECT doc_id, MAX(cnt) AS top_bigram_cnt, SUM(cnt) AS n_bigrams
      FROM (
        SELECT doc_id, g, COUNT(*) AS cnt
        FROM (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(toks)),
                        i -> concat_ws(' ', toks[i], toks[i + 1]))) AS g
          FROM tok WHERE len(toks) >= 2
        )
        GROUP BY doc_id, g
      )
      GROUP BY doc_id
    )
    SELECT uni.doc_id, n_tokens,
           ROUND(CAST(n_uniq AS DOUBLE) / n_tokens, 4)          AS uniq_ratio,
           ROUND(CAST(top_cnt AS DOUBLE) / n_tokens, 4)         AS top_token_frac,
           ROUND(CAST(top_bigram_cnt AS DOUBLE) / n_bigrams, 4) AS top_bigram_frac
    FROM uni LEFT JOIN big USING (doc_id)
    ORDER BY doc_id
    """,
)
def docs_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: distinct
    token ratio, most-frequent-token fraction, most-frequent-bigram
    fraction. High repetition → low-quality / machine-generated text.

    Shape at scale: one explode + two partial-agg aggregations per
    granularity (token, bigram) — the exchange carries (doc, gram,
    count) rows, and grams never leave the JVM. No O(doc²) anywhere;
    this is a map-side-heavy pipeline identical in shape to the
    postings build (SCALE.md 'Full-text search'). The token frame is
    CACHED so both granularity legs read one tokenization pass (the
    regex split is the scan-side CPU cost; uncached, each leg re-ran
    it over the whole corpus — the docs_contamination/_curation
    shared-token-frame pattern)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", ops.word_tokens(F.col("text")).alias("toks")
    ).cache()
    uni_counts = (
        toks.select("doc_id", F.explode("toks").alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    uni = uni_counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_uniq"),
        F.max("cnt").alias("top_cnt"),
    )
    # codegen bigram stream (slice + arrays_zip + explode — see
    # dedup.ops.shingle_stream) instead of a per-position interpreted
    # transform() lambda; ≥2-token docs have identical k=2 semantics
    bigrams = dd.shingle_stream(
        toks.filter(F.size("toks") >= 2),
        "text",
        "doc_id",
        k=2,
        tokens_col="toks",
    ).withColumnRenamed("shingle", "g")
    big = (
        bigrams.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top_bigram_cnt"), F.sum("cnt").alias("n_bigrams"))
    )
    # LEFT join: a 1-token doc has well-defined token signals and a
    # NULL bigram fraction — an inner join would silently drop it
    return (
        uni.join(big, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("n_uniq").cast("double") / F.col("n_tokens"), 4).alias(
                "uniq_ratio"
            ),
            F.round(F.col("top_cnt").cast("double") / F.col("n_tokens"), 4).alias(
                "top_token_frac"
            ),
            F.round(
                F.col("top_bigram_cnt").cast("double") / F.col("n_bigrams"), 4
            ).alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "docs_contamination",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS toks
      FROM documents
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
    rest AS (
      SELECT doc_id, len(shingles) AS n_shingles, unnest(shingles) AS s
      FROM sh WHERE source NOT IN ('src0', 'src1', 'src2')
    )
    SELECT doc_id,
           CAST(MAX(n_shingles) AS BIGINT)  AS n_shingles,
           CAST(COUNT(*) AS BIGINT)         AS n_hit,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(n_shingles), 4) AS contam_frac
    FROM rest JOIN bench USING (s)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def docs_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: 5-gram shingle overlap
    between candidate training documents and a held-out benchmark set
    (here: sources src0-src2 stand in for the eval corpus).

    Shape at scale: distinct benchmark shingles form a (relatively)
    small set — semi-joined against exploded candidate shingles, then
    one groupBy(doc). Shingles are xxhash64'd before the join (8-byte
    keys instead of ~30-byte strings; a deterministic-and-negligible
    collision risk trades for a 5× cheaper exchange) and the shingle
    arrays are computed ONCE and cached — both branches (benchmark
    set, candidate set) read the cached 1-row-per-doc frame, not the
    interpreted-HOF shingle pipeline twice. Measured 15.4 s → ~2 s at
    sf0.1. This is the standard decontamination pass every LLM data
    pipeline runs before training."""
    d = _t(spark, sf_dir, "documents")
    bench_src = ("src0", "src1", "src2")
    toks = d.select(
        "doc_id", "source", ops.word_tokens(F.col("text")).alias("toks")
    )
    sh = toks.select(
        "doc_id",
        "source",
        dd_shingles(F.col("toks"), 5).alias("shingles"),
    ).cache()
    bench = (
        sh.filter(F.col("source").isin(*bench_src))
        .select(F.explode("shingles").alias("s"))
        .select(F.xxhash64("s").alias("sh"))
        .distinct()
    )
    rest = (
        sh.filter(~F.col("source").isin(*bench_src))
        .select(
            "doc_id",
            F.size("shingles").alias("n_shingles"),
            F.explode("shingles").alias("s"),
        )
        .select("doc_id", "n_shingles", F.xxhash64("s").alias("sh"))
    )
    return (
        rest.join(bench, "sh")
        .groupBy("doc_id")
        .agg(
            F.max("n_shingles").alias("n_shingles"),
            F.count(F.lit(1)).alias("n_hit"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_hit",
            F.round(
                F.col("n_hit").cast("double") / F.col("n_shingles"), 4
            ).alias("contam_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "docs_token_budget",
    oracle="""
    WITH sized AS (
      SELECT lang, source,
             CAST(len(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'),
               t -> t <> '')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT)           AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT)      AS total_tokens,
           ROUND(quantile_cont(n_tokens, 0.5), 4)  AS p50_tokens,
           ROUND(quantile_cont(n_tokens, 0.95), 4) AS p95_tokens
    FROM sized
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def docs_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per (lang, source) stratum: doc count,
    total token budget, p50/p95 doc lengths — the numbers every
    training-mixture decision starts from. Exact interpolated
    percentiles (== DuckDB quantile_cont); at 100 TB swap for
    percentile_approx. One scan, one partial-agg shuffle."""
    d = _t(spark, sf_dir, "documents")
    sized = d.select(
        "lang",
        "source",
        F.size(ops.word_tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    return (
        sized.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            # one percentile buffer for both quantiles — two separate
            # percentile() calls would each sort the group's values
            F.round(
                F.expr("percentile(n_tokens, array(0.5, 0.95))")[0], 4
            ).alias("p50_tokens"),
            F.round(
                F.expr("percentile(n_tokens, array(0.5, 0.95))")[1], 4
            ).alias("p95_tokens"),
        )
        .orderBy("lang", "source")
    )


@query(
    "docs_unigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS tok
      FROM documents
    ),
    freq AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
    tot AS (SELECT SUM(cnt) AS total FROM freq)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT)                    AS n_tokens,
           ROUND(AVG(ln(cnt / total)), 4)              AS avg_logprob
    FROM tok JOIN freq USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def docs_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM fluency score: per-doc mean token log-probability
    under the corpus's own unigram distribution — the classic cheap
    proxy for perplexity-based quality filtering (docs far below the
    corpus mean are boilerplate/noise candidates; the real pipeline
    swaps in a trained LM, the plumbing is identical).

    Scale shape: vocabulary (token, count) is a partial-agg groupBy —
    vocabulary-sized, broadcast back onto the token stream; the corpus
    total is a 1-row broadcast scalar. Two scans of the token stream,
    no corpus-sized shuffle beyond the per-doc aggregate."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(ops.word_tokens(F.col("text"))).alias("tok")
    )
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    return (
        tok.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("cnt") / F.col("total"))), 4
            ).alias("avg_logprob"),
        )
    )


@query(
    "docs_tfidf_similar_pairs",
    oracle="""
    WITH docs AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS toks
      FROM documents WHERE doc_id % 5 = 0
    ),
    n AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM docs),
    tf AS (
      SELECT doc_id, t.term, COUNT(*)::DOUBLE AS tf
      FROM docs, UNNEST(toks) AS t(term) GROUP BY 1, 2
    ),
    df AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY 1),
    w AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * LN((SELECT n_docs FROM n) / df.df) AS w
      FROM tf JOIN df USING (term)
      WHERE df.df <= LEAST(0.2 * (SELECT n_docs FROM n), 1000.0)
    ),
    norms AS (SELECT doc_id, SQRT(SUM(w*w)) AS nrm FROM w GROUP BY 1),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.w * b.w) AS dot
      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, ROUND(dot / (na.nrm * nb.nrm), 4) AS cosine
    FROM dots
    JOIN norms na ON na.doc_id = doc_a
    JOIN norms nb ON nb.doc_id = doc_b
    WHERE ROUND(dot / (na.nrm * nb.nrm), 4) >= 0.35
    """,
)
def docs_tfidf_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse lexical similarity: TF-IDF cosine over an inverted-index
    (posting-list) self-join, with document-frequency pruning.

    The scale lever is the df cap: terms in more than 20% of documents
    contribute near-zero IDF weight but quadratic join fan-out, so they
    are dropped before the self-join. The cap is min(0.2*n, 1000):
    the RELATIVE leg keeps the oracle discriminating at tiny SFs
    (where 1000 never binds), and the ABSOLUTE leg is what survives
    scale — per-term fan-out is df^2, so a term at 20% of a 10^9-doc
    corpus would alone emit 4*10^16 pairs, while df<=1000 bounds any
    term at 10^6 partials regardless of corpus size (measured: the
    relative-only cap scaled 112x for 10x docs at sf1; with the
    absolute cap the join is linear in the number of capped terms).
    Weights shuffle O(postings); no all-pairs stage exists.
    Cosine sums are rounded on both engines; the threshold is applied
    to the rounded value so pair membership can't flap on float noise.
    """
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    toks = d.select("doc_id", ops.word_tokens(F.col("text")).alias("toks"))
    tf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    n = toks.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    w = (
        tf.join(dft, "term")
        .crossJoin(F.broadcast(n))
        .filter(F.col("df") <= F.least(0.2 * F.col("n_docs"), F.lit(1000.0)))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("w"),
        )
        .persist()
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    na = norms.select(
        F.col("doc_id").alias("doc_a"), F.col("nrm").alias("nrm_a")
    )
    nb = norms.select(
        F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nrm_b")
    )
    cos = F.round(F.col("dot") / (F.col("nrm_a") * F.col("nrm_b")), 4)
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(cos >= 0.35)
        .select("doc_a", "doc_b", cos.alias("cosine"))
    )


@query(
    "docs_bpe_merge_candidates",
    oracle="""
    WITH toks AS (
      SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS t
      FROM documents
    ),
    pairs AS (
      SELECT p.pair FROM toks,
        UNNEST(list_transform(range(1, len(t)),
                              i -> t[i] || ' ' || t[i+1])) AS p(pair)
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair
    LIMIT 30
    """,
)
def docs_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first step of BPE/WordPiece tokenizer training: corpus-wide
    adjacent-pair frequencies, top-30 merge candidates.

    Pair generation is the codegen shingle stream (k=2 — slice +
    arrays_zip + explode, no interpreted lambda; see
    dedup.ops.shingle_stream) with multiplicity preserved; counting
    is one partial-agg shuffle over the pair space and the top-30 is
    TakeOrderedAndProject. A full BPE trainer iterates this with the
    chosen merge applied — each round is this same query shape.
    """
    d = _t(spark, sf_dir, "documents")
    pairs = dd.shingle_stream(d, "text", "doc_id", k=2)
    return (
        pairs.groupBy(F.col("shingle").alias("pair"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(30)
    )


@query(
    "docs_char_entropy",
    oracle="""
    WITH ch AS (
      SELECT doc_id,
             list_filter(
               list_transform(range(length(lower(text))),
                              i -> substr(lower(text), i + 1, 1)),
               x -> x <> '') AS cs
      FROM documents
    ),
    hist AS (
      SELECT doc_id, cs,
             list_sort(list_distinct(cs)) AS ds,
             len(cs) AS n
      FROM ch WHERE len(cs) > 0
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_chars_counted,
           CAST(len(ds) AS INTEGER) AS n_distinct_chars,
           ROUND(-list_sum(list_transform(ds, c ->
               (CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE) / n)
               * ln(CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE) / n)
               / ln(2.0))), 4) + 0.0 AS char_entropy_bits
    FROM hist
    """,
)
def docs_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon character entropy per document — the classic gibberish /
    boilerplate / encoding-noise quality signal (low entropy = repeated
    chars, high = random bytes). Pure codegen expressions: char
    histogram via sorted-distinct transform + counted filter, entropy
    as a deterministic left fold over the sorted alphabet — the SAME
    fold order DuckDB's list_transform/list_sum uses, so the doubles
    agree bit-for-bit before the final round. Map-only (no shuffle);
    the O(distinct-chars x len) count is fine for document-sized text
    (alphabet ~40); megabyte blobs would swap in the mapInPandas
    histogram kernel without changing the plan shape."""
    d = _t(spark, sf_dir, "documents")
    cs = F.expr("filter(split(lower(text), ''), x -> x <> '')")
    # explode -> partial-agg groupBy keeps the histogram in whole-stage
    # codegen; the per-distinct-char list_filter rescan (O(distinct x
    # len) interpreted lambda work) measured 94s for 50k sf1 docs vs
    # ~3s for this shape. The entropy fold runs over
    # sort_array(collect_list(struct(char, cnt))) — ascending char,
    # the SAME order as the oracle's fold over sorted-distinct ds, so
    # the doubles agree bit-for-bit before the final round.
    chars = d.select("doc_id", F.explode(cs).alias("c"))
    hist = chars.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = hist.groupBy("doc_id").agg(
        F.sum("cnt").alias("n"),
        F.sort_array(F.collect_list(F.struct("c", "cnt"))).alias("h"),
    )
    ent = F.expr(
        "-aggregate(h, cast(0.0 as double), (acc, x) -> acc + "
        "(cast(x.cnt as double) / n) * ln(cast(x.cnt as double) / n)"
        " / ln(2.0))"
    )
    return per_doc.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_chars_counted"),
        F.size("h").cast("int").alias("n_distinct_chars"),
        # + 0.0 canonicalizes -0.0 (single-distinct-char doc: -(1*ln 1)
        # = -0.0, which DuckDB keeps and Spark's ROUND also keeps —
        # repo-wide convention, see queries.py zscore/cov/delta)
        (F.round(ent, 4) + F.lit(0.0)).alias("char_entropy_bits"),
    )


@query(
    "docs_pii_scan",
    oracle="""
    WITH withpii AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 7 = 0
                  THEN ' contact user' || doc_id || '@example.com' ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                  THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END
             || CASE WHEN doc_id % 13 = 0
                  THEN ' host 10.0.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
                  ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '[a-z0-9]+@[a-z0-9.]+\\.[a-z]+')) AS INT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '[0-9]{3}-[0-9]{4}')) AS INT)
             AS n_phones,
           CAST(len(regexp_extract_all(t, '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+')) AS INT)
             AS n_ips,
           CAST(length(
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, '[a-z0-9]+@[a-z0-9.]+\\.[a-z]+', '<EMAIL>', 'g'),
                 '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
               '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+', '<IP>', 'g')
           ) AS BIGINT) AS clean_len
    FROM withpii
    WHERE doc_id % 7 = 0 OR doc_id % 11 = 0 OR doc_id % 13 = 0
    """,
)
def docs_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction accounting — the scrub pass every
    training-data pipeline runs before anything else. The fixture
    corpus carries no real PII, so deterministic doc_id-derived PII is
    injected first (the decode-oracle pattern: synthesize worker-side,
    predict in SQL), then detected with dialect-portable character-class
    regexes (no \\d/\\b — identical semantics in Java regex and RE2)
    and redacted; `clean_len` proves the replacement ran, not just the
    count. Pure codegen (regexp_count/regexp_replace JVM-side), map-only,
    no shuffle; at 100 TB this is a scan-speed pass."""
    email = r"[a-z0-9]+@[a-z0-9.]+\.[a-z]+"
    phone = r"[0-9]{3}-[0-9]{4}"
    ip = r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+"
    d = _t(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(
                F.lit(" host 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit("."),
                ((F.col("doc_id") * 7) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), email, "<EMAIL>"),
            phone,
            "<PHONE>",
        ),
        ip,
        "<IP>",
    )
    return (
        d.filter(
            (F.col("doc_id") % 7 == 0)
            | (F.col("doc_id") % 11 == 0)
            | (F.col("doc_id") % 13 == 0)
        )
        .select("doc_id", t.alias("t"))
        .select(
            "doc_id",
            F.regexp_count(F.col("t"), F.lit(email)).alias("n_emails"),
            F.regexp_count(F.col("t"), F.lit(phone)).alias("n_phones"),
            F.regexp_count(F.col("t"), F.lit(ip)).alias("n_ips"),
            F.length(clean).cast("bigint").alias("clean_len"),
        )
    )


@query(
    "docs_ngram_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    ex AS (
      SELECT doc_id, unnest(
             list_distinct(CASE WHEN len(toks) < 3
               THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(1, len(toks) - 1),
                      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
             END)) AS shingle
      FROM toks
    ),
    first AS (
      SELECT shingle, MIN(doc_id) AS first_doc FROM ex GROUP BY shingle
    )
    SELECT e.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           ROUND(SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 4) AS novelty
    FROM ex e JOIN first f USING (shingle)
    GROUP BY e.doc_id
    """,
)
def docs_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty contribution per document: the fraction of a doc's
    distinct 3-gram shingles whose FIRST corpus occurrence (by doc_id
    order — ingest order in an append-only corpus) is this doc. The
    data-curation signal behind 'does this source add anything new':
    near-zero novelty marks recycled/boilerplate content even when no
    single pair crosses a dedup threshold.

    Two partial-agg shuffles, both scale-safe: MIN(doc_id) per shingle
    combines map-side (the hot-shingle posting collapses to one row
    per partition before the exchange — no df cap needed, unlike the
    containment join), then one join keyed by shingle back to the
    exploded stream and a per-doc rollup."""
    d = _t_compute(spark, sf_dir, "documents")
    ex = dd.distinct_shingle_stream(d, "text", "doc_id", 3)
    first = ex.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        ex.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            novel.cast("bigint").alias("n_novel"),
            F.round(novel / F.count(F.lit(1)), 4).alias("novelty"),
        )
    )


@query(
    "docs_bigram_surprisal",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS w
      FROM documents
    ),
    bigs AS (
      SELECT doc_id,
             unnest(list_transform(
               list_zip(w[1:length(w)-1], w[2:length(w)]),
               p -> p[1] || ' ' || p[2])) AS big
      FROM tok WHERE length(w) >= 2
    ),
    fb AS (SELECT big, COUNT(*) AS cnt_b FROM bigs GROUP BY big),
    fc AS (SELECT split_part(big, ' ', 1) AS w1, SUM(cnt_b) AS cnt_c
           FROM fb GROUP BY 1)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT)             AS n_bigrams,
           ROUND(AVG(ln(cnt_b / cnt_c)), 4)     AS avg_logprob
    FROM bigs
    JOIN fb USING (big)
    JOIN fc ON split_part(big, ' ', 1) = fc.w1
    GROUP BY doc_id
    """,
)
def docs_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM fluency: per-doc mean log P(w2|w1) under the corpus's
    own bigram distribution — one model order above
    `docs_unigram_logprob`, and the shape every KenLM-style perplexity
    filter reduces to (count table + conditional probability + per-doc
    mean). Docs with <2 tokens have no bigrams and drop out on both
    engines.

    Scale shape: bigrams come from zip_with over two slices of the
    token array (codegen, no positional self-join); the bigram count
    table is a partial-agg groupBy. Unlike the unigram vocabulary the
    bigram table is NOT broadcast — it grows with corpus diversity, so
    the stream↔counts join stays a shuffle equi-join for AQE to plan
    (it broadcasts it anyway while the table is small). The context
    (w1) counts are derived from the bigram table itself — unigram-
    vocabulary-sized, safe to broadcast."""
    d = _t_compute(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", ops.word_tokens(F.col("text")).alias("w")
    ).filter(F.size("w") >= 2)
    bigs = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(w, 1, size(w)-1), slice(w, 2, size(w)-1),"
                " (a, b) -> concat(a, ' ', b))"
            )
        ).alias("big"),
        # referenced 3x (fb build, fc via fb, join probe) with no
        # common-subtree reuse in the plan — unpersisted, the regex
        # tokenization + bigram explode ran THREE times per query
        # (r13, guide §5: reused AND expensive; the same pattern as
        # docs_contamination / docs_repetition_signals). Query-scoped:
        # the registry wrapper clears caches between queries.
    ).persist()
    fb = bigs.groupBy("big").agg(F.count(F.lit(1)).alias("cnt_b"))
    fc = (
        fb.select(F.expr("split_part(big, ' ', 1)").alias("w1"), "cnt_b")
        .groupBy("w1")
        .agg(F.sum("cnt_b").alias("cnt_c"))
    )
    return (
        bigs.join(fb, "big")
        .withColumn("w1", F.expr("split_part(big, ' ', 1)"))
        .join(F.broadcast(fc), "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(F.log(F.col("cnt_b") / F.col("cnt_c"))), 4
            ).alias("avg_logprob"),
        )
    )


@query(
    "docs_quality_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS t
      FROM documents
    ),
    f AS (
      SELECT doc_id,
             COUNT(*)                                            AS n_tokens,
             SUM(length(t))                                      AS sum_len,
             SUM(CASE WHEN t IN ({_STOPLIST_SQL}) THEN 1 ELSE 0 END) AS n_stop,
             SUM(CASE WHEN regexp_matches(t, '^[0-9]+$') THEN 1 ELSE 0 END)
                                                                 AS n_num
      FROM tok GROUP BY doc_id
    )
    SELECT doc_id,
           ROUND(1.0 / (1.0 + exp(-(
             -3.0
             + 0.35 * ln(1.0 + n_tokens)
             + 0.25 * (sum_len * 1.0 / n_tokens)
             + 6.0  * (n_stop * 1.0 / n_tokens)
             - 2.5  * (n_num * 1.0 / n_tokens)))), 4) AS quality_score,
           ROUND(1.0 / (1.0 + exp(-(
             -3.0
             + 0.35 * ln(1.0 + n_tokens)
             + 0.25 * (sum_len * 1.0 / n_tokens)
             + 6.0  * (n_stop * 1.0 / n_tokens)
             - 2.5  * (n_num * 1.0 / n_tokens)))), 4) >= 0.5 AS is_quality
    FROM f
    """,
)
def docs_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring: a fixed-weight logistic model
    (fasttext-classifier stand-in) scored as a pure codegen
    expression — the inference pass of a learned quality filter,
    with features (log length, mean token length, stopword ratio,
    numeric-token ratio) computed in ONE explode/partial-agg pass
    over the token stream (same one-pass shape docs_quality_filter
    uses). The decision bit thresholds the ROUNDED score so both
    engines take the identical branch. A real pipeline swaps the
    literal weights for a trained model's — the plan is unchanged,
    and at 100 TB it stays one scan + one O(docs) partial-agg
    shuffle, nothing model-sized to ship."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(ops.word_tokens(F.col("text"))).alias("t")
    )
    f = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.length("t")).alias("sum_len"),
        F.count(F.when(F.col("t").isin(*ENGLISH_STOPWORDS), 1)).alias("n_stop"),
        F.count(F.when(F.col("t").rlike("^[0-9]+$"), 1)).alias("n_num"),
    )
    z = (
        F.lit(-3.0)
        + 0.35 * F.log(1.0 + F.col("n_tokens"))
        + 0.25 * (F.col("sum_len") * 1.0 / F.col("n_tokens"))
        + 6.0 * (F.col("n_stop") * 1.0 / F.col("n_tokens"))
        - 2.5 * (F.col("n_num") * 1.0 / F.col("n_tokens"))
    )
    score = F.round(1.0 / (1.0 + F.exp(-z)), 4)
    return f.select(
        "doc_id",
        score.alias("quality_score"),
        (score >= 0.5).alias("is_quality"),
    )


@query(
    "docs_perplexity_buckets",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS tok
      FROM documents
    ),
    freq AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
    tot AS (SELECT SUM(cnt) AS total FROM freq),
    lp AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT)       AS n_tokens,
             ROUND(AVG(ln(cnt / total)), 4) AS lp4
      FROM tok JOIN freq USING (tok) CROSS JOIN tot
      GROUP BY doc_id
    ),
    b AS (
      SELECT n_tokens, lp4,
             NTILE(3) OVER (ORDER BY lp4, doc_id) AS t
      FROM lp
    )
    SELECT CASE t WHEN 3 THEN 'head' WHEN 2 THEN 'middle'
                  ELSE 'tail' END          AS bucket,
           CAST(COUNT(*) AS BIGINT)        AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT)   AS total_tokens,
           ROUND(AVG(lp4), 4)              AS avg_logprob
    FROM b
    GROUP BY 1
    ORDER BY 1
    """,
)
def docs_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus bucketing: tercile every document on its
    unigram-LM fluency score into head / middle / tail (head = most
    fluent, the slice CCNet keeps preferentially; tail = the
    perplexity outliers a mixture down-weights) — the standard
    quality-stratification step between LM scoring and mixture
    sampling (Wenzek et al. 2020, public method).

    The tercile ranks on the ROUNDED 4dp score with a doc_id
    tiebreak: the rounded value is the cross-engine-stable quantity
    (raw double means differ in the last ulp between engines, which
    could flip a boundary assignment), and the ranking itself is the
    distributed exact-NTILE operator — no single-partition window, so
    the stratification scales with the corpus."""
    from metastore_spark.operators.ranking import global_rank, ntile_from_rank

    d = _t_compute(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(ops.word_tokens(F.col("text"))).alias("tok")
    )
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    lp = (
        tok.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("cnt") / F.col("total"))), 4
            ).alias("lp4"),
        )
    )
    ranked = global_rank(lp, ["lp4", "doc_id"], "rnk")
    n = ranked.count()  # materialized by global_rank — reads the checkpoint
    tercile = ntile_from_rank(F.col("rnk"), n, 3)
    bucket = (
        F.when(tercile == 3, "head")
        .when(tercile == 2, "middle")
        .otherwise("tail")
    )
    return (
        ranked.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("lp4"), 4).alias("avg_logprob"),
        )
        .orderBy("bucket")
    )


@query(
    "docs_corpus_datasheet",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, lang,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    fc AS (SELECT fp, COUNT(*) AS c FROM base GROUP BY fp),
    feat AS (
      SELECT b.doc_id, b.source, b.lang,
             len(b.toks) AS n_tokens,
             ROUND(len(list_filter(b.toks, t -> t IN ({_STOPLIST_SQL})))
                   * 1.0 / len(b.toks), 4) AS stop_ratio,
             (fc.c > 1) AS is_dup
      FROM base b JOIN fc ON b.fp = fc.fp
      WHERE len(b.toks) > 0
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)                       AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT)                  AS total_tokens,
           ROUND(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 4)                     AS pct_en,
           ROUND(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 4)                     AS dup_rate,
           ROUND(AVG(stop_ratio), 4)                      AS mean_stop_ratio
    FROM feat
    GROUP BY source
    ORDER BY source
    """,
)
def docs_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus datasheet: the per-source summary a data card publishes
    — volume (docs, tokens), language share, exact-duplicate rate
    (global fingerprint collisions attributed per source), and the
    stopword-ratio fluency proxy — composed from the engine's own
    fingerprint/tokenizer primitives in three light scans (metadata +
    fingerprint counts + one explode token pass) and O(docs)
    partial-agg shuffles. The per-source rollup is the number a mixture designer
    reads before weighting sources; every column is value-hash
    oracled."""
    d = _t(spark, sf_dir, "documents")
    # token stats in ONE explode/partial-agg pass (InSet probe, whole-
    # stage codegen) — a filter() HOF lambda here would re-run an
    # interpreted isin per token (the docs_quality_filter lesson)
    tokstats = (
        d.select(
            "doc_id", F.explode(ops.word_tokens(F.col("text"))).alias("t")
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(
                F.when(F.col("t").isin(*ENGLISH_STOPWORDS), 1)
            ).alias("n_stop"),
        )
    )
    base = d.select(
        "doc_id", "source", "lang", ops.fingerprint(F.col("text")).alias("fp")
    )
    fc = (
        d.select(ops.fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    feat = base.join(fc, "fp").join(tokstats, "doc_id").select(
        "source",
        "lang",
        "n_tokens",
        F.round(
            F.col("n_stop") * 1.0 / F.col("n_tokens"), 4
        ).alias("stop_ratio"),
        (F.col("c") > 1).alias("is_dup"),
    )
    return (
        feat.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
                * 1.0
                / F.count(F.lit(1)),
                4,
            ).alias("pct_en"),
            F.round(
                F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
                * 1.0
                / F.count(F.lit(1)),
                4,
            ).alias("dup_rate"),
            F.round(F.avg("stop_ratio"), 4).alias("mean_stop_ratio"),
        )
        .orderBy("source")
    )


_BPE_MERGE_CTES = """
    words AS (
      SELECT t.word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (
        SELECT unnest(list_filter(
                 string_split_regex(lower(text), '[^a-z0-9]+'),
                 w -> w <> '')) AS word
        FROM documents
      ) t GROUP BY 1
    ),
    rep0 AS (
      SELECT '|' || array_to_string(
               list_transform(range(length(word)),
                              i -> substr(word, i + 1, 1)), '|') AS r,
             freq
      FROM words
    ),
    s1 AS (
      SELECT list_filter(string_split(r, '|'), x -> x <> '') AS s, freq
      FROM rep0
    ),
    p1 AS (
      SELECT p.pair, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM s1, UNNEST(list_transform(range(1, len(s)),
                                     i -> s[i] || ' ' || s[i+1])) AS p(pair)
      GROUP BY 1
    ),
    b1 AS (SELECT pair, cnt FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
    rep1 AS (
      SELECT replace(r,
               '|' || replace((SELECT pair FROM b1), ' ', '|'),
               '|' || replace((SELECT pair FROM b1), ' ', '')) AS r,
             freq
      FROM rep0
    ),
    s2 AS (
      SELECT list_filter(string_split(r, '|'), x -> x <> '') AS s, freq
      FROM rep1
    ),
    p2 AS (
      SELECT p.pair, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM s2, UNNEST(list_transform(range(1, len(s)),
                                     i -> s[i] || ' ' || s[i+1])) AS p(pair)
      GROUP BY 1
    ),
    b2 AS (SELECT pair, cnt FROM p2 ORDER BY cnt DESC, pair LIMIT 1)
"""

_BPE_TRAINER_ORACLE = f"""
    WITH {_BPE_MERGE_CTES.strip()}
    SELECT 1 AS round, pair AS merge_pair, cnt FROM b1
    UNION ALL
    SELECT 2 AS round, pair AS merge_pair, cnt FROM b2
    ORDER BY round
    """


@query("docs_bpe_trainer", oracle=_BPE_TRAINER_ORACLE)
def docs_bpe_trainer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, two merge rounds unrolled: word-frequency
    table → character symbols → corpus-weighted adjacent-pair counts →
    argmax merge (ties to the lexicographically smallest pair on both
    engines) → greedy non-overlapping merge application → recount →
    second merge. The iterative-algorithm showcase for text, like
    `emb_kmeans_quantized` is for vectors: each round's chosen merge
    is a driver-side SCALAR (the kmeans-centroid pattern — a
    parameter, not a data loop), and the oracle reproduces both
    rounds with scalar subqueries.

    Merge application is `replace` on a '|'-delimited symbol string
    ('|a|b' → '|ab'): the leading-delimiter encoding makes adjacent
    matches non-overlapping ('|a|a|a|a' + merge(a,a) → '|aa|aa' on
    BOTH engines — verified identical greedy left-to-right
    semantics), which IS standard BPE merge application.

    Scale shape: training runs on the DISTINCT-WORD table (freq-
    weighted), not the corpus — the one corpus scan aggregates to
    vocab size, and each round is then O(vocab × word-length): one
    partial-agg shuffle + a 1-row argmax (TakeOrderedAndProject).
    A production trainer runs ~30k rounds of exactly this step with
    the word table cached; per-round cost is independent of corpus
    row count, which is why BPE training is tractable at 100 TB."""
    merges = _learn_bpe_merges(spark, sf_dir)
    return spark.createDataFrame(
        [(i + 1, p, c) for i, (p, c) in enumerate(merges)],
        "round int, merge_pair string, cnt bigint",
    )


def _learn_bpe_merges(
    spark: SparkSession, sf_dir: str, rounds: int = 2
) -> list[tuple[str, int]]:
    """Run ``rounds`` BPE merge rounds on the freq-weighted distinct-
    word table; returns [(pair, corpus_count), ...] in merge order.
    Each round is one partial-agg shuffle + a 1-row argmax; the chosen
    merge folds back in as a literal (driver-side scalar parameter)."""
    d = _t(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(ops.word_tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    chars = F.array_remove(F.split(F.col("word"), ""), "")
    rep = words.select(
        F.concat(F.lit("|"), F.array_join(chars, "|")).alias("r"), "freq"
    ).persist()

    def pair_counts(rep_df):
        s = F.array_remove(F.split(F.col("r"), r"\|"), "")
        pairs = F.expr(
            "transform(sequence(1, size(s) - 1),"
            " i -> concat(element_at(s, i), ' ', element_at(s, i + 1)))"
        )
        return (
            rep_df.select(s.alias("s"), "freq")
            .filter(F.size("s") >= 2)
            .select(F.explode(pairs).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
        )

    merges: list[tuple[str, int]] = []
    cur = rep
    for _ in range(rounds):
        row = pair_counts(cur).orderBy(F.desc("cnt"), F.asc("pair")).first()
        pair, cnt = row["pair"], int(row["cnt"])
        merges.append((pair, cnt))
        a, b = pair.split(" ")
        cur = cur.select(
            F.replace(
                F.col("r"), F.lit(f"|{a}|{b}"), F.lit(f"|{a}{b}")
            ).alias("r"),
            "freq",
        )
    return merges


_BPE_ENCODE_ORACLE = f"""
    WITH {_BPE_MERGE_CTES.strip()},
    dw AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         w -> w <> '') AS ws
      FROM documents
    ),
    dr AS (
      SELECT doc_id,
             CAST(length(array_to_string(ws, '')) AS BIGINT) AS n_chars,
             array_to_string(
               list_transform(ws, w ->
                 '|' || array_to_string(
                   list_transform(range(length(w)),
                                  i -> substr(w, i + 1, 1)), '|')),
               '|') AS r0
      FROM dw
    ),
    a1 AS (
      SELECT doc_id, n_chars,
             CAST(length(r0) - length(r1) AS BIGINT) AS applied1, r1
      FROM (
        SELECT doc_id, n_chars, r0,
               replace(r0,
                 '|' || replace((SELECT pair FROM b1), ' ', '|'),
                 '|' || replace((SELECT pair FROM b1), ' ', '')) AS r1
        FROM dr
      )
    ),
    a2 AS (
      SELECT doc_id, n_chars, applied1,
             CAST(length(r1) - length(r2) AS BIGINT) AS applied2
      FROM (
        SELECT doc_id, n_chars, applied1, r1,
               replace(r1,
                 '|' || replace((SELECT pair FROM b2), ' ', '|'),
                 '|' || replace((SELECT pair FROM b2), ' ', '')) AS r2
        FROM a1
      )
    )
    SELECT doc_id, n_chars,
           applied1 + applied2            AS n_merged,
           n_chars - applied1 - applied2  AS n_bpe_tokens
    FROM a2
    """


@query("docs_bpe_encode", oracle=_BPE_ENCODE_ORACLE)
def docs_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE: apply the merges `docs_bpe_trainer` learned back to
    every document and count the resulting tokens — the train→encode
    loop of a real tokenizer, with the token counts value-hash-oracled
    per document (the oracle re-learns the same merges via scalar
    subqueries, then re-applies them per doc).

    Encoding is pure codegen string arithmetic: each doc becomes a
    '|'-delimited symbol string with '||' word boundaries (a merge
    pattern '|a|b' cannot match across words), each merge is one
    `replace`, and since every application removes exactly one
    delimiter, tokens = chars − (length drop across replaces) — no
    arrays, no explode, no shuffle. The merge table arrives as
    LITERALS (driver-side scalars from the training argmax, the
    kmeans-centroid pattern), so the encode pass is map-only: at
    100 TB it pipelines at scan speed, which is why BPE encoding
    parallelizes perfectly. A production encoder folds ~30k merges
    into a trie instead of chained replaces; two rounds keep the
    oracle exactly mirrorable."""
    merges = _learn_bpe_merges(spark, sf_dir)
    d = _t(spark, sf_dir, "documents")
    toks = ops.word_tokens(F.col("text"))
    per_word = F.transform(
        toks,
        lambda t: F.concat(
            F.lit("|"),
            F.array_join(F.array_remove(F.split(t, ""), ""), "|"),
        ),
    )
    base = d.select(
        "doc_id",
        F.length(F.array_join(toks, "")).cast("bigint").alias("n_chars"),
        F.array_join(per_word, "|").alias("r"),
    )
    applied = []
    r = F.col("r")
    for pair, _cnt in merges:
        a, b = pair.split(" ")
        nxt = F.replace(r, F.lit(f"|{a}|{b}"), F.lit(f"|{a}{b}"))
        applied.append((F.length(r) - F.length(nxt)).cast("bigint"))
        r = nxt
    n_merged = applied[0]
    for extra in applied[1:]:
        n_merged = n_merged + extra
    return base.select(
        "doc_id",
        "n_chars",
        n_merged.alias("n_merged"),
        (F.col("n_chars") - n_merged).alias("n_bpe_tokens"),
    )


def _winnowing_oracle(k: int = 8, w: int = 4) -> str:
    from metastore_spark.queries_dedup import _ph60

    mod = 1 << 31
    return f"""
    WITH tk AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    hs AS (
      SELECT doc_id, len(toks) AS n,
             list_transform(toks, t -> {_ph60('t')} % {mod}) AS hv
      FROM tk
    ),
    gh AS (
      SELECT doc_id, n,
             CASE WHEN n >= {k}
               THEN list_transform(range(n - {k} + 1), g ->
                      list_reduce(hv[g+1:g+{k}],
                                  (a, h) -> (a * 1000003 + h) % {mod}))
               ELSE CAST([] AS BIGINT[]) END AS gh
      FROM hs
    ),
    sel AS (
      SELECT doc_id,
             CAST(len(gh) AS BIGINT) AS n_grams,
             CASE WHEN len(gh) = 0 THEN CAST([] AS BIGINT[])
                  WHEN len(gh) < {w} THEN [list_min(gh)]
                  ELSE list_distinct(list_transform(range(len(gh) - {w} + 1),
                         j -> list_min(gh[j+1:j+{w}])))
             END AS fps
      FROM gh
    )
    SELECT doc_id, n_grams,
           CAST(len(fps) AS BIGINT)                  AS n_fingerprints,
           CAST(COALESCE(list_sum(fps), 0) AS BIGINT) AS fp_checksum
    FROM sel
    """


@query("docs_winnowing_fingerprints", oracle=_winnowing_oracle())
def docs_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 —
    public algorithm): polynomial rolling hash over every 8-token gram,
    then the minimum of each 4-gram sliding window, deduplicated — the
    sparse deterministic fingerprint SET whose guarantee (any shared
    run of ≥ k+w−1 tokens shares ≥ 1 fingerprint) underlies
    plagiarism/attribution matching at a fraction of full-shingle
    cost. Per doc: gram count, selected-fingerprint count, and the
    exact integer checksum of the selected set, all value-hash-oracled
    — the hash chain (portable ph60 token hashes pre-reduced mod 2³¹,
    left-fold ×1000003) is mirrored step-for-step in DuckDB, so both
    engines select identical fingerprint VALUES (the min-of-window
    set is tie-rule-independent even though positions aren't).

    Scale shape: everything happens inside the row's own arrays,
    map-only except the scan — and the gram chain is built from K−1
    elementwise zip_with passes over SHIFTED arrays, not a per-gram
    aggregate-over-slice (the naive nested fold allocates a fresh
    K-slice per gram and ran 20 s at sf0.1; the shifted-zip form is
    the hash-chain analogue of dedup.ops.shingle_stream's lesson and
    runs in ~1 s for identical values). The winnowed set is ~2/(w+1)
    of gram count, and a downstream matcher joins on the sparse
    fingerprints instead of every shingle — same structure as
    `docs_shared_passages`, ~75% less join input at these
    parameters."""
    from metastore_spark.dedup.ops import portable_hash60

    K, W, MOD, BASE = 8, 4, 1 << 31, 1000003
    d = _t(spark, sf_dir, "documents")
    toks = ops.word_tokens(F.col("text"))
    n = F.size(toks)
    hv = F.transform(toks, lambda t: portable_hash60(t) % F.lit(MOD))

    def chain(arr, width, step):
        # left fold over `width` SHIFTED views: width-1 elementwise
        # zip_with passes, no per-position slicing
        g = F.greatest(F.size(arr) - F.lit(width - 1), F.lit(0))
        shifted = [F.slice(arr, j + 1, g) for j in range(width)]
        acc = shifted[0]
        for s in shifted[1:]:
            acc = F.zip_with(acc, s, step)
        return acc

    # materialize hv as a COLUMN before chaining: HOF expressions get
    # no common-subexpression elimination, so chaining over the raw
    # transform would re-run the per-token ph60 pass once per shifted
    # view (measured 4.3 s vs 0.5 s at sf0.1 — the same lesson
    # dedup.ops.shingle_stream documents for token arrays).
    #
    # Pin the kernel's parallelism (VERDICT r8 task 7): the corpus is
    # compute-bound (per-token hash chain + K+W-2 zip_with passes),
    # but a small parquet fixture scans as ONE partition — the whole
    # chain ran on one core, making the bench unit hostage to single-
    # core contention (the recurring noise WARN). Repartitioning the
    # (id, text)-sized input to the session's parallelism costs one
    # tiny exchange and bounds per-task work; at 100 TB the corpus is
    # many files and the scan is already parallel, so this is the
    # standard repartition-before-expensive-map, not a scale cost.
    par = spark.sparkContext.defaultParallelism
    hvdf = d.repartition(par).select(
        "doc_id", n.alias("n"), hv.alias("hv")
    )
    gram_chain = chain(
        F.col("hv"), K, lambda a, h: (a * BASE + h) % F.lit(MOD)
    )
    base = hvdf.select(
        "doc_id",
        F.when(F.col("n") >= K, gram_chain)
        .otherwise(F.array().cast("array<bigint>"))
        .alias("gh"),
    )
    m = F.size("gh")
    windowed = chain(F.col("gh"), W, lambda a, b: F.least(a, b))
    fps = (
        F.when(m == 0, F.array().cast("array<bigint>"))
        .when(m < W, F.array(F.array_min("gh")))
        .otherwise(F.array_distinct(windowed))
    )
    return base.select(
        "doc_id",
        m.cast("bigint").alias("n_grams"),
        F.size(fps).cast("bigint").alias("n_fingerprints"),
        F.aggregate(
            fps, F.lit(0).cast("bigint"), lambda a, h: a + h
        ).alias("fp_checksum"),
    )


_QT_FEAT_CTES = f"""
    qt_tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS t
      FROM documents
    ),
    qt_f AS (
      SELECT doc_id,
             COUNT(*)                                            AS n_tokens,
             SUM(length(t))                                      AS sum_len,
             SUM(CASE WHEN t IN ({_STOPLIST_SQL}) THEN 1 ELSE 0 END) AS n_stop,
             SUM(CASE WHEN regexp_matches(t, '^[0-9]+$') THEN 1 ELSE 0 END)
                                                                 AS n_num
      FROM qt_tok GROUP BY doc_id
    ),
    qt_feat AS (
      SELECT doc_id,
             (n_stop * 1000) // n_tokens AS stop_m,
             (sum_len * 1000) // n_tokens AS len_m,
             (n_num * 1000) // n_tokens AS num_m,
             CASE WHEN (n_stop * 1000) // n_tokens >= 150
                   AND (n_num * 1000) // n_tokens <= 200
                  THEN 1 ELSE 0 END AS y
      FROM qt_f
    )
"""

_QUALITY_TRAINED_ORACLE = f"""
    WITH {_QT_FEAT_CTES.strip()},
    g1 AS (
      SELECT CAST(COUNT(*) AS BIGINT)                  AS n,
             CAST(SUM((1 - 2*y) * 1000)   AS BIGINT)   AS g_b,
             CAST(SUM((1 - 2*y) * stop_m) AS BIGINT)   AS g_s,
             CAST(SUM((1 - 2*y) * len_m)  AS BIGINT)   AS g_l,
             CAST(SUM((1 - 2*y) * num_m)  AS BIGINT)   AS g_n
      FROM qt_feat
    ),
    w1 AS (
      SELECT n,
             -0.1 * g_b / (2.0 * n * 1000.0) AS w_b,
             -0.1 * g_s / (2.0 * n * 1000.0) AS w_s,
             -0.1 * g_l / (2.0 * n * 1000.0) AS w_l,
             -0.1 * g_n / (2.0 * n * 1000.0) AS w_n
      FROM g1
    ),
    p2 AS (
      SELECT qt_feat.*,
             CAST(round((round(1.0 / (1.0 + exp(-(
               (w_b * 1000 + w_s * stop_m + w_l * len_m + w_n * num_m)
               / 1000.0))), 6) - y) * 1000000) AS BIGINT) AS d
      FROM qt_feat, w1
    ),
    g2 AS (
      SELECT CAST(SUM(d * 1000)   AS BIGINT) AS g_b,
             CAST(SUM(d * stop_m) AS BIGINT) AS g_s,
             CAST(SUM(d * len_m)  AS BIGINT) AS g_l,
             CAST(SUM(d * num_m)  AS BIGINT) AS g_n
      FROM p2
    ),
    w2 AS (
      SELECT w1.n,
             w1.w_b - 0.1 * g2.g_b / (1000000.0 * n * 1000.0) AS w_b,
             w1.w_s - 0.1 * g2.g_s / (1000000.0 * n * 1000.0) AS w_s,
             w1.w_l - 0.1 * g2.g_l / (1000000.0 * n * 1000.0) AS w_l,
             w1.w_n - 0.1 * g2.g_n / (1000000.0 * n * 1000.0) AS w_n
      FROM w1, g2
    ),
    pred AS (
      SELECT CASE WHEN (w_b * 1000 + w_s * stop_m + w_l * len_m
                        + w_n * num_m) / 1000.0 >= 0.0
                  THEN 1 ELSE 0 END AS p,
             y
      FROM qt_feat, w2
    ),
    score AS (
      SELECT CAST(COUNT(*) AS BIGINT)                       AS n_docs,
             CAST(SUM(p) AS BIGINT)                         AS n_pred_quality,
             CAST(SUM(CASE WHEN p = y THEN 1 ELSE 0 END) AS BIGINT)
                                                            AS n_correct
      FROM pred
    )
    SELECT ROUND(w2.w_b, 6) AS w_bias,
           ROUND(w2.w_s, 6) AS w_stop,
           ROUND(w2.w_l, 6) AS w_len,
           ROUND(w2.w_n, 6) AS w_num,
           score.n_docs, score.n_pred_quality, score.n_correct
    FROM w2, score
    """


@query("docs_quality_trained", oracle=_QUALITY_TRAINED_ORACLE)
def docs_quality_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED quality classifier (VERDICT r9 task 6): two unrolled
    full-batch logistic-regression epochs learn the weights that
    `docs_quality_score` hard-codes, then inference runs through the
    LEARNED weights — the `docs_bpe_trainer`/`emb_kmeans_quantized`
    pattern applied to model fitting: per-epoch gradient = ONE
    partial-agg reduction to four BIGINT scalars, weight update = a
    driver-side scalar fold, every number cross-engine-exact by
    construction:

    - features are fixed-point INTEGERS (per-mille stopword ratio,
      mean token length, numeric ratio via integer division), labels
      a rule-based integer teacher;
    - epoch 1 starts at w=0 where sigma(0)=1/2 EXACTLY, so its
      gradient is a pure-integer sum (1-2y)*x;
    - epoch 2 rounds sigma to 6dp and quantizes each residual to an
      integer micro-unit before the BIGINT gradient sum, so float
      summation order can never split the engines;
    - the decision thresholds z >= 0 (no exp at inference).

    Output: the learned weights (6dp) + corpus prediction counts +
    training-label agreement. The oracle replays the identical two
    epochs in unrolled SQL CTEs.

    Scale shape: each epoch is one scan + one O(1)-row aggregate (4
    longs), weights ship driver-side as scalars — at 100 TB an epoch
    is exactly the cost of a count(*), and nothing model-sized ever
    shuffles. Reference anchor: the trainable twin of the fasttext
    quality filter stand-in (`docs_quality_score`)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(ops.word_tokens(F.col("text"))).alias("t")
    )
    f = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.length("t")).alias("sum_len"),
        F.count(F.when(F.col("t").isin(*ENGLISH_STOPWORDS), 1)).alias(
            "n_stop"
        ),
        F.count(F.when(F.col("t").rlike("^[0-9]+$"), 1)).alias("n_num"),
    )
    stop_m = F.expr("(n_stop * 1000) div n_tokens")
    len_m = F.expr("(sum_len * 1000) div n_tokens")
    num_m = F.expr("(n_num * 1000) div n_tokens")
    feat = f.select(
        stop_m.alias("stop_m"),
        len_m.alias("len_m"),
        num_m.alias("num_m"),
        F.when((stop_m >= 150) & (num_m <= 200), 1)
        .otherwise(0)
        .alias("y"),
    ).persist()

    # epoch 1: w = 0 -> sigma = 1/2 exactly; gradient is integer
    r = feat.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((1 - 2 * F.col("y")) * 1000).cast("long").alias("g_b"),
        F.sum((1 - 2 * F.col("y")) * F.col("stop_m")).cast("long").alias("g_s"),
        F.sum((1 - 2 * F.col("y")) * F.col("len_m")).cast("long").alias("g_l"),
        F.sum((1 - 2 * F.col("y")) * F.col("num_m")).cast("long").alias("g_n"),
    ).first()
    n = r["n"]
    # same literal expression shape as the oracle's w1 CTE
    w = {
        k: -0.1 * r[g] / (2.0 * n * 1000.0)
        for k, g in (("b", "g_b"), ("s", "g_s"), ("l", "g_l"), ("n", "g_n"))
    }

    def z_of(wts):
        return (
            F.lit(wts["b"]) * 1000
            + F.lit(wts["s"]) * F.col("stop_m")
            + F.lit(wts["l"]) * F.col("len_m")
            + F.lit(wts["n"]) * F.col("num_m")
        ) / 1000.0

    # epoch 2: sigma rounded to 6dp, residual quantized to BIGINT
    dcol = F.round(
        (F.round(1.0 / (1.0 + F.exp(-z_of(w))), 6) - F.col("y"))
        * 1000000,
        0,
    ).cast("long")
    r2 = feat.select(dcol.alias("d"), "stop_m", "len_m", "num_m").agg(
        F.sum(F.col("d") * 1000).cast("long").alias("g_b"),
        F.sum(F.col("d") * F.col("stop_m")).cast("long").alias("g_s"),
        F.sum(F.col("d") * F.col("len_m")).cast("long").alias("g_l"),
        F.sum(F.col("d") * F.col("num_m")).cast("long").alias("g_n"),
    ).first()
    w2 = {
        k: w[k] - 0.1 * r2[g] / (1000000.0 * n * 1000.0)
        for k, g in (("b", "g_b"), ("s", "g_s"), ("l", "g_l"), ("n", "g_n"))
    }

    # inference through the LEARNED weights: threshold z >= 0 (exact)
    pred = feat.select(
        F.when(z_of(w2) >= 0.0, 1).otherwise(0).alias("p"), "y"
    )
    out = pred.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("p").cast("long").alias("n_pred_quality"),
        F.sum(F.when(F.col("p") == F.col("y"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
    ).select(
        F.round(F.lit(w2["b"]), 6).alias("w_bias"),
        F.round(F.lit(w2["s"]), 6).alias("w_stop"),
        F.round(F.lit(w2["l"]), 6).alias("w_len"),
        F.round(F.lit(w2["n"]), 6).alias("w_num"),
        "n_docs",
        "n_pred_quality",
        "n_correct",
    )
    feat.unpersist()
    return out
