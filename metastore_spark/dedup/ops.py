"""Deduplication operators for training-data pipelines.

Five tiers, all shuffle-architected for 100 TB:

- exact        : fingerprint → groupBy(min id). One shuffle on the
                 16-byte hash, partial aggregation map-side.
- minhash LSH  : shingle → minhash signature (JVM-side higher-order
                 exprs, no UDF) → band → bucket join. Candidate pairs
                 only ever materialize within a bucket, so the join is
                 an equi-join on (band, bandhash) — never O(n²).
- simhash      : 63-bit rotation-invariant signature, hamming ≤ k via
                 bit_count(xor). Buckets by signature prefix for scale.
- ngram jaccard: blocked exact verification (array_intersect /
                 array_union on distinct n-gram sets).
- embedding    : cosine near-dup, see metastore_spark.similarity.

MinHash per Broder 1997 ("On the resemblance and containment of
documents"); banding analysis per Leskovec/Rajaraman/Ullman, "Mining
of Massive Datasets" ch.3 — public algorithms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metastore_spark.text.ops import fingerprint, word_tokens

def _splitmix(x: int) -> int:
    """SplitMix64 finalizer (Steele et al. 2014) — deterministic
    constant generator for the minhash affine family."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    z = z ^ (z >> 31)
    return z


def _to_i64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def _mix_a(i: int) -> int:
    return _to_i64(_splitmix(2 * i) | 1)  # odd → bijective multiplier


def _mix_b(i: int) -> int:
    return _to_i64(_splitmix(2 * i + 1))


def portable_hash60(col: Column) -> Column:
    """60-bit deterministic string hash: the integer value of the first
    15 hex chars of md5. Chosen because BOTH engines compute it
    bit-identically (Spark ``conv(substring(md5(..)))``; DuckDB folds
    the hex digits), which is what lets signature operators built on it
    (simhash, minhash) carry full value-hash oracles. xxhash64 stays
    the default for non-oracled production paths (faster, 64 bits)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def exact_dedup_keys(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """fingerprint → min(id): the survivor per exact-duplicate group."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"))
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one row per exact-content group (lowest id wins).

    Scale: semi-join against the keys frame; both sides shuffle on the
    fingerprint/id — no row ever compares against more than its group.
    """
    keys = exact_dedup_keys(df, text_col, id_col)
    return df.join(
        keys, F.col(id_col) == F.col("keep_id"), "left_semi"
    )


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingle set from a token-array column.

    IMPORTANT: pass a *materialized* token column (select word_tokens
    into a column first). Interpreted higher-order lambdas do no
    common-subexpression elimination, so an inline tokenizer subtree
    would re-run the full regex split k times per shingle.
    """
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(k)]
        ),
    )
    return F.array_distinct(
        F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(grams)
    )


def shingles(col: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingle set of a text column."""
    return shingles_from_tokens(word_tokens(col), k)


def shingle_stream(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    tokens_col: str | None = None,
) -> DataFrame:
    """Word k-gram shingles as a flat (id, shingle) stream — built
    entirely from codegen builtins (slice + arrays_zip + explode +
    concat_ws), no interpreted lambda anywhere.

    This replaces the transform()-based array construction on hot
    paths: the per-shingle interpreted lambda was the dominant cost of
    the whole MinHash pipeline (measured ~13 s of a 16 s signature
    build at sf0.1; this shape builds the same shingles in ~2 s).
    Same zero-shuffle property: everything happens inside the row's
    own arrays before the explode.

    Shingle SET semantics match ``shingles_from_tokens`` (docs shorter
    than k yield their whole text as the single shingle); the stream
    carries duplicate shingles — harmless under min/collect_set
    aggregation, call ``.distinct()`` when multiplicity matters.

    Pass ``tokens_col`` to reuse an already-materialized token-array
    column (e.g. a cached frame) instead of re-tokenizing ``text_col``.
    """
    if tokens_col is not None:
        toks = df.select(F.col(id_col), F.col(tokens_col).alias("_toks"))
    else:
        toks = df.select(
            F.col(id_col), word_tokens(F.col(text_col)).alias("_toks")
        )
    n = F.size("_toks")
    m = F.greatest(n - F.lit(k - 1), F.lit(0))
    sliced = toks.filter(n >= k).select(
        id_col,
        *[F.slice("_toks", j + 1, m).alias(f"_t{j}") for j in range(k)],
    )
    main = sliced.select(
        id_col,
        F.explode(F.arrays_zip(*[f"_t{j}" for j in range(k)])).alias("_z"),
    ).select(
        id_col,
        F.concat_ws(" ", *[F.col(f"_z._t{j}") for j in range(k)]).alias(
            "shingle"
        ),
    )
    small = toks.filter(n < k).select(
        id_col, F.concat_ws(" ", "_toks").alias("shingle")
    )
    return main.unionByName(small)


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 128,
    k: int = 3,
    hash_fn=None,
) -> DataFrame:
    """MinHash signatures as a DataFrame: (id, sig array<bigint>).

    ``hash_fn`` maps the shingle string column to a bigint (default
    xxhash64; pass ``portable_hash60`` when a DuckDB oracle must mirror
    the signatures bit-for-bit).

    Each shingle is string-hashed ONCE (xxhash64); the i-th family
    member is an affine remix ``h*A_i + B_i`` over the wrapping int64
    ring (odd multipliers are bijections mod 2^64, so each remix is a
    permutation of hash space — a valid MinHash family; string bytes
    are never re-hashed per permutation). Physically: explode shingles
    → groupBy(id) with num_perm ``min`` aggregates. Partial
    aggregation collapses each partition to one row per doc before the
    shuffle, so the exchange carries O(docs × num_perm × 8 bytes)
    regardless of text size — the correct shape at 100 TB. No Python
    UDF anywhere.
    """
    hash_fn = hash_fn or F.xxhash64
    sh = shingle_stream(df, text_col, id_col, k).select(
        F.col(id_col), hash_fn(F.col("shingle")).alias("h")
    )
    aggs = [
        F.min(
            F.col("h") * F.lit(_mix_a(i)).cast("bigint")
            + F.lit(_mix_b(i)).cast("bigint")
        ).alias(f"mh{i}")
        for i in range(num_perm)
    ]
    sigs = sh.groupBy(id_col).agg(*aggs)
    return sigs.select(
        F.col(id_col),
        F.array(*[F.col(f"mh{i}") for i in range(num_perm)]).alias("sig"),
    )


def distinct_shingle_stream(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Per-document DISTINCT k-gram shingles as a flat (id, shingle)
    stream — dedup happens ROW-LOCALLY (``array_distinct`` before the
    explode), so unlike ``shingle_stream().distinct()`` no extra
    full-stream exchange is spent on it; consumers that group by
    shingle (novelty, containment) then pay exactly one shuffle.
    The per-position ``transform`` lambda is interpreted but its body
    is two array indexes + a concat — measured equal to the codegen
    stream at sf1, and the saved shuffle wins at scale. Short-doc
    semantics match ``shingle_stream`` (whole text as the shingle).
    """
    toks = F.expr(
        f"filter(split(lower({text_col}), '[^a-z0-9]+'), t -> t <> '')"
    )
    sset = F.expr(
        f"array_distinct(CASE WHEN size(_toks) < {k}"
        " THEN array(array_join(_toks, ' '))"
        f" ELSE transform(sequence(0, size(_toks) - {k}), i ->"
        f"   concat_ws(' ', {', '.join(f'_toks[i+{j}]' for j in range(k))})"
        " ) END)"
    )
    return df.select(F.col(id_col), toks.alias("_toks")).select(
        F.col(id_col), F.explode(sset).alias("shingle")
    )


def band_keys(
    df: DataFrame,
    id_col: str,
    sig_col: str = "sig",
    bands: int = 32,
    num_perm: int = 128,
) -> DataFrame:
    """(id, band_idx, band_hash) stream for LSH banding — the join key
    both the batch self-join (`lsh_candidate_pairs`) and the streaming
    delta×store join (`streaming/neardup.py`) bucket on. A pure
    function of the signature, so both sides of any band join agree.
    """
    if num_perm % bands:
        raise ValueError(
            f"num_perm ({num_perm}) must be divisible by bands ({bands}); "
            "silent truncation would shift the similarity threshold"
        )
    r = num_perm // bands
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col(sig_col), b * r + 1, r),
                                lambda x: x.cast("string"),
                            ),
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    sig_col: str = "sig",
    bands: int = 32,
    num_perm: int = 128,
) -> DataFrame:
    """Band the signatures, bucket-join, emit candidate id pairs.

    ``num_perm`` must be divisible by ``bands``; rows per band
    r = num_perm/bands sets the similarity threshold ≈ (1/bands)^(1/r).

    Scale: explode to (band_idx, band_hash) — one shuffle keyed by the
    band hash; the self-join happens only inside buckets. Skewed
    buckets (boilerplate) are handled by AQE skew-join splitting.
    """
    banded = band_keys(df, id_col, sig_col, bands, num_perm)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_jaccard_estimate(sig_a: Column, sig_b: Column) -> Column:
    """Fraction of agreeing signature positions ≈ Jaccard similarity."""
    agree = F.size(
        F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda v: v)
    )
    return agree.cast("double") / F.size(sig_a)


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    k: int = 3,
    hash_fn=None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """End-to-end MinHash+LSH near-dup pairs above ``threshold``.

    The signature frame feeds three consumers (banding + both sides of
    the verification join); persist it so the shingle/hash pipeline
    runs once. In a production pipeline signatures are materialized to
    a table keyed by id (``metastore_spark/serve.py`` — pass the
    served frame as ``sigs`` and the corpus is never re-shingled at
    query time); the persist is the in-session equivalent.
    """
    if sigs is None:
        sigs = minhash_signatures(
            df, text_col, id_col, num_perm, k, hash_fn
        ).persist()
    cands = lsh_candidate_pairs(sigs, id_col, "sig", bands, num_perm)
    a = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    b = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                minhash_jaccard_estimate(F.col("sig_a"), F.col("sig_b")), 4
            ).alias("jaccard_est"),
        )
        .filter(F.col("jaccard_est") >= threshold)
    )


def simhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 63,
    hash_fn=None,
) -> DataFrame:
    """SimHash signatures as a DataFrame: (id, simhash bigint).

    ``hash_fn`` maps the token string column to a bigint (default
    xxhash64; ``portable_hash60`` with bits=60 for oracle mirroring).

    Charikar 2002 ("Similarity estimation techniques from rounding
    algorithms"). Bit i of the signature is the sign of the sum over
    tokens of ±1 at bit i of the token hash (bits 0..62; the long sign
    bit stays unused). Physically: explode tokens → groupBy(id) with
    one ``sum`` aggregate per bit — partial aggregation shrinks each
    partition to one row per doc before the shuffle; each aggregate is
    a two-instruction codegen expression, never a nested array walk.
    """
    hash_fn = hash_fn or F.xxhash64
    tok = df.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("tok")
    ).select(F.col(id_col), hash_fn(F.col("tok")).alias("h"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    g = tok.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("bigint")
    for i in range(bits):
        sig = sig + F.when(
            F.col(f"b{i}") > 0, F.lit(1 << i).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return g.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    prefix_bits: int = 16,
    bits: int = 63,
    hash_fn=None,
    sigs: DataFrame | None = None,
    per_doc_cap: int | None = None,
    cap_undirected: bool = False,
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance ≤ max_hamming.

    Scale path: bucket by the top ``prefix_bits`` of the signature so
    the self-join is an equi-join per bucket (misses pairs differing in
    the prefix — the standard multi-probe/rotation trade; rotations can
    be added as extra bucket keys). Pass a served signature table as
    ``sigs`` ((id, simhash) — see ``metastore_spark/serve.py``) to
    skip the corpus pass entirely at query time.

    ``per_doc_cap`` bounds the OUTPUT (VERDICT r7 task 3 / the round-5
    sf3 finding that saturated-signature corpora emit quadratically
    many qualifying pairs): each LEFT doc keeps only its ``cap``
    nearest neighbors (hamming asc, id tiebreak — deterministic), so
    emitted pairs are ≤ n×cap. The cap runs INSIDE the bucket join's
    partitioning (VERDICT r9 task 1): a doc has exactly ONE prefix
    bucket, so a window keyed ``(bucket, id)`` IS the per-doc window,
    and with the join pinned to a shuffle strategy the join's own
    hash-partitioning on ``bucket`` already satisfies the window's
    clustering — the plan has NO second exchange and NO Python stage,
    just a partition-local sort of the qualifying pairs (the previous
    shape paid an Arrow partial-top-k plus a keyed exchange; its
    fixed per-action cost doubled the local bench).

    RECALL CAVEAT (ADVICE r8): pairs are oriented ``id_a < id_b`` and
    the default cap keys on ``id_a`` only, so a doc that appears
    exclusively as the id_b of capped-away pairs — the highest-id
    spoke of a hub-shaped cluster — can lose every edge and escape
    dedup. ``cap_undirected=True`` caps per UNDIRECTED endpoint
    instead (top-``cap`` per id_a UNION top-``cap`` per id_b, same
    single exchange, two local sorts): every doc with at least one
    qualifying neighbor keeps at least one edge, at the price of up
    to 2×cap×n output rows. Clustering consumers should pass it.
    """
    if sigs is None:
        sigs = simhash_signatures(df, text_col, id_col, bits, hash_fn)
    sigs = sigs.withColumn(
        "bucket", F.shiftright(F.col("simhash"), bits - prefix_bits)
    )
    a = sigs.alias("a")
    # capped: pin the self-join to a shuffle strategy so its output
    # stays hash-partitioned by bucket — the per-doc windows below
    # then reuse that exchange (see docstring) instead of adding one
    b = (sigs.hint("shuffle_hash") if per_doc_cap is not None else sigs).alias(
        "b"
    )
    dist = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col("a.bucket").alias("_bk"),
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            dist.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    if per_doc_cap is not None:
        from pyspark.sql import Window

        # (_bk, id) ≡ (id): one bucket per doc — both windows cluster
        # on the join's bucket partitioning, so neither re-shuffles
        wa = Window.partitionBy("_bk", "id_a").orderBy(
            F.col("hamming").asc(), F.col("id_b").asc()
        )
        pairs = pairs.withColumn("_ra", F.row_number().over(wa))
        if cap_undirected:
            wb = Window.partitionBy("_bk", "id_b").orderBy(
                F.col("hamming").asc(), F.col("id_a").asc()
            )
            pairs = pairs.withColumn("_rb", F.row_number().over(wb))
            keep = (F.col("_ra") <= per_doc_cap) | (
                F.col("_rb") <= per_doc_cap
            )
        else:
            keep = F.col("_ra") <= per_doc_cap
        pairs = pairs.filter(keep).drop("_ra", "_rb")
    return pairs.drop("_bk")
