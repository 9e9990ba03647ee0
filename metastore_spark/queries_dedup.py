"""Dedup query bindings on the documents table."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metastore_spark.dedup import ops as dd
from metastore_spark.queries import query, _t, _t_compute, _scaled_width
from metastore_spark.sources import snapshots as snap


def _served_minhash_sigs(
    spark: SparkSession,
    sf_dir: str,
    num_perm: int = 64,
    k: int = 3,
    portable: bool = True,
) -> DataFrame:
    """Signature STORE, not a query-time pass: MinHash signatures for
    the documents corpus, materialized once per corpus content and
    reopened thereafter (serve.materialized). At 100 TB this is the
    ingest-time signature table every dedup job joins against; here it
    also collapses the repeated shingle→hash→min pipeline across the
    minhash/cluster/jaccard registry queries to a parquet reopen."""
    import os

    from metastore_spark import serve

    src = os.path.join(sf_dir, "documents.parquet")
    tag = f"mhsig{num_perm}k{k}{'p' if portable else 'x'}"
    hash_fn = dd.portable_hash60 if portable else None
    return serve.materialized(
        spark,
        [src],
        tag,
        lambda: dd.minhash_signatures(
            _t(spark, sf_dir, "documents"), "text", "doc_id",
            num_perm, k, hash_fn,
        ),
    )


def _served_simhash_sigs(
    spark: SparkSession, sf_dir: str, bits: int = 60
) -> DataFrame:
    """SimHash signature store (see _served_minhash_sigs)."""
    import os

    from metastore_spark import serve

    src = os.path.join(sf_dir, "documents.parquet")
    return serve.materialized(
        spark,
        [src],
        f"shsig{bits}p",
        lambda: dd.simhash_signatures(
            _t(spark, sf_dir, "documents"), "text", "doc_id",
            bits, dd.portable_hash60,
        ),
    )


@query(
    "dedup_exact_keys",
    oracle="""
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
           CAST(MIN(doc_id) AS BIGINT)                              AS keep_id
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup survivors: one (fingerprint, keep_id) per content
    group; lowest doc_id wins. One shuffle on the hash key."""
    return dd.exact_dedup_keys(_t(spark, sf_dir, "documents"), "text", "doc_id")


@query(
    "dedup_exact_rows",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE doc_id IN (
      SELECT MIN(doc_id)
      FROM documents
      GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
    )
    """,
)
def dedup_exact_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup applied: surviving rows via left-semi join."""
    out = dd.exact_dedup(_t(spark, sf_dir, "documents"), "text", "doc_id")
    return out.select("doc_id", "lang", "source")


# --- portable-hash oracle machinery -----------------------------------------
#
# The approximate signature operators (minhash, simhash) are oracled by
# mirroring the ENTIRE signature computation in DuckDB. The base string
# hash is `portable_hash60` (integer value of md5's first 15 hex chars)
# — bit-identical in both engines; the affine remix / bit-sum layers on
# top are exact integer arithmetic, so signatures (and therefore pairs)
# match value-for-value, recall misses and all.

# DuckDB mirror of dedup.ops.portable_hash60 (fold 15 hex digits).
# Unrolled to 15 scalar terms instead of
# list_sum(list_transform(range(...), lambda)): list-aggregate typing
# is the most version-churned DuckDB surface and the one construct
# that ever produced a driver-host value drift (r11); plain
# strpos/substr arithmetic with integer literals is pinned bit-exactly
# by every release, and DuckDB's projection CSE evaluates md5(col)
# once. Guarded by tests/test_oracle_portability.py.
def _ph60(col: str) -> str:
    return "(" + " + ".join(
        f"CAST(strpos('0123456789abcdef', substr(md5({col}), {i}, 1))"
        f" - 1 AS BIGINT) * {1 << (4 * (15 - i))}"
        for i in range(1, 16)
    ) + ")"


# DuckDB mirror of the word k=3 shingle stream (duplicates kept — they
# are harmless under MIN aggregation, exactly like dedup.ops.shingle_stream).
_SHINGLE_STREAM_CTES = """
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(CASE WHEN len(toks) < 3
               THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(1, len(toks) - 1),
                      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
             END) AS shingle
      FROM toks
    )
"""


def _remix_sql(i: int) -> str:
    """DuckDB mirror of the i-th affine minhash remix ``h*A_i + B_i``
    over the wrapping int64 ring: exact HUGEINT arithmetic mod 2^64,
    then mapped back to signed — bit-identical to Spark's non-ANSI
    bigint overflow semantics (h ≥ 0 here, so no negative-operand
    case arises)."""
    a_u = dd._splitmix(2 * i) | 1
    b_u = dd._splitmix(2 * i + 1)
    m = (
        f"((h::HUGEINT * {a_u}::HUGEINT + {b_u}::HUGEINT)"
        " % 18446744073709551616::HUGEINT)"
    )
    return (
        f"CAST(CASE WHEN {m} >= 9223372036854775808::HUGEINT"
        f" THEN {m} - 18446744073709551616::HUGEINT ELSE {m} END AS BIGINT)"
    )


def _minhash_sig_ctes(num_perm: int = 64) -> str:
    """CTEs ending in sig(doc_id, mh0..mh{n-1}) — the full portable
    minhash signature table in DuckDB."""
    mins = ",\n             ".join(
        f"MIN({_remix_sql(i)}) AS mh{i}" for i in range(num_perm)
    )
    return f"""{_SHINGLE_STREAM_CTES},
    hh AS (SELECT doc_id, {_ph60('shingle')} AS h FROM sh),
    sig AS MATERIALIZED (
      -- MATERIALIZED: the band joins reference sig 2×16 times and the
      -- verify 2 more; inlined, DuckDB re-runs the whole shingle+remix
      -- pipeline per reference (measured 18× cost at sf1)
      SELECT doc_id,
             {mins}
      FROM hh GROUP BY doc_id
    )"""


def _minhash_pairs_sql(num_perm: int = 64, bands: int = 16) -> str:
    """Pair CTEs over the signature table: agreement-fraction estimate,
    with LOSSLESS band-join candidate generation.

    The round-4 form joined ``sig a × sig b`` all-pairs — exact, but
    O(n²) in DuckDB and therefore oracle-skipped at sf1. This form
    mirrors the banding pigeonhole in SQL: with 64 perms in 16 bands
    of 4, a pair at est ≥ 0.8 has ≤ 12 disagreeing positions, which
    can spoil at most 12 of the 16 bands — so ≥ 4 bands fully agree
    and EVERY above-threshold pair is produced by at least one band's
    equi-join. UNION over the 16 band joins, then the exact agreement
    count filters; the result set is provably identical to the
    all-pairs form at any corpus, but the join is hash-keyed and
    near-linear on a non-degenerate corpus. (The Spark side's xxhash64
    band-bucket join admits a measure-zero collision candidate set
    that its est filter removes — same final set.)
    """
    rows = num_perm // bands
    band_joins = "\n      UNION\n      ".join(
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sig a JOIN sig b ON "
        + " AND ".join(
            f"a.mh{band * rows + j} = b.mh{band * rows + j}"
            for j in range(rows)
        )
        + " AND a.doc_id < b.doc_id"
        for band in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)"
        for i in range(num_perm)
    )
    return f"""
    cand AS (
      {band_joins}
    ),
    pairs AS (
      SELECT c.id_a, c.id_b,
             ROUND(({agree}) / {num_perm}.0, 4) AS jaccard_est
      FROM cand c
      JOIN sig sa ON c.id_a = sa.doc_id
      JOIN sig sb ON c.id_b = sb.doc_id
    )"""


_MINHASH_PAIRS_ORACLE = f"""
    WITH {_minhash_sig_ctes(64)},
    {_minhash_pairs_sql(64)}
    SELECT id_a, id_b, jaccard_est FROM pairs WHERE jaccard_est >= 0.8
    """


@query("dedup_minhash_pairs", oracle=_MINHASH_PAIRS_ORACLE)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (jaccard_est ≥ 0.8), value-hash
    oracled END-TO-END: DuckDB recomputes the identical 64-permutation
    signatures from the portable base hash and compares every pair's
    agreement fraction. The banding join needs no SQL mirror — at
    est ≥ 0.8 at least 4 of the 16 bands provably agree in full (≤ 12
    disagreements across 16 bands), so every above-threshold pair is a
    candidate by construction; see _minhash_pairs_sql."""
    return dd.minhash_dedup_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        num_perm=64, bands=16, threshold=0.8, hash_fn=dd.portable_hash60,
        sigs=_served_minhash_sigs(spark, sf_dir, 64, 3, portable=True),
    )


def _simhash_oracle(
    bits: int = 60, max_hamming: int = 3, per_doc_cap: int | None = None
) -> str:
    """DuckDB mirror of the full simhash pipeline: portable token hash
    → per-bit ±1 sums → sign bits → prefix bucket → hamming join.
    Every stage is exact integer arithmetic, so the oracle reproduces
    the prefix-bucket recall misses too.

    The prefix width is CORPUS-ADAPTIVE on both engines (see
    dedup_simhash_pairs docstring): p = min(16 + floor(log2(max(n //
    50000, 1))), 28), integer log2 via binary-string length so the
    engines can't drift on a float log."""
    bsums = ",\n             ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN (1::BIGINT << {i}) ELSE 0::BIGINT END)"
        for i in range(bits)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS tok
      FROM documents
    ),
    hh AS (SELECT doc_id, {_ph60('tok')} AS h FROM tok),
    g AS (
      SELECT doc_id,
             {bsums}
      FROM hh GROUP BY doc_id
    ),
    sig AS (SELECT doc_id, {sig} AS simhash FROM g),
    pb AS (
      SELECT LEAST(16 + length(to_base(
               GREATEST(CAST((SELECT COUNT(*) FROM documents) // 50000
                        AS BIGINT), 1), 2)) - 1, 28) AS p
    ),
    bk AS (SELECT doc_id, simhash,
                  simhash >> ({bits} - (SELECT p FROM pb)) AS bucket
           FROM sig),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
      FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    )
    {_cap_clause(per_doc_cap)}
    """


def _cap_clause(per_doc_cap: int | None) -> str:
    """Oracle mirror of the per-doc nearest-neighbor cap (deterministic:
    hamming asc, id_b tiebreak) — or the uncapped pass-through."""
    if per_doc_cap is None:
        return "SELECT id_a, id_b, hamming FROM pairs"
    return f"""
    SELECT id_a, id_b, hamming FROM (
      SELECT id_a, id_b, hamming,
             row_number() OVER (PARTITION BY id_a
                                ORDER BY hamming, id_b) AS rn
      FROM pairs
    ) WHERE rn <= {per_doc_cap}
    """


def adaptive_prefix_bits(n_docs: int, base: int = 16, cap: int = 28) -> int:
    """Corpus-adaptive simhash bucket width: one extra prefix bit per
    doubling of the corpus beyond 50k docs (integer log2 — engines
    can't drift on a float log), capped at ``cap``.

    Why: RANDOM signature collisions in a fixed 2^p bucket space grow
    as n²/2^p — measured 1.35M pairs at 50k docs vs 11.5M at 150k
    with p=16 (quadratic OUTPUT, sf3 sweep round 5). Growing p with
    log2(n) keeps expected random-collision pairs ~linear in n while
    true near-dups (hamming ≤ 3) still collide with the same
    prefix-match probability; at 100 TB the multi-table pigeonhole
    index (4 tables × 15 disjoint bits guarantees recall for
    hamming ≤ 3) replaces the single-prefix heuristic entirely.
    """
    return min(base + (max(n_docs // 50_000, 1)).bit_length() - 1, cap)


@query("dedup_simhash_pairs", oracle=_simhash_oracle(per_doc_cap=8))
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 3 of 60 bits), prefix-bucketed
    — value-hash oracled end-to-end: DuckDB recomputes the identical
    60-bit signatures (portable base hash, exact ±1 bit-sums), the
    same prefix-bucket join (recall misses included), and the same
    per-doc cap.

    Two bounds keep this sublinear at any corpus (VERDICT r7 task 3,
    closing the round-5 sf3 output-bound finding):
    - the prefix width adapts to the corpus (`adaptive_prefix_bits`):
      each doubling beyond 50k docs adds a bit, so random-collision
      CANDIDATES stay ~linear in n instead of n²/2^16;
    - each doc emits at most its 8 nearest qualifying neighbors
      (hamming asc, id tiebreak — deterministic, mirrored in the
      oracle's row_number), applied via the bounded-exchange partial
      top-k, so the OUTPUT is ≤ 8n rows even on saturated-signature
      corpora where qualifying pairs are quadratic. Downstream
      clustering keeps its components: connectivity needs an edge per
      doc, not every edge.
    The count() that sizes p is a driver-side scalar over the served
    signature store's source — a parameter lookup, not a data loop.
    """
    d = _t(spark, sf_dir, "documents")
    n_docs = d.count()
    return dd.simhash_near_pairs(
        d, "text", "doc_id",
        bits=60, hash_fn=dd.portable_hash60,
        prefix_bits=adaptive_prefix_bits(n_docs),
        sigs=_served_simhash_sigs(spark, sf_dir, 60),
        per_doc_cap=8,
    )


_MINHASH_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE {_minhash_sig_ctes(64)},
    {_minhash_pairs_sql(64)},
    thr AS (SELECT id_a, id_b FROM pairs WHERE jaccard_est >= 0.8),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM thr
      UNION
      SELECT id_b, id_a FROM thr
    ),
    nodes AS (SELECT DISTINCT u FROM edges),
    reach(u, v) AS (
      SELECT u, u FROM nodes
      UNION
      SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u
    )
    SELECT u AS doc_id, CAST(MIN(v) AS BIGINT) AS cluster_id
    FROM reach GROUP BY u ORDER BY doc_id
    """


@query("dedup_minhash_clusters", oracle=_MINHASH_CLUSTERS_ORACLE)
def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup groups: MinHash+LSH pairs → connected components
    (iterative min-label propagation). Every doc in ≥ 1 pair gets its
    component's min doc_id as cluster label. Oracled: DuckDB recomputes
    the identical portable-hash pairs, then closes the graph with a
    RECURSIVE transitive closure — a distributed iterative algorithm
    pinned by a SQL fixpoint."""
    from metastore_spark.dedup.cluster import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = dd.minhash_dedup_pairs(
        d, "text", "doc_id", num_perm=64, bands=16, threshold=0.8,
        hash_fn=dd.portable_hash60,
        sigs=_served_minhash_sigs(spark, sf_dir, 64, 3, portable=True),
    ).persist()
    nodes = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    cc = connected_components(nodes, pairs)
    return cc.select(
        "doc_id", F.col("cluster_id").cast("bigint").alias("cluster_id")
    ).orderBy("doc_id")


@query(
    "dedup_jaccard_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             list_distinct(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'),
               t -> t <> '')) AS tset
      FROM documents
    ),
    -- prefix-filtered candidates (same lossless PPJoin bound and
    -- integer-id verify as _SHINGLE_PAIR_CTES — see that comment): a
    -- same-lang pair at Jaccard >= 0.8 must share a token within both
    -- docs' first |T| - ceil(0.8|T|) + 1 tokens of the global
    -- (df, token) order; tid is dense-ranked by that order, so
    -- ORDER BY tid IS the prefix order
    tx AS (SELECT doc_id, lang, unnest(tset) AS t, len(tset) AS sz
           FROM toks),
    tdf AS (
      SELECT t, row_number() OVER (ORDER BY COUNT(*), t) AS tid
      FROM tx GROUP BY t
    ),
    txi AS MATERIALIZED (
      SELECT e.doc_id, e.lang, d.tid, e.sz FROM tx e JOIN tdf d USING (t)
    ),
    iset AS MATERIALIZED (
      SELECT doc_id, list_sort(list(tid)) AS tids FROM txi GROUP BY doc_id
    ),
    tpref AS (
      SELECT doc_id, lang, tid, sz FROM (
        SELECT doc_id, lang, tid, sz,
               row_number() OVER (PARTITION BY doc_id ORDER BY tid) AS rk
        FROM txi
      ) WHERE rk <= sz - (4 * sz + 4) // 5 + 1
    ),
    cand AS (
      -- size gate is lossless too: J >= 0.8 forces |A|/|B| <= 1.25,
      -- i.e. 4*max <= 5*min in exact integers
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM tpref a JOIN tpref b
        ON a.tid = b.tid AND a.lang = b.lang AND a.doc_id < b.doc_id
           AND 4 * GREATEST(a.sz, b.sz) <= 5 * LEAST(a.sz, b.sz)
    ),
    scored AS (
      SELECT c.id_a, c.id_b,
             CAST(len(list_intersect(a.tids, b.tids)) AS DOUBLE)
               / (len(a.tids) + len(b.tids)
                  - len(list_intersect(a.tids, b.tids))) AS jac
      FROM cand c
      JOIN iset a ON c.id_a = a.doc_id
      JOIN iset b ON c.id_b = b.doc_id
    )
    SELECT id_a, id_b, ROUND(jac, 4) AS jaccard
    FROM scored WHERE jac >= 0.8
    """,
    validation_only=True,
    scale_path="dedup_jaccard_verified",
)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard near-dups via PREFIX-FILTERED candidates
    (Bayardo et al. WWW'07 / PPJoin, the public exact-similarity-join
    technique the shingle oracle already mirrors).

    VALIDATION TWIN of `dedup_jaccard_verified` (the MinHash-LSH +
    exact-verify production path): this query computes the exact
    token-SET metric so the LSH path can be certified against it at
    oracle-checkable SFs — but exact no longer means quadratic. The
    r5-r10 plan all-paired every (lang, length-bucket) block (O(block²)
    CPU: 432 s at sf1, skipped at sf3); now candidates form only on
    SHARED PREFIX TOKENS: order each doc's token set by ascending
    global document frequency (ties on the token), keep the first
    |T| - ceil(0.8·|T|) + 1 tokens, and equi-join prefixes on
    (token, lang) with the integer size gate (J >= 0.8 forces
    4·max(|A|,|B|) <= 5·min). Losslessness needs only that BOTH sides
    use the same total order — any order — so Spark's own (df, token)
    ranking works without agreeing with the oracle's dense ids; the
    pigeonhole is per pair: if a qualifying pair shared no prefix
    token, each doc would need > ceil(0.8|T|) unshared tokens, which
    J >= 0.8 forbids. Exact array_intersect/union verifies candidates.

    Scale shape: token df is a partial-agg groupBy; prefix ranking is
    a PER-DOC window (partitioned, never global); the candidate join
    keys on RARE tokens (frequent tokens rank last and never enter a
    prefix), so candidates are proportional to rare-token collisions
    — near the output size — instead of block². ceil(0.8·s) is
    (4s+4)//5 in exact integers (a float ceil rounds UP at s = 5k,
    silently shortening the prefix and making the filter lossy).

    Caveat (measured at sf1, r4): token-SET similarity saturates on
    low-entropy corpora — with a ~30-word vocabulary every long doc's
    set converges to the full vocabulary, prefixes collide
    everywhere, and the OUTPUT itself is O(n²) no matter the plan.
    That is a property of the metric, not the join; shingle-based
    `dedup_jaccard_verified` stays the production path because 3-gram
    sets don't saturate.
    """
    d = _t(spark, sf_dir, "documents")
    from pyspark.sql import Window

    toks = d.select(
        "doc_id",
        "lang",
        F.array_distinct(
            F.array_remove(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"), ""
            )
        ).alias("tset"),
    ).withColumn("sz", F.size(F.col("tset")))
    tx = toks.select(
        "doc_id", "lang", "sz", F.explode("tset").alias("t")
    )
    tdf = tx.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy("df", "t")
    )
    prefix_len = F.col("sz") - (
        (F.lit(4) * F.col("sz") + F.lit(4)) / F.lit(5)
    ).cast("long") + F.lit(1)
    tpref = (
        tx.join(tdf, "t")
        .withColumn("rk", rk)
        .filter(F.col("rk") <= prefix_len)
        .select("doc_id", "lang", "t", "sz")
    )
    # both sides of the prefix self-join are corpus-sized (docs x
    # prefix rows) but DESCEND from a file-sized scan, so Catalyst's
    # estimate would broadcast one — wrong at 100 TB (the r5 lesson).
    # Explicit same-key repartitions + shuffle_hash pin a shuffled
    # join on the exact equi-keys; rare prefix tokens keep the key
    # distribution flat, so no salt is needed. Width is SIZE-DERIVED
    # (r12, guide §2.2/§2.5): the old defaultParallelism*4 constant
    # spent 128 near-empty tasks per exchange on small corpora and
    # would under-partition a 100 TB one.
    fanout = _scaled_width(spark, sf_dir, "documents", "text")
    pa_ = tpref.repartition(fanout, "t", "lang").alias("a")
    pb_ = (
        tpref.repartition(fanout, "t", "lang")
        .hint("shuffle_hash")
        .alias("b")
    )
    cand = (
        pa_.join(
            pb_,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # integer-exact size gate: J >= 0.8 forces |A|/|B| <= 1.25
            & (
                F.lit(4) * F.greatest(F.col("a.sz"), F.col("b.sz"))
                <= F.lit(5) * F.least(F.col("a.sz"), F.col("b.sz"))
            ),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .distinct()
    )
    a = toks.select(F.col("doc_id").alias("id_a"), F.col("tset").alias("sa"))
    b = toks.select(F.col("doc_id").alias("id_b"), F.col("tset").alias("sb"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size(F.array_union(F.col("sa"), F.col("sb")))
    jac = inter.cast("double") / union
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("_jac", jac)
        .filter(F.col("_jac") >= 0.8)
        .select("id_a", "id_b", F.round("_jac", 4).alias("jaccard"))
    )


# Exact 3-gram-shingle-Jaccard pair CTEs, shared by the verified-pairs
# oracle and the clustering oracle (one definition, no drift).
#
# Candidate generation is PREFIX-FILTERED (Bayardo et al. "Scaling Up
# All Pairs Similarity Search" WWW'07; Xiao et al. PPJoin WWW'08, a
# public exact-join technique): order every shingle set by the global
# (df, shingle) total order; a pair with Jaccard ≥ t MUST share a
# shingle inside both sets' first |S| - ⌈t·|S|⌉ + 1 elements, so the
# equi-join on prefix shingles loses no qualifying pair while cutting
# the all-pairs n²/2 list intersections (oracle-skipped at sf1 in
# round 4) to candidates proportional to rare-shingle collisions.
# ⌈0.8·s⌉ is computed as (4s+4)//5 in exact integer arithmetic — a
# float ceil(0.8*s) rounds UP at s=5k (binary 0.8 > 4/5), silently
# shortening the prefix and making the filter lossy.
#
# Shingles are remapped to dense integer ids ordered by (df, shingle)
# before the join/verify: the prefix rank then equals the id order
# (one window instead of a join-then-rank), and the exact verify
# intersects INT lists instead of re-hashing ~hundreds of shingle
# STRINGS per candidate. The union comes from |A|+|B|-|A∩B| (sets are
# already distinct) rather than list_distinct(list_concat(...)),
# which re-hashed both lists a second time. Same result set, measured
# ~200× faster at sf1 (25+ min → ~8 s for the token-set variant).
# MATERIALIZED pins the set/prefix tables: DuckDB otherwise inlines a
# CTE into every use site, recomputing the shingle pipeline per band.
_SHINGLE_PAIR_CTES = """
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) < 3
               THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(1, len(toks) - 1),
                      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
             END) AS sset
      FROM toks
    ),
    shx AS (
      SELECT doc_id, unnest(sset) AS s, len(sset) AS sz FROM sh
    ),
    shdf AS (
      SELECT s, row_number() OVER (ORDER BY COUNT(*), s) AS sid
      FROM shx GROUP BY s
    ),
    shxi AS MATERIALIZED (
      SELECT e.doc_id, d.sid, e.sz FROM shx e JOIN shdf d USING (s)
    ),
    shset AS MATERIALIZED (
      SELECT doc_id, list_sort(list(sid)) AS sids FROM shxi GROUP BY doc_id
    ),
    shpref AS MATERIALIZED (
      SELECT doc_id, sid, sz FROM (
        SELECT doc_id, sid, sz,
               row_number() OVER (PARTITION BY doc_id ORDER BY sid) AS rk
        FROM shxi
      ) WHERE rk <= sz - (4 * sz + 4) // 5 + 1
    ),
    shcand AS (
      -- size gate (lossless): J >= 0.8 forces 4*max(|A|,|B|) <= 5*min
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM shpref a JOIN shpref b
        ON a.sid = b.sid AND a.doc_id < b.doc_id
           AND 4 * GREATEST(a.sz, b.sz) <= 5 * LEAST(a.sz, b.sz)
    ),
    shscored AS (
      SELECT c.id_a, c.id_b,
             CAST(len(list_intersect(a.sids, b.sids)) AS DOUBLE)
               / (len(a.sids) + len(b.sids)
                  - len(list_intersect(a.sids, b.sids))) AS jac
      FROM shcand c
      JOIN shset a ON c.id_a = a.doc_id
      JOIN shset b ON c.id_b = b.doc_id
    ),
    pairs AS (
      SELECT id_a, id_b, jac FROM shscored WHERE jac >= 0.8
    )
"""


@query(
    "dedup_jaccard_verified",
    oracle=f"""
    WITH {_SHINGLE_PAIR_CTES}
    SELECT id_a, id_b, ROUND(jac, 4) AS jaccard FROM pairs
    """,
)
def dedup_jaccard_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION near-dup path: MinHash+LSH candidate generation
    followed by EXACT Jaccard verification — never O(n²).

    The similarity metric is 3-gram shingle Jaccard (word n-grams are
    what discriminates near-dups; bare token sets saturate on a small
    vocabulary — measured 164 s vs 3 s at sf0.1 because token-level
    candidates explode quadratically on this corpus). Candidates come
    from the same 3-gram MinHash the signatures use; 64 permutations
    in 32 bands of 2 rows put the LSH threshold at ~0.18 with miss
    probability (1 - j²)³² ≈ 4e-15 at j = 0.8 — which is why the
    oracle can be the full exact all-pairs join: the candidate set
    provably (to machine precision) covers every qualifying pair, and
    the exact verify discards every false positive. Cost: one
    signature pass O(docs × 64 × 8 B) + bucket-local joins + a
    verify join proportional to the candidate count, vs the oracle's
    n²/2 set intersections.
    """
    import os

    from metastore_spark import serve

    def build() -> DataFrame:
        d = _t(spark, sf_dir, "documents")
        # sigs feed both sides of the banding self-join: cache, or the
        # signature pipeline runs once per side
        sigs = _served_minhash_sigs(spark, sf_dir, 64, 3, portable=False)
        cands = dd.lsh_candidate_pairs(
            sigs, "doc_id", "sig", bands=32, num_perm=64
        ).cache()
        # exact shingle sets ONLY for docs that appear in a candidate
        # pair (at scale the candidate universe is a tiny fraction of
        # the corpus; verifying never touches the rest), built from the
        # codegen shingle stream — no interpreted lambdas
        cand_ids = (
            cands.select(F.col("id_a").alias("doc_id"))
            .unionByName(cands.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        ssets = (
            dd.shingle_stream(
                d.join(cand_ids, "doc_id", "left_semi"), "text", "doc_id", 3
            )
            .groupBy("doc_id")
            .agg(F.collect_set("shingle").alias("sset"))
            .cache()
        )
        a = ssets.select(
            F.col("doc_id").alias("id_a"), F.col("sset").alias("sa")
        )
        b = ssets.select(
            F.col("doc_id").alias("id_b"), F.col("sset").alias("sb")
        )
        inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
        union = F.size(F.array_union(F.col("sa"), F.col("sb")))
        jac = inter.cast("double") / union
        return (
            cands.join(a, "id_a")
            .join(b, "id_b")
            .withColumn("_jac", jac)
            .filter(F.col("_jac") >= 0.8)
            .select("id_a", "id_b", F.round("_jac", 4).alias("jaccard"))
        )

    # Verified pairs are an INGEST ARTIFACT, not a query: clusters and
    # corpus-survivors both consume them, and a production pipeline
    # materializes them once per corpus content (the BM25-index /
    # minhash-signature precedent). serve.materialized fingerprints the
    # source and rebuilds only when the corpus changes.
    return serve.materialized(
        spark, [os.path.join(sf_dir, "documents.parquet")], "jvpairs", build
    )


@query(
    "dedup_clusters_verified",
    oracle=f"""
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
    )
    SELECT u AS doc_id, CAST(MIN(v) AS BIGINT) AS cluster_id
    FROM reach GROUP BY u ORDER BY doc_id
    """,
)
def dedup_clusters_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters over the VERIFIED pair graph: iterative
    min-label propagation (one join + one groupBy per round,
    localCheckpoint between rounds) — and unlike the minhash-estimate
    clustering, this one has a value-hash oracle: DuckDB computes the
    same components as a recursive transitive closure. A distributed
    graph algorithm pinned by a SQL fixpoint.

    Only docs that appear in at least one verified pair are labeled
    (singletons carry no dedup information)."""
    pairs = dedup_jaccard_verified(spark, sf_dir).cache()
    nodes = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    from metastore_spark.dedup.cluster import connected_components

    cc = connected_components(nodes, pairs)
    return cc.select(
        "doc_id", F.col("cluster_id").cast("bigint").alias("cluster_id")
    ).orderBy("doc_id")


@query(
    "docs_shared_passages",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks) - 6),
               i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
                              toks[i+4], toks[i+5], toks[i+6], toks[i+7])))
               AS passage
      FROM toks WHERE len(toks) >= 8
    )
    SELECT passage,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT)               AS n_occurrences
    FROM grams
    GROUP BY passage
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def docs_shared_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup signal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — public method):
    8-token passages appearing in ≥ 2 distinct documents, with doc and
    occurrence counts — the candidates for cross-document boilerplate
    removal that document-level dedup can't see. Built on the codegen
    shingle stream (slice+zip+explode, no lambdas); one partial-agg
    shuffle keyed by passage. At 100 TB the passage key space is the
    token stream itself — production would hash passages (8-byte keys)
    and optionally pre-filter with a count-min pass; the structure is
    identical."""
    from metastore_spark.text.ops import word_tokens

    d = _t(spark, sf_dir, "documents")
    # shingle_stream emits whole-doc fallback rows for docs shorter
    # than k; those are not 8-gram passages — gate to n >= 8 first,
    # mirroring the oracle's len(toks) >= 8
    long_enough = d.filter(F.size(word_tokens(F.col("text"))) >= 8)
    grams = dd.shingle_stream(
        long_enough, "text", "doc_id", k=8
    ).withColumnRenamed("shingle", "passage")
    return (
        grams.groupBy("passage")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@query(
    "dedup_incremental_ingest",
    oracle="""
    WITH existing AS (
      SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               AS fp
      FROM documents WHERE doc_id < 400
    ),
    incoming AS (
      SELECT doc_id, lang, source,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
      FROM documents WHERE doc_id >= 400
    )
    SELECT i.doc_id, i.lang, i.source,
           (e.fp IS NOT NULL) AS dup_of_corpus
    FROM incoming i LEFT JOIN existing e ON i.fp = e.fp
    """,
)
def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup — the shape every CONTINUOUSLY-FED
    corpus needs: an incoming batch (doc_id >= 400 stands in) checked
    against the existing corpus's fingerprint set (doc_id < 400), each
    new doc labeled duplicate-of-corpus or genuinely new. Unlike the
    batch dedup ops, only the DELTA is scanned in full; the existing
    side contributes nothing but its (16-byte) fingerprint column —
    at 100 TB that column is a materialized index, and the check is a
    broadcast or bucketed semi-join keyed on the hash, never a rescan
    of history."""
    from metastore_spark.text.ops import fingerprint

    d = _t(spark, sf_dir, "documents")
    existing = (
        d.filter(F.col("doc_id") < 400)
        .select(fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    incoming = d.filter(F.col("doc_id") >= 400).select(
        "doc_id", "lang", "source", fingerprint(F.col("text")).alias("fp")
    )
    return (
        incoming.join(F.broadcast(existing), "fp", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            F.col("_hit").isNotNull().alias("dup_of_corpus"),
        )
    )


@query(
    "dedup_corpus_survivors",
    oracle=f"""
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
    drop AS (SELECT doc_id FROM labels WHERE doc_id <> cluster_id)
    SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM drop)
    """,
)
def dedup_corpus_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup APPLIED: the training corpus after near-dup removal —
    each verified cluster keeps its min-doc_id representative, every
    unpaired doc survives untouched. This is the output artifact a
    data pipeline actually ships; the pairs/clusters queries are its
    diagnostics. Anti-join shape: survivors = documents ⟕̸ drop-list
    (left_anti on a cluster-member frame that excludes each cluster's
    keeper) — the drop-list is near-dup-sized, never corpus-sized, so
    the anti-join broadcast-prunes at any scale."""
    clusters = dedup_clusters_verified(spark, sf_dir)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    d = _t(spark, sf_dir, "documents")
    return d.join(F.broadcast(drop), "doc_id", "left_anti").select(
        "doc_id", F.col("n_chars").cast("bigint").alias("n_chars")
    )


# Shared 3-gram shingle explode + document-frequency cap, mirrored by
# the containment oracle. The df cap is the scale guarantee: a
# boilerplate shingle shared by millions of docs would otherwise emit
# df^2 candidate pairs from one posting; capped postings bound pairs
# per shingle at _CONTAIN_DF_CAP^2 (and a shingle that common carries
# no dedup signal anyway — same reasoning as stopword removal).
_CONTAIN_DF_CAP = 50


@query(
    "dedup_containment_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) < 3
               THEN [array_to_string(toks, ' ')]
               ELSE list_transform(range(1, len(toks) - 1),
                      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
             END) AS sset
      FROM toks
    ),
    ex AS (SELECT doc_id, unnest(sset) AS shingle FROM sh),
    df AS (SELECT shingle FROM ex GROUP BY shingle
           HAVING COUNT(*) <= {_CONTAIN_DF_CAP}),
    kept AS (SELECT e.doc_id, e.shingle FROM ex e JOIN df USING (shingle)),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM kept a JOIN kept b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT CASE WHEN sa.n_sh <= sb.n_sh THEN p.id_a ELSE p.id_b END
             AS contained_id,
           CASE WHEN sa.n_sh <= sb.n_sh THEN p.id_b ELSE p.id_a END
             AS container_id,
           p.n_shared,
           CAST(LEAST(sa.n_sh, sb.n_sh) AS BIGINT) AS n_small,
           ROUND(p.n_shared * 1.0 / LEAST(sa.n_sh, sb.n_sh), 4)
             AS containment
    FROM pairs p
    JOIN sizes sa ON sa.doc_id = p.id_a
    JOIN sizes sb ON sb.doc_id = p.id_b
    WHERE p.n_shared >= 3
      AND p.n_shared * 1.0 / LEAST(sa.n_sh, sb.n_sh) >= 0.9
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document containment: doc pairs where >=90% of the SMALLER
    doc's 3-gram shingles appear in the larger — the quote / excerpt /
    boilerplate-expansion duplication Jaccard misses (a doc fully
    quoted inside a 10x-longer doc has Jaccard ~0.1 but containment
    1.0). A first-class training-data op: contained docs add no novel
    text to the corpus.

    Candidate generation is a POSTING-LIST equi-join, not LSH: explode
    distinct shingles, drop shingles with document frequency >
    _CONTAIN_DF_CAP (boilerplate — each would emit df^2 pairs and
    carries no signal), self-join on shingle, and count shared
    shingles per pair directly in the aggregation — |A∩B| without ever
    materializing token sets twice. One shuffle keyed by shingle to
    form pairs, one keyed by pair to count, broadcast-join the per-doc
    sizes. At 100 TB: pairs only exist for docs sharing a sub-cap
    shingle; the cap bounds the blowup per posting, the same guarantee
    the banded-minhash join makes per band bucket."""
    d = _t_compute(spark, sf_dir, "documents")
    ex = dd.distinct_shingle_stream(d, "text", "doc_id", 3)
    # NEGATIVE RESULT (r13, do not re-attempt without new evidence):
    # replacing this count window with groupBy(shingle)+anti-join of
    # the over-cap set (partial aggregation, no sort, no hot-shingle
    # single-task count) measured SLOWER under interleaved A/B with a
    # stable q1 control — 1.07-1.30x at sf0.1 and 1.80x at sf1
    # (best-of-legs; both with ex and/or kept persisted). The window
    # reuses the one shuffle-by-shingle the pair join needs anyway,
    # while the restructure paid an extra exchange for the cap
    # aggregate plus a broadcast build and heavier cache traffic. The
    # theoretical hot-shingle skew in the window count remains bounded
    # in practice: a skewed shingle's postings sort within one task
    # but the window writes one count, and the df<=cap filter drops
    # the heavy groups immediately after.
    kept = (
        ex.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
        .filter(F.col("df") <= _CONTAIN_DF_CAP)
        .drop("df")
        # referenced 3x (pair join a/b + sizes): persist the capped
        # posting stream once instead of re-scanning+re-windowing per
        # reference. Query-scoped — the registry wrapper clears caches
        # between queries; a persistent deployment would materialize
        # this as a serving store like the minhash signatures.
        .persist()
    )
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = kept.alias("a")
    b = kept.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    small = F.least(F.col("sa.n_sh"), F.col("sb.n_sh"))
    contain = F.col("n_shared") / small
    a_is_small = F.col("sa.n_sh") <= F.col("sb.n_sh")
    return (
        pairs.join(sa, F.col("id_a") == F.col("sa.doc_id"))
        .join(sb, F.col("id_b") == F.col("sb.doc_id"))
        .filter((F.col("n_shared") >= 3) & (contain >= 0.9))
        .select(
            F.when(a_is_small, F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("contained_id"),
            F.when(a_is_small, F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("container_id"),
            "n_shared",
            small.cast("bigint").alias("n_small"),
            F.round(contain, 4).alias("containment"),
        )
    )


@query(
    "dedup_cluster_size_histogram",
    oracle=f"""
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
    sizes AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM labels GROUP BY cluster_id
    )
    SELECT cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(cluster_size) AS BIGINT) AS n_docs,
           CAST(SUM(cluster_size - 1) AS BIGINT) AS n_removable
    FROM sizes
    GROUP BY cluster_size
    ORDER BY cluster_size
    """,
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup impact report: the near-dup cluster SIZE distribution —
    how many clusters of each size, how many documents they hold, and
    how many rows a keep-one-per-cluster policy removes. This is the
    number a corpus owner reads before running the dedup (the
    survivors query applies it); 'n_removable' summed over the table
    IS the dedup's yield. Reuses the verified-pair component labels
    (LSH-pruned candidate path), so the extra cost over clustering is
    two O(clusters) aggregations."""
    clusters = dedup_clusters_verified(spark, sf_dir)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("cluster_size").alias("n_docs"),
            F.sum(F.col("cluster_size") - 1).alias("n_removable"),
        )
        .orderBy("cluster_size")
    )
_SUBSTRING_APPLIED_ORACLE = f"""
    WITH tk AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    grams AS (
      -- gram index is g, NOT i: _ph60 expands to a list_transform
      -- whose lambda variable is i, which would shadow an outer i
      -- inside the hashed expression
      SELECT doc_id, CAST(g - 1 AS BIGINT) AS start,
             {_ph60("concat_ws(' ', toks[g], toks[g+1], toks[g+2], toks[g+3], toks[g+4], toks[g+5], toks[g+6], toks[g+7])")} AS pk
      FROM tk, UNNEST(range(1, len(toks) - 6)) u(g)
      WHERE len(toks) >= 8
    ),
    shared AS (
      -- >=2 distinct docs == min(doc) < max(doc); min/max partials are
      -- two longs per key where a count-distinct partial is a SET
      SELECT pk FROM grams GROUP BY pk HAVING MIN(doc_id) < MAX(doc_id)
    ),
    spans AS (
      SELECT DISTINCT g.doc_id, g.start
      FROM grams g JOIN shared s ON g.pk = s.pk
    ),
    removed AS (
      SELECT DISTINCT sp.doc_id, sp.start + o AS pos
      FROM spans sp, UNNEST(range(8)) t(o)
    ),
    affected AS (SELECT DISTINCT doc_id FROM removed),
    flat AS (
      SELECT tk.doc_id, CAST(i AS BIGINT) AS pos, toks[i + 1] AS tok
      FROM tk JOIN affected af ON tk.doc_id = af.doc_id,
           UNNEST(range(len(toks))) u(i)
    ),
    kept AS (
      SELECT f.doc_id, f.pos, f.tok
      FROM flat f LEFT JOIN removed r
        ON f.doc_id = r.doc_id AND f.pos = r.pos
      WHERE r.pos IS NULL
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS cleaned_md5
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CASE WHEN af.doc_id IS NULL THEN CAST(0 AS BIGINT)
                ELSE CAST(len(t.toks) - COALESCE(a.n_kept, 0) AS BIGINT)
           END AS n_tokens_removed,
           CASE WHEN af.doc_id IS NULL THEN md5(array_to_string(t.toks, ' '))
                ELSE COALESCE(a.cleaned_md5, md5(''))
           END AS cleaned_md5
    FROM tk t
    LEFT JOIN affected af ON t.doc_id = af.doc_id
    LEFT JOIN agg a ON t.doc_id = a.doc_id
    """


@query("dedup_substring_applied", oracle=_SUBSTRING_APPLIED_ORACLE)
def dedup_substring_applied(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup APPLIED (Lee et al. 2022, public method):
    every 8-token passage occurring in ≥ 2 distinct documents is
    excised from ALL documents, and each document is rebuilt from its
    surviving tokens in original order — the corpus-rewrite transform
    behind `docs_shared_passages`' detection signal. Output carries
    before/removed token counts and the MD5 of each rebuilt document
    (the digest pins the reconstruction byte-for-byte while keeping
    the result frame bounded at any SF — a corpus rewrite lands in a
    store, not the driver; returning 150k full texts OOM'd the sf3
    collect).

    Scale shape, stage by stage: (1) positioned 8-gram stream via
    slice+zip+posexplode — codegen, zero-shuffle — keyed by the
    PORTABLE 60-bit HASH of the passage, never the passage string
    (8-byte shuffle keys instead of ~50-byte token strings; the
    oracle applies the identical hash, so even the ~n²/2⁶¹ collision
    probability is mirrored — this exact change fixed a 1 GiB-heap
    OOM at sf1, where the persisted string-keyed stream was the
    whole heap); (2) one partial-agg shuffle on the hash for the
    ≥2-doc filter; (3) flagged spans fan ×8 into covered (doc_id,
    pos) rows — bounded by the flagged subset, never the corpus;
    (4) only AFFECTED documents are re-exploded and anti-joined on
    (doc_id, pos) — untouched docs (the vast majority of a lightly-
    duplicated corpus) take the map-only `array_join(toks)` path with
    no shuffle at all; (5) the order-preserving rebuild is a per-doc
    collect_list + array_sort, memory bounded by document length.
    Nothing is persisted: both gram passes are codegen recomputes,
    cheaper than caching 25M string rows ever was.
    """
    from metastore_spark.dedup.ops import portable_hash60
    from metastore_spark.text.ops import word_tokens

    K = 8
    d = _t_compute(spark, sf_dir, "documents")
    toks = d.select("doc_id", word_tokens(F.col("text")).alias("toks"))
    n = F.size("toks")
    m = F.greatest(n - F.lit(K - 1), F.lit(0))
    sliced = toks.filter(n >= K).select(
        "doc_id",
        *[F.slice("toks", j + 1, m).alias(f"_t{j}") for j in range(K)],
    )
    grams = sliced.select(
        "doc_id",
        F.posexplode(F.arrays_zip(*[f"_t{j}" for j in range(K)])).alias(
            "start", "_z"
        ),
    ).select(
        "doc_id",
        F.col("start").cast("bigint").alias("start"),
        portable_hash60(
            F.concat_ws(
                " ", *[F.col("_z").getField(f"_t{j}") for j in range(K)]
            )
        ).alias("pk"),
    )
    # one declared width for every gram-keyed exchange: the agg and
    # the flag join must never land on different shuffle layouts.
    # SIZE-DERIVED (r12): ~8 MB of uncompressed text per partition
    # (~1.4M gram keys, ~55 MB agg hash map per task) — the fixed
    # defaultParallelism*8 width paid 256 near-empty tasks per
    # exchange on the 1.5 MB sf0.1 corpus while still being a
    # CONSTANT at 100 TB; this tracks the data both ways.
    gram_width = _scaled_width(spark, sf_dir, "documents", "text")
    shared = (
        # "appears in >=2 DISTINCT docs" as min<max: the map-side
        # partial is two longs per passage key; a count_distinct
        # partial materializes per-key doc-id sets, which OOM'd the
        # 1 GiB vanilla heap at sf3 (75M gram keys). The shuffle width
        # is EXPLICIT for the same reason as _fan_params: the gram key
        # space is huge but its bytes are small, so AQE coalesces the
        # reduce side into a handful of fat partitions whose agg hash
        # maps then exceed small heaps — declared width keeps per-task
        # key counts bounded at any SF.
        grams.select("pk", "doc_id")
        .repartition(gram_width, F.col("pk"))
        .groupBy("pk")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .filter(F.col("lo") < F.col("hi"))
        .select("pk")
    )
    # same declared width for the flag join, and shuffle-hash with the
    # (small) shared set as build side: a sort-merge join would sort
    # the full gram stream inside AQE-coalesced fat partitions
    spans = (
        grams.repartition(gram_width, F.col("pk"))
        .join(shared.hint("shuffle_hash"), "pk")
        .select("doc_id", "start")
        .distinct()
    )
    removed = spans.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("start"), F.col("start") + F.lit(K - 1))
        ).alias("pos"),
    ).distinct()
    affected = removed.select("doc_id").distinct()
    flat = (
        toks.join(affected, "doc_id")
        .select("doc_id", F.posexplode("toks").alias("pos", "tok"))
        .withColumn("pos", F.col("pos").cast("bigint"))
    )
    kept = flat.join(removed, ["doc_id", "pos"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        # digest computed INSIDE the aggregate: the rebuilt string
        # exists only transiently per group — full cleaned texts never
        # sit in a join hash side, an exchange, or the driver collect
        # (carrying them OOM'd a 1 GiB heap at sf3)
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            )
        ).alias("cleaned_md5"),
    )
    aff_flag = affected.withColumn("is_aff", F.lit(True))
    empty_md5 = F.md5(F.lit(""))
    return (
        toks.select(
            "doc_id",
            n.cast("bigint").alias("n_tokens"),
            F.md5(F.array_join("toks", " ")).alias("orig_md5"),
        )
        .join(aff_flag, "doc_id", "left")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.when(F.col("is_aff").isNull(), F.lit(0).cast("bigint"))
            .otherwise(
                F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))
            )
            .cast("bigint")
            .alias("n_tokens_removed"),
            F.when(F.col("is_aff").isNull(), F.col("orig_md5"))
            .otherwise(F.coalesce("cleaned_md5", empty_md5))
            .alias("cleaned_md5"),
        )
    )


@query(
    "docs_snapshot_dedup_applied",
    oracle=f"""
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
    drop AS (SELECT doc_id FROM labels WHERE doc_id <> cluster_id),
    survivors AS (
      SELECT d.doc_id, d.n_chars, md5(d.text) AS digest
      FROM documents d
      WHERE d.doc_id NOT IN (SELECT doc_id FROM drop)
    )
    SELECT 1 AS version,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars_sum,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_digests
    FROM documents
    UNION ALL
    SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(n_chars) AS BIGINT),
           CAST(COUNT(DISTINCT digest) AS BIGINT)
    FROM survivors
    ORDER BY version
    """,
)
def docs_snapshot_dedup_applied(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DEDUP AS A TABLE COMMIT — the LLM-pipeline operator composed
    with the table format, which is how a production corpus actually
    applies near-dup removal: the documents corpus is committed as
    snapshot v1, the verified near-dup drop-list (every cluster
    member except its min-id keeper, the `dedup_corpus_survivors`
    rule) lands as ONE `commit_delete_keys` COW commit, and v2 IS the
    training corpus — while any pinned reader (a mid-flight training
    run) keeps reproducing v1 until retention expires it. Both
    versions hash-check against DuckDB recomputing the full pipeline
    (shingle pairs -> transitive closure -> keeper rule -> survivor
    aggregate over content digests).

    Scale shape: the drop-list is near-dup-sized (broadcast), the
    COW rewrite touches only files holding dropped docs (the corpus
    lands doc_id-range-clustered so drops localize), and the rewrite
    cost is O(affected files) — at 100 TB, dedup stops being a
    full-corpus copy job and becomes a metadata commit plus the
    affected fraction's rewrite. Rollback of an over-aggressive
    threshold is `rollback_to(root, 1)`, metadata-only."""
    import tempfile

    root = os.path.join(tempfile.mkdtemp(prefix="snap_dedup_"), "t")
    try:
        d = _t(spark, sf_dir, "documents").select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.md5(F.col("text").cast("binary")).alias("digest"),
        )
        snap.commit_append(
            spark, root, d.repartitionByRange(4, "doc_id")
        )
        drop = dedup_clusters_verified(spark, sf_dir).filter(
            F.col("doc_id") != F.col("cluster_id")
        ).select("doc_id")
        v = snap.commit_delete_keys(spark, root, drop, ["doc_id"])
        assert snap.read_manifest(root, v)["op"] == "delete"
        legs = []
        for ver in (1, 2):
            legs.append(
                snap.read_snapshot(spark, root, ver).agg(
                    F.lit(ver).cast("int").alias("version"),
                    F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                    F.sum("n_chars").cast("bigint").alias("n_chars_sum"),
                    F.countDistinct("digest")
                    .cast("bigint")
                    .alias("n_digests"),
                )
            )
        out = legs[0].unionAll(legs[1]).orderBy("version")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)
