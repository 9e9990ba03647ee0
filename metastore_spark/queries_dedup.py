"""Dedup query bindings on the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metastore_spark.dedup import ops as dd
from metastore_spark.queries import query, _t


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


@query("dedup_minhash_pairs", oracle=None)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (jaccard_est ≥ 0.8). Non-SQL: the
    banding/bucket join; correctness pinned by tests/test_dedup.py."""
    return dd.minhash_dedup_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        num_perm=64, bands=16, threshold=0.8,
    )


@query("dedup_simhash_pairs", oracle=None)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 3 of 63 bits), prefix-bucketed.
    Correctness pinned by tests/test_dedup.py."""
    return dd.simhash_near_pairs(_t(spark, sf_dir, "documents"), "text", "doc_id")


@query("dedup_minhash_clusters", oracle=None)
def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup groups: MinHash+LSH pairs → connected components
    (iterative min-label propagation — transitive closure the pair
    list can't express; non-SQL). Returns non-singleton members."""
    from metastore_spark.dedup.cluster import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = dd.minhash_dedup_pairs(
        d, "text", "doc_id", num_perm=64, bands=16, threshold=0.8
    ).persist()
    cc = connected_components(d.select("doc_id"), pairs)
    return cc.filter(F.col("doc_id") != F.col("cluster_id")).unionByName(
        cc.join(
            pairs.select(F.col("id_a").alias("doc_id")).distinct(), "doc_id"
        ).filter(F.col("doc_id") == F.col("cluster_id"))
    )


@query(
    "dedup_jaccard_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             list_distinct(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'),
               t -> t <> '')) AS tset
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.tset, b.tset)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.tset, b.tset))), 4) AS jaccard
    FROM toks a JOIN toks b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.tset, b.tset)) AS DOUBLE)
          / len(list_distinct(list_concat(a.tset, b.tset))) >= 0.8
    """,
)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard near-dups, blocked by lang.

    The blocked equi-join is the scale pattern: candidates only form
    inside a block (here lang; production adds a length bucket), then
    exact set arithmetic verifies. JVM-side array_intersect/union.
    """
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.array_distinct(
            F.array_remove(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), "")
        ).alias("tset"),
    )
    a = toks.alias("a")
    b = toks.alias("b")
    inter = F.size(F.array_intersect(F.col("a.tset"), F.col("b.tset")))
    union = F.size(F.array_union(F.col("a.tset"), F.col("b.tset")))
    jac = inter.cast("double") / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.round(jac, 4).alias("jaccard"),
            jac.alias("_jac"),
        )
        .filter(F.col("_jac") >= 0.8)
        .drop("_jac")
    )


# Exact 3-gram-shingle-Jaccard pair CTEs, shared by the verified-pairs
# oracle and the clustering oracle (one definition, no drift).
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
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE)
               / len(list_distinct(list_concat(a.sset, b.sset))) AS jac
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sset, b.sset))) >= 0.8
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
    d = _t(spark, sf_dir, "documents")
    # sigs feed both sides of the banding self-join: cache, or the
    # signature pipeline runs once per side
    sigs = dd.minhash_signatures(d, "text", "doc_id", num_perm=64, k=3).cache()
    cands = dd.lsh_candidate_pairs(
        sigs, "doc_id", "sig", bands=32, num_perm=64
    ).cache()
    # exact shingle sets ONLY for docs that appear in a candidate pair
    # (at scale the candidate universe is a tiny fraction of the
    # corpus; verifying never touches the rest), built from the
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
    a = ssets.select(F.col("doc_id").alias("id_a"), F.col("sset").alias("sa"))
    b = ssets.select(F.col("doc_id").alias("id_b"), F.col("sset").alias("sb"))
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
