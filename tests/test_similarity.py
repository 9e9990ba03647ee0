"""Similarity-search correctness: brute-force vs blocked GEMM vs IVF."""

import math

import pytest

from metastore_spark import similarity as sim


def _vec(i: int, dim: int = 8) -> list[float]:
    # deterministic unit-ish vectors; i and i+1 are close
    return [math.sin(0.3 * i + 0.1 * j) + (1.5 if j == i % dim else 0.0)
            for j in range(dim)]


@pytest.fixture(scope="module")
def emb(spark):
    rows = [(i, _vec(i)) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_topk_self_first(emb):
    q = _vec(7)
    out = sim.cosine_topk(emb, q, k=5).collect()
    assert out[0]["vec_id"] == 7
    assert out[0]["cos_sim"] == 1.0


def test_blocked_matches_naive(emb):
    naive = sim.cosine_near_pairs(emb, threshold=0.9, n_planes=0)
    blocked = sim.cosine_near_pairs_blocked(emb, threshold=0.9, block_size=16)
    a = {(r["id_a"], r["id_b"], r["cos_sim"]) for r in naive.collect()}
    b = {(r["id_a"], r["id_b"], r["cos_sim"]) for r in blocked.collect()}
    assert a == b
    assert len(a) > 0


def test_ivf_recall_against_exact(emb):
    centroids = [_vec(0), _vec(13), _vec(27)]
    indexed = sim.ivf_assign(emb, centroids)
    q = _vec(13)
    exact = [r["vec_id"] for r in sim.cosine_topk(emb, q, k=5).collect()]
    approx = [
        r["vec_id"]
        for r in sim.ivf_topk(indexed, centroids, q, k=5, nprobe=2).collect()
    ]
    # nprobe=2 of 3 partitions: recall@5 must be high on clustered data
    assert len(set(exact) & set(approx)) >= 3


def test_lsh_blocking_subset_of_exact(emb):
    exact = sim.cosine_near_pairs(emb, threshold=0.9, n_planes=0)
    lsh = sim.cosine_near_pairs(emb, threshold=0.9, n_planes=4, dim=8)
    a = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    b = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    assert b <= a  # LSH may miss pairs but never invents them
    assert len(b) > 0  # high-sim pairs agree on few hyperplanes


def test_semdedup_gemm_matches_exact_query(spark):
    # the GEMM kernel (scale path) must agree with the oracle-exact
    # fold-expression registry query on ids and (to float tolerance)
    # on similarities
    import metastore_spark.queries_similarity as qsim

    sf = "/root/testdata/sf0.001"
    exact = {
        (r["vec_id"], r["centroid_id"]): r["max_sim_to_keeper"]
        for r in qsim.emb_semdedup(spark, sf).collect()
    }
    from metastore_spark.catalog import load_table

    emb = load_table(spark, sf, "embeddings")
    cents = sim.sampled_centroids(emb, k=8)
    fast = {
        (r["vec_id"], r["centroid_id"]): r["max_sim_to_keeper"]
        for r in sim.semdedup_prune(emb, cents, threshold=0.3).collect()
    }
    assert set(exact) == set(fast)
    assert len(exact) > 0
    for k in exact:
        assert abs(exact[k] - fast[k]) < 1e-3, k


def test_sq8_topk_matches_exact_topk(spark):
    """At 8-bit precision with 5x candidate head-room the quantized
    path should recover the exact top-10 on the test corpus."""
    from metastore_spark import similarity as sim
    from pyspark.sql import functions as F

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    row = e.filter(F.col("vec_id") == 0).first()
    qvec = [float(x) for x in row["embedding"]]
    exact = [r["vec_id"] for r in sim.cosine_topk(e, qvec, k=10).collect()]
    quant = [
        r["vec_id"]
        for r in sim.sq8_topk(e, qvec, sim.corpus_maxabs(e), k=10).collect()
    ]
    assert quant == exact


def test_pq_topk_recall(spark):
    """16-codeword int8 PQ with 5x rerank head-room: top-1 must be the
    query itself and recall@10 vs exact >= 0.7 on the test corpus
    (measured 0.8; the oracle pins exact behavior, this pins quality)."""
    from metastore_spark import similarity as sim
    from pyspark.sql import functions as F

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    row = e.filter(F.col("vec_id") == 0).first()
    qvec = [float(x) for x in row["embedding"]]
    cents = [
        [float(x) for x in r["embedding"]]
        for r in e.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    ]
    exact = {r["vec_id"] for r in sim.cosine_topk(e, qvec, k=10).collect()}
    pq_rows = sim.pq_topk(
        e, qvec, cents, sim.corpus_maxabs(e), k=10, n_cand=50
    ).collect()
    assert pq_rows[0]["vec_id"] == 0
    assert len(exact & {r["vec_id"] for r in pq_rows}) >= 7


def test_int_gram_partials_exact(spark):
    """Partition-wise int64 GEMM partials must reduce to the exact
    arbitrary-precision Gram matrix regardless of partitioning — the
    contract emb_pca_power_projection's power iteration relies on."""
    from pyspark.sql import functions as F

    from metastore_spark import similarity as sim

    e = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .limit(100)
        .select(
            "vec_id",
            F.expr(
                "transform(embedding, x -> "
                "cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint))"
            ).alias("qv"),
        )
    )
    rows = [[int(x) for x in r["qv"]] for r in e.collect()]
    dim = 64
    expected = [
        [sum(v[i] * v[j] for v in rows) for j in range(dim)]
        for i in range(dim)
    ]
    for nparts in (1, 7):
        parts = sim.int_gram_partials(e.repartition(nparts), dim=dim)
        got = [[0] * dim for _ in range(dim)]
        n = 0
        for flat, pn in parts:
            n += pn
            for i in range(dim):
                for j in range(dim):
                    got[i][j] += flat[i * dim + j]
        assert n == len(rows)
        assert got == expected


def test_trained_codebooks_beat_prefix_recall(spark):
    """VERDICT r6 task 3 acceptance: the k-means-trained PQ codebook
    and IVF coarse quantizer must match-or-beat the vec_id-prefix
    stand-ins on panel-total recall@10 (per-query dips are expected —
    the gate is the curve a deployment would cite)."""
    import __spark_entry__  # noqa: F401 — registers query modules
    from metastore_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"

    def total_hits(name):
        return sum(
            int(r["hits"]) for r in REGISTRY[name].fn(spark, sf).collect()
        )

    assert total_hits("ann_pq_recall_trained") >= total_hits("ann_pq_recall")
    assert total_hits("ann_ivf_recall_trained") >= total_hits(
        "ann_ivf_recall"
    )


def test_cosine_near_pairs_per_vec_cap(spark):
    """VERDICT r9 task 3: per_vec_cap keeps exactly the top-cap
    neighbors per id_a (rounded sim desc, id_b tiebreak) in BOTH the
    exact and the SRP-blocked mode — each capped result must equal its
    own uncapped result put through the reference window."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(5)
    rows = [
        (i, [rng.random() for _ in range(64)]) for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    w = Window.partitionBy("id_a").orderBy(
        F.col("cos_sim").desc(), F.col("id_b").asc()
    )
    key = lambda r: (r["id_a"], r["id_b"], r["cos_sim"])

    for n_planes in (0, 8):
        capped = sim.cosine_near_pairs(
            emb, threshold=0.5, dim=64, n_planes=n_planes, per_vec_cap=3
        ).collect()
        per_a: dict = {}
        for r in capped:
            per_a.setdefault(r["id_a"], []).append(r)
        assert per_a and all(len(v) <= 3 for v in per_a.values())
        want = (
            sim.cosine_near_pairs(
                emb, threshold=0.5, dim=64, n_planes=n_planes
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .drop("rn")
            .collect()
        )
        assert sorted(map(key, capped)) == sorted(map(key, want)), n_planes
