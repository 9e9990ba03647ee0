"""Sketch operator guarantees: bloom no-false-negatives + real pruning,
Misra-Gries candidate superset, and end-to-end exactness of the
sketch-accelerated queries against their naive plans."""

import pytest
from pyspark.sql import functions as F

from metastore_spark.operators.sketches import (
    bloom_build,
    bloom_prefilter,
    mg_candidates,
)

SF = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives(spark):
    members = spark.range(0, 500).select(
        F.col("id").cast("string").alias("k")
    )
    words = bloom_build(members, F.col("k"))
    # every member must survive the prefilter
    kept = bloom_prefilter(members, F.col("k"), words).count()
    assert kept == members.count()


def test_bloom_prunes_nonmembers(spark):
    members = spark.range(0, 500).select(
        F.col("id").cast("string").alias("k")
    )
    words = bloom_build(members, F.col("k"))
    probes = spark.range(10_000, 30_000).select(
        F.col("id").cast("string").alias("k")
    )
    fp = bloom_prefilter(probes, F.col("k"), words).count()
    # self-sized at 10 bits/key the theoretical fp is ~1%; assert an
    # order of magnitude of slack so the test pins "real pruning"
    # without flaking on hash luck
    assert fp < probes.count() * 0.05


def test_bloom_probe_is_codegen(spark):
    members = spark.range(0, 50).select(F.col("id").cast("string").alias("k"))
    words = bloom_build(members, F.col("k"))
    probe = bloom_prefilter(
        spark.range(0, 100), F.col("id").cast("string"), words
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # map-side only: no shuffle exchange in the probe (the word table
    # arrives by BroadcastExchange, which is the point). Plain
    # "Exchange" would also match the broadcast node; shuffles print
    # as "Exchange hashpartitioning"/"rangepartitioning".
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_mg_superset_of_heavy_keys(spark):
    # skewed synthetic: key 7 holds ~30% of rows, key 11 ~10%,
    # the rest spread over 1000 keys
    df = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 3, 7)
        .when(F.col("id") % 10 == 3, 11)
        .otherwise(F.col("id") % 1000 + 100)
        .alias("k")
    ).repartition(8)
    frac = 0.05
    cands = {r["k"] for r in mg_candidates(df, ["k"], frac).collect()}
    total = df.count()
    truth = {
        r["k"]
        for r in df.groupBy("k").count().filter(F.col("count") >= frac * total).collect()
    }
    assert truth  # the skew actually produced heavy keys
    assert truth <= cands


def test_mg_bounded_output(spark):
    # uniform keys, high cardinality: candidate count stays O(parts/frac)
    df = spark.range(0, 50_000).select((F.col("id") % 5000).alias("k")).repartition(4)
    frac = 0.01
    n_cands = mg_candidates(df, ["k"], frac).distinct().count()
    assert n_cands <= 4 * (int(2 / frac) + 1)


@pytest.mark.parametrize(
    "qname", ["lineitem_bloom_semijoin", "events_heavy_hitters"]
)
def test_sketch_queries_match_naive(spark, qname):
    """The sketch path must be invisible in the result: compare against
    the plain plan computed inline."""
    import metastore_spark.queries_sketch  # noqa: F401
    from metastore_spark.queries import REGISTRY

    out = REGISTRY[qname].fn(spark, SF)
    if qname == "lineitem_bloom_semijoin":
        orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_totalprice") > 450000.0
        )
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        naive = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_lines"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue"),
            )
        )
    else:
        from metastore_spark.catalog import load_table

        e = load_table(spark, SF, "events")
        total = e.count()
        naive = (
            e.groupBy("user_id", "event_type")
            .agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") >= 0.002 * total)
            .select(
                "user_id",
                "event_type",
                "cnt",
                F.round(F.col("cnt") / F.lit(total), 4).alias("share"),
            )
        )
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in naive.collect()}
    assert got == want


def test_mg_null_keys_are_candidates(spark):
    """A null key above the threshold must surface as a candidate —
    pandas groupby drops NaN groups by default, which would break the
    superset guarantee on null-heavy inputs."""
    df = spark.range(0, 1000).select(
        F.when(F.col("id") % 2 == 0, None).otherwise(F.col("id") % 100).alias("k")
    ).repartition(4)
    cands = mg_candidates(df, ["k"], 0.1).collect()
    assert any(r["k"] is None for r in cands)
