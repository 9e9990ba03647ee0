"""As-of join semantics + sketch accuracy tests."""

import datetime

import pytest
from pyspark.sql import functions as F

from metastore_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    ts = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), "e1"),
            (1, ts("2024-01-01 12:00:00"), "e2"),
            (2, ts("2024-01-01 11:00:00"), "e3"),
            (3, ts("2024-01-01 09:00:00"), "e4"),  # no prior state
        ],
        "uid bigint, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 09:00:00"), "s1"),
            (1, ts("2024-01-01 11:30:00"), "s2"),
            (2, ts("2024-01-01 11:00:00"), "s3"),  # exact tie
            (3, ts("2024-01-01 10:00:00"), "s4"),  # after left row
        ],
        "uid bigint, ts timestamp, state string",
    )
    return left, right


def test_asof_semantics(frames):
    left, right = frames
    out = asof_join(left, right, "uid", "ts", "ts", ["state"])
    got = {r["tag"]: r["state_asof"] for r in out.collect()}
    assert got == {
        "e1": "s1",  # latest at-or-before 10:00
        "e2": "s2",  # 11:30 state wins over 09:00
        "e3": "s3",  # tie → state visible at its own ts
        "e4": None,  # nothing prior
    }


def test_asof_preserves_left_rowcount(frames):
    left, right = frames
    assert asof_join(left, right, "uid", "ts", "ts", ["state"]).count() == left.count()


def test_asof_null_payload_not_resurrected(spark):
    """A newer right row with a NULL payload field must win as NULL —
    and multi-column payloads must come from ONE right row, never
    stitched across rows."""
    ts = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 12:00:00"), "e1")],
        "uid bigint, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 09:00:00"), "old", 5),
            (1, ts("2024-01-01 11:00:00"), None, None),  # newest: NULLs
        ],
        "uid bigint, ts timestamp, state string, v int",
    )
    out = asof_join(left, right, "uid", "ts", "ts", ["state", "v"]).first()
    assert out["state_asof"] is None
    assert out["v_asof"] is None


def test_core_boost_requires_published(spark):
    from metastore_spark.api import dataset_events_engine
    from tests import fixtures as fx

    e = dataset_events_engine(
        spark, fx.multiple_user_records(spark), fx.empty_events(spark)
    )
    # core user sees their own unlisted/private docs, but only the
    # PUBLISHED core doc gets the boost → it still ranks first, and
    # the unpublished core docs don't outrank other published docs
    out = e.search("dataset", "core", {"q": '"readme"'})
    names = [r["name"] for r in out["results"]]
    assert names[0] == "core-dataset"
    # un-published core docs must NOT be boosted: with equal BM25
    # scores the id tiebreak puts 'anonymous-dataset' second; the
    # always-boost bug would rank 'core-private-dataset' there
    assert names[1] == "anonymous-dataset"
    assert out["summary"]["total"] == 6  # 4 published + core's own 2


def test_lsh_bands_divisibility_guard(spark):
    from metastore_spark.dedup.ops import lsh_candidate_pairs

    sigs = spark.createDataFrame(
        [(1, list(range(100)))], "doc_id bigint, sig array<bigint>"
    )
    with pytest.raises(ValueError, match="divisible"):
        lsh_candidate_pairs(sigs, "doc_id", bands=32, num_perm=100)


def test_range_join_boundaries(spark):
    from metastore_spark.operators.rangejoin import range_join_binned

    points = spark.createDataFrame(
        [(i, t) for i, t in enumerate([5, 10, 19, 20, 35, 99])],
        "pid bigint, ts bigint",
    )
    intervals = spark.createDataFrame(
        [
            ("a", 10, 20),   # [10,20): hits 10,19 — NOT 20 (exclusive)
            ("b", 0, 100),   # spans many bins: hits everything
            ("c", 35, 36),   # 1-unit interval inside one bin
        ],
        "iid string, s bigint, e bigint",
    )
    out = range_join_binned(points, intervals, "ts", "s", "e", bin_width=10)
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    want = {(1, "a"), (2, "a")} | {(i, "b") for i in range(6)} | {(4, "c")}
    assert got == want


def test_approx_distinct_within_rsd(spark):
    df = spark.range(10000).select(
        (F.col("id") % 1000).alias("uid"), F.lit("t").alias("g")
    )
    approx = df.groupBy("g").agg(
        F.approx_count_distinct("uid", rsd=0.02).alias("a")
    ).first()["a"]
    assert abs(approx - 1000) / 1000 < 0.06  # 3×rsd margin


def test_grouped_topk_equals_naive_window(spark):
    from pyspark.sql import Window

    from metastore_spark.operators.topk import grouped_topk

    df = (
        spark.range(0, 5000, numPartitions=8)
        .select(
            F.col("id"),
            (F.col("id") % 7).alias("g"),
            # non-injective score: forces tie-breaking through the
            # unique id to matter
            (F.col("id") * 37 % 101).alias("s"),
        )
    )
    got = grouped_topk(df, ["g"], [("s", False), ("id", True)], k=4,
                       rank_col="rnk")
    w = Window.partitionBy("g").orderBy(F.desc("s"), F.asc("id"))
    want = (
        df.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 4)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_grouped_topk_single_row_groups(spark):
    from metastore_spark.operators.topk import grouped_topk

    df = spark.range(5).select(F.col("id"), F.col("id").alias("g"))
    out = grouped_topk(df, ["g"], [("id", True)], k=3).collect()
    assert len(out) == 5
