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


def test_approx_distinct_within_rsd(spark):
    df = spark.range(10000).select(
        (F.col("id") % 1000).alias("uid"), F.lit("t").alias("g")
    )
    approx = df.groupBy("g").agg(
        F.approx_count_distinct("uid", rsd=0.02).alias("a")
    ).first()["a"]
    assert abs(approx - 1000) / 1000 < 0.06  # 3×rsd margin
