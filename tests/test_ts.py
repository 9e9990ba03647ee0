"""Canonical event-time handling: every physical ts encoding must
normalize to the same TIMESTAMP_NTZ wall-clock, and the micros
round-trip must be exact and session-timezone-independent."""

import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

from metastore_spark import ts as T


def _ntz(spark):
    return spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 5, 12, 30, 0, 123456))],
        "id bigint, ts timestamp_ntz",
    )


def test_normalize_ntz_passthrough(spark):
    df = _ntz(spark)
    out = T.normalize_ts(df)
    assert out is df  # zero-cost when already canonical


def test_normalize_bigint_nanos(spark):
    us = 1704457800123456  # 2024-01-05 12:30:00.123456 UTC
    df = spark.createDataFrame([(1, us * 1000)], "id bigint, ts bigint")
    out = T.normalize_ts(df)
    assert isinstance(out.schema["ts"].dataType, TimestampNTZType)
    row = out.select(T.ts_us("ts").alias("us")).first()
    assert row["us"] == us


def test_normalize_instant_timestamp(spark):
    us = 1704457800123456
    df = spark.createDataFrame([(1, us)], "id bigint, us bigint").select(
        "id", F.timestamp_micros("us").alias("ts")
    )
    out = T.normalize_ts(df)
    assert isinstance(out.schema["ts"].dataType, TimestampNTZType)
    assert out.select(T.ts_us("ts").alias("u")).first()["u"] == us


def test_roundtrip_and_tz_independence(spark):
    df = _ntz(spark)
    want = df.select(T.ts_us("ts").alias("u")).first()["u"]
    # us -> ntz -> us round-trips exactly
    back = (
        spark.range(1)
        .select(F.lit(want).alias("u"))
        .select(T.us_to_ts("u").alias("t"))
        .select(T.ts_us("t").alias("u2"))
        .first()["u2"]
    )
    assert back == want
    # changing the session timezone must not move the value
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
        got = _ntz(spark).select(T.ts_us("ts").alias("u")).first()["u"]
        assert got == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_lit_helpers(spark):
    us = T.lit_us("2024-01-05 12:30:00")
    row = (
        spark.range(1)
        .select(T.lit_ts("2024-01-05 12:30:00").alias("t"))
        .select(T.ts_us("t").alias("u"))
        .first()
    )
    assert row["u"] == us
    assert T.lit_us("2024-01-05") == us - 12 * 3600 * 10**6 - 1800 * 10**6
