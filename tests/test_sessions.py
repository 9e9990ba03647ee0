"""Sessionization tests: batch semantics on a crafted timeline, and
the stateful-streaming variant (applyInPandasWithState) agreeing with
batch for all gap-closed sessions.
"""

import pytest
from pyspark.sql import functions as F

from metastore_spark.operators import sessions as ss

MIN = 60 * 10**9  # one minute in nanos


@pytest.fixture(scope="module")
def timeline(spark):
    rows = [
        # user 1: two sessions (40-min gap between)
        (1, 0 * MIN, 1.0),
        (1, 10 * MIN, 2.0),
        (1, 50 * MIN, 4.0),
        (1, 55 * MIN, 8.0),
        # user 2: one session, exactly-30-min gap does NOT split
        (2, 0 * MIN, 1.0),
        (2, 30 * MIN, 2.0),
    ]
    return spark.createDataFrame(rows, "user_id bigint, ts bigint, value double")


def test_batch_sessionize(timeline):
    out = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["session_value"])
        for r in ss.session_stats(timeline).collect()
    }
    assert out == {
        (1, 1): (2, 3.0),
        (1, 2): (2, 12.0),
        (2, 1): (2, 3.0),
    }


def test_streaming_matches_batch_for_closed_sessions(spark, timeline, tmp_path):
    src = str(tmp_path / "events_src")
    timeline.withColumn("event_id", F.col("ts")).withColumn(
        "event_type", F.lit("x")
    ).withColumn("props", F.lit("{}")).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).repartition(2).write.mode("overwrite").parquet(src)

    from metastore_spark.streaming.events import read_event_stream

    import time

    stream = read_event_stream(spark, src)
    # live stream + short processing-time timeout: gap-closed sessions
    # emit on the data batch, open tails flush when the timeout fires
    # on a subsequent (empty) micro-batch
    out = ss.sessionize_stream(
        stream.select("user_id", "ts", "value"), timeout_ms=2000
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .start()
    )
    try:
        want = {
            (r["user_id"], r["session_seq"]): (r["n_events"], r["session_value"])
            for r in ss.session_stats(timeline).collect()
        }
        deadline = time.time() + 90
        got = {}
        while time.time() < deadline:
            got = {
                (r["user_id"], r["session_seq"]): (
                    r["n_events"],
                    r["session_value"],
                )
                for r in spark.table("sessions_stream").collect()
            }
            if got == want:
                break
            time.sleep(2)
        assert got == want  # gap-closed + timeout-flushed == batch exactly
    finally:
        q.stop()
