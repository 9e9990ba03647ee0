"""Streaming pipeline tests: availableNow drain must equal batch."""

import pytest
from pyspark.sql import functions as F

from metastore_spark.streaming import events as ev


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    # Copy a slice of the driver's events table into a stream source dir.
    d = str(tmp_path_factory.mktemp("events_stream"))
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch.repartition(4).write.mode("overwrite").parquet(d)
    return d


def _batch_windows(spark, stream_dir):
    raw = spark.read.parquet(stream_dir)
    batch = (
        raw.withColumn("event_time", ev.event_time_col(raw))
        .groupBy(F.window("event_time", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    return {
        (r["window"]["start"], r["event_type"]): (r["n"], r["v"])
        for r in batch.collect()
    }


def test_windowed_counts_match_batch(spark, stream_dir):
    stream = ev.read_event_stream(spark, stream_dir)
    ev.run_to_memory_sink(
        ev.windowed_event_counts(stream, window="1 hour", watermark=None),
        "win_counts_complete",
        output_mode="complete",
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("win_counts_complete").collect()
    }
    assert got == _batch_windows(spark, stream_dir)
    assert len(got) > 0


def test_windowed_counts_multibatch_matches_batch(spark, stream_dir):
    """The events_stream_hourly oracle contract must hold when the
    source arrives as MULTIPLE micro-batches (maxFilesPerTrigger=1
    over the 4-file source), not just a single-batch drain — the
    no-watermark complete-mode drain retains all window state, so
    later micro-batches cannot drop pre-horizon history."""
    stream = ev.read_event_stream(spark, stream_dir, max_files_per_trigger=1)
    ev.run_to_memory_sink(
        ev.windowed_event_counts(stream, window="1 hour", watermark=None),
        "win_counts_multibatch",
        output_mode="complete",
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("win_counts_multibatch").collect()
    }
    assert got == _batch_windows(spark, stream_dir)
    assert len(got) > 0


def test_windowed_counts_append_respects_watermark(spark, stream_dir):
    """Append mode must emit only watermark-closed windows — a strict
    subset of batch, with every withheld window inside the final
    watermark horizon (correct late-data semantics, not data loss)."""
    stream = ev.read_event_stream(spark, stream_dir)
    ev.run_to_memory_sink(
        ev.windowed_event_counts(stream, window="1 hour", watermark="2 hours"),
        "win_counts_append",
        output_mode="append",
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("win_counts_append").collect()
    }
    want = _batch_windows(spark, stream_dir)
    assert got.items() <= want.items()
    missing_starts = {k[0] for k in want.keys() - got.keys()}
    horizon = max(k[0] for k in want) - __import__("datetime").timedelta(hours=2)
    assert all(s >= horizon for s in missing_starts)


def test_stream_dedup(spark, stream_dir, tmp_path):
    # duplicate the source files → at-least-once delivery simulation
    dup_dir = str(tmp_path / "dup")
    base = spark.read.parquet(stream_dir)
    base.union(base).repartition(4).write.mode("overwrite").parquet(dup_dir)

    stream = ev.read_event_stream(spark, dup_dir)
    ev.run_to_memory_sink(ev.deduped_events(stream), "dedup_events")
    n = spark.table("dedup_events").count()
    assert n == base.count()
