"""Streaming query binding: the windowed-aggregation pipeline drained
with availableNow, oracled against DuckDB's batch hourly rollup —
Structured Streaming's batch-equivalence guarantee, checked
cross-engine.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metastore_spark.queries import query
from metastore_spark.streaming import events as ev

_counter = itertools.count()


@query(
    "events_stream_hourly",
    oracle="""
    SELECT EPOCH_US(date_trunc('hour', ts)) AS window_start_us,
           event_type,
           CAST(COUNT(*) AS BIGINT)         AS n_events,
           ROUND(SUM(value), 2)             AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming hourly rollup of the events table.

    readStream over the parquet directory → tumbling 1h windows →
    availableNow drain into a memory sink (complete mode). The result
    must equal the batch/SQL computation — the streaming/batch
    unification contract, verified against DuckDB.
    """
    name = f"events_stream_hourly_{next(_counter)}"
    stream = ev.read_event_stream(spark, f"{sf_dir}/events.parquet")
    ev.run_to_memory_sink(
        ev.windowed_event_counts(stream, window="1 hour"),
        name,
        output_mode="complete",
    )
    return spark.table(name).select(
        F.unix_micros("window_start").alias("window_start_us"),
        "event_type",
        "n_events",
        F.round("total_value", 2).alias("total_value"),
    )
