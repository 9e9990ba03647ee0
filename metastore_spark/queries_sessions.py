"""Sessionization + embedding-aggregation query bindings."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metastore_spark.operators.sessions import session_stats
from metastore_spark.queries import query, _t


@query(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 30*60*1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessioned AS (
      SELECT user_id, ts, value,
             1 + SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING
             ) AS session_seq
      FROM flagged
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT)     AS session_seq,
           EPOCH_US(MIN(ts))               AS session_start_us,
           EPOCH_US(MAX(ts))               AS session_end_us,
           CAST(COUNT(*) AS BIGINT)        AS n_events,
           ROUND(SUM(value), 2)            AS session_value
    FROM sessioned
    GROUP BY user_id, session_seq
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30 min): lag-flag + running sum, one
    shuffle on user_id. The canonical behavioral-analytics operator,
    value-hash-checked against DuckDB's window mirror."""
    e = _t(spark, sf_dir, "events")
    s = session_stats(e, gap=30 * 60 * 10**9)
    return s.select(
        "user_id",
        F.col("session_seq").cast("bigint").alias("session_seq"),
        F.expr("session_start div 1000").alias("session_start_us"),
        F.expr("session_end div 1000").alias("session_end_us"),
        "n_events",
        "session_value",
    )


@query(
    "emb_label_centroids",
    oracle="""
    SELECT label,
           CAST(t.i - 1 AS INTEGER)                 AS pos,
           ROUND(AVG(embedding[t.i]::DOUBLE), 6)    AS centroid_val,
           CAST(COUNT(*) AS BIGINT)                 AS n_vectors
    FROM embeddings
    CROSS JOIN generate_series(1, 64) AS t(i)  -- dim fixed at 64 in testdata
    GROUP BY label, t.i
    """,
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector aggregation: element-wise mean embedding per label (the
    k-means update step / class-centroid feature). posexplode →
    groupBy(label, pos) with partial aggregation — the exchange
    carries (labels × dim) partial sums, not vectors."""
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos", "val"
            ),
        )
        .groupBy("label", "pos")
        .agg(
            F.round(F.avg("val"), 6).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )
