"""Sessionization + embedding-aggregation query bindings."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metastore_spark.operators.sessions import session_stats
from metastore_spark.queries import query, _t
from metastore_spark.ts import ts_us, us_to_ts


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
    e = _t(spark, sf_dir, "events").withColumn("ts", ts_us("ts"))
    s = session_stats(e, gap=30 * 60 * 10**6)
    return s.select(
        "user_id",
        F.col("session_seq").cast("bigint").alias("session_seq"),
        F.col("session_start").alias("session_start_us"),
        F.col("session_end").alias("session_end_us"),
        "n_events",
        "session_value",
    )


@query(
    "emb_label_centroids",
    oracle="""
    SELECT label,
           CAST(t.i - 1 AS INTEGER)                 AS pos,
           ROUND(AVG(embedding[t.i]::DOUBLE), 6) + 0.0 AS centroid_val,
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
            (F.round(F.avg("val"), 6) + F.lit(0.0)).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


@query(
    "events_peak_concurrency",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 30*60*1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessioned AS (
      SELECT user_id, ts,
             1 + SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING
             ) AS session_seq
      FROM flagged
    ),
    sess AS (
      SELECT EPOCH_US(MIN(ts)) AS start_us, EPOCH_US(MAX(ts)) AS end_us
      FROM sessioned GROUP BY user_id, session_seq
    ),
    b AS (
      SELECT start_us AS t, 1 AS d FROM sess
      UNION ALL
      SELECT end_us, -1 FROM sess
    ),
    net AS (SELECT t, SUM(d) AS nd FROM b GROUP BY t),
    run AS (SELECT t, SUM(nd) OVER (ORDER BY t) AS conc FROM net),
    ranked AS (
      SELECT t, conc,
             ROW_NUMBER() OVER (PARTITION BY t // 86400000000
                                ORDER BY conc DESC, t) AS rn
      FROM run
    )
    SELECT STRFTIME(make_timestamp(t), '%Y-%m-%d') AS day,
           CAST(conc AS BIGINT) AS peak_concurrency,
           t AS at_us
    FROM ranked WHERE rn = 1
    """,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily peak concurrent sessions via an interval sweep: session
    boundaries become +1/-1 deltas, netted per timestamp (which IS
    end-exclusive overlap semantics — a session ending exactly when
    another starts never overlaps it), then a running sum gives the
    concurrency curve and each day reports its maximum and when it
    first occurred.

    The oracle's `SUM() OVER (ORDER BY t)` is the textbook sweep but
    moves every boundary through one task. Here the running sum is a
    two-phase distributed prefix sum (same Blelloch structure as
    docs_pack_sequences): per-day partitions compute local cumulative
    sums in parallel, day totals (one row per day) roll into
    broadcast offsets, and local+offset reconstructs the exact global
    curve — no single-partition window over the data anywhere.
    """
    e = _t(spark, sf_dir, "events").withColumn("ts", ts_us("ts"))
    s = session_stats(e, gap=30 * 60 * 10**6)
    sess = s.select(
        F.col("session_start").alias("start_us"),
        F.col("session_end").alias("end_us"),
    )
    b = sess.select(F.col("start_us").alias("t"), F.lit(1).alias("d")).unionAll(
        sess.select(F.col("end_us").alias("t"), F.lit(-1).alias("d"))
    )
    day_us = 86_400_000_000
    net = (
        b.groupBy("t")
        .agg(F.sum("d").alias("nd"))
        .withColumn("bucket", F.expr(f"t div {day_us}"))
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = net.withColumn("local_cum", F.sum("nd").over(w_local))
    # one row per day: cumulative offset of all earlier days
    w_off = (
        Window.partitionBy()
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        net.groupBy("bucket")
        .agg(F.sum("nd").alias("btot"))
        .select(
            "bucket",
            F.coalesce(F.sum("btot").over(w_off), F.lit(0)).alias("offset"),
        )
    )
    run = local.join(F.broadcast(offsets), "bucket").withColumn(
        "conc", F.col("local_cum") + F.col("offset")
    )
    w_rank = Window.partitionBy("bucket").orderBy(
        F.desc("conc"), F.asc("t")
    )
    return (
        run.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            F.date_format(us_to_ts("t"), "yyyy-MM-dd").alias("day"),
            F.col("conc").cast("long").alias("peak_concurrency"),
            F.col("t").alias("at_us"),
        )
    )
