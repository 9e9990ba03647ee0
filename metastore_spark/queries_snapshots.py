"""Registry bindings for the snapshot table format (time travel, COW
deletes, retention) — `metastore_spark/sources/snapshots.py`.

Reference behavior served: the events kind is the reference's
append-only stream (/root/reference/metastore/models.py:82-85); a real
deployment of it needs transactional appends, targeted erasure, and
reproducible historical reads — the snapshot store supplies all three
under the same parquet files every other operator reads.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metastore_spark.queries import query, _t
from metastore_spark.sources import snapshots as snap

_SNAP_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark-warehouse",
    "snapshots",
)


def _events_table(spark: SparkSession, sf_dir: str) -> str:
    """Build-once snapshot table over the events corpus: three
    committed versions (append, append, COW delete), keyed by corpus
    content like every serving store (serve.py idiom: stage under a
    process-private dir, atomic-rename the COMPLETE table into place,
    losers discard)."""
    from metastore_spark.serve import _fingerprint

    src = os.path.join(sf_dir, "events.parquet")
    fp = _fingerprint([src])
    root = os.path.join(_SNAP_ROOT, f"events-{fp}")
    if snap.current_version(root) >= 3:
        return root

    base = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    cutoff = int(base.agg(F.max("user_id")).first()[0]) // 10
    os.makedirs(_SNAP_ROOT, exist_ok=True)
    tmp = f"{root}.build-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    # appends land range-partitioned on user_id so the later range
    # delete AFFECTS some files and carries the rest by reference —
    # the file layout a real table would have (cluster by the
    # erasure/retention key), and the layout that makes COW cheap
    snap.commit_append(
        spark,
        tmp,
        base.filter(F.col("event_id") % 3 == 0).repartitionByRange(
            4, "user_id"
        ),
    )
    snap.commit_append(
        spark,
        tmp,
        base.filter(F.col("event_id") % 3 == 1).repartitionByRange(
            4, "user_id"
        ),
    )
    snap.commit_delete_where(
        spark,
        tmp,
        (F.col("user_id") < cutoff) & (F.col("event_type") == "click"),
    )
    try:
        os.rename(tmp, root)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost the build race
    return root


@query(
    "events_snapshot_timetravel",
    oracle="""
    WITH cutoff AS (SELECT MAX(user_id) // 10 AS cu FROM events),
    v1 AS (
      SELECT user_id, event_type, value FROM events WHERE event_id % 3 = 0
    ),
    v2 AS (
      SELECT user_id, event_type, value FROM events
      WHERE event_id % 3 IN (0, 1)
    ),
    v3 AS (
      SELECT v2.* FROM v2, cutoff
      WHERE NOT (user_id < cu AND event_type = 'click')
    )
    SELECT 1 AS version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_cents_sum
    FROM v1
    UNION ALL
    SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(COUNT(DISTINCT user_id) AS BIGINT),
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
    FROM v2
    UNION ALL
    SELECT 3, CAST(COUNT(*) AS BIGINT), CAST(COUNT(DISTINCT user_id) AS BIGINT),
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
    FROM v3
    ORDER BY version
    """,
)
def events_snapshot_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel through the snapshot table format: three committed
    versions of the events table (append third, append third, COW
    range-delete of one event type) read back BY VERSION through
    manifests, each reduced to (n_rows, n_users, value_cents_sum).
    The oracle recomputes every version's row set from the base table,
    so a manifest that loses a carried-over file, double-counts a
    rewritten one, or leaks a deleted row hash-mismatches.

    Scale shape: each historical read opens exactly the manifest's
    file list (no table-wide listing); the COW delete scanned the
    parent snapshot ONCE (hidden _metadata.file_path column) and
    rewrote only files containing matching rows. Sums are exact int64
    cents — associative, so partial aggregation order can't split the
    engines. At 100 TB: appends cost O(delta), deletes cost O(affected
    files), and a pinned version is reproducible forever (the
    training-data provenance story).
    """
    root = _events_table(spark, sf_dir)
    legs = []
    for v in (1, 2, 3):
        legs.append(
            snap.read_snapshot(spark, root, v).agg(
                F.lit(v).cast("int").alias("version"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.countDistinct("user_id").cast("bigint").alias("n_users"),
                F.sum(
                    F.floor(F.col("value") * 100 + 0.5).cast("bigint")
                ).cast("bigint").alias("value_cents_sum"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionAll(leg)
    return out.orderBy("version")


@query(
    "events_stream_snapshot_ingest",
    oracle="""
    SELECT 5 AS head_version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_cents_sum
    FROM events
    """,
)
def events_stream_snapshot_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming ingest INTO the snapshot table format, end-to-end:
    the event feed split into 4 micro-batches (maxFilesPerTrigger=1)
    drives foreachBatch exactly-once commits (one snapshot version per
    batch, idempotence ledger = the manifest history itself), then
    compaction rewrites the 4 small-file versions into one file as
    v5 with the IDENTICAL row set. The head read must equal the batch
    aggregate over the full feed — proving no batch was dropped,
    double-committed, or lost in the compaction cutover. head_version
    pins the structure: 4 ingest commits + 1 compact, exactly.

    Scale shape: this is the 100 TB ingest loop — micro-batch appends
    cost O(delta) each, compaction amortizes the small-files tax
    without blocking readers (older versions stay readable), and a
    crash at ANY point replays into the same history
    (tests/test_snapshots.py crash-injection)."""
    import hashlib
    import tempfile

    from metastore_spark.catalog import load_table
    from metastore_spark.streaming.events import read_event_stream

    src = tempfile.mkdtemp(prefix="snap_src_")
    ckpt = tempfile.mkdtemp(prefix="snap_ckpt_")
    root = os.path.join(tempfile.mkdtemp(prefix="snap_tbl_"), "t")
    try:
        load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value"
        ).repartition(4).write.mode("overwrite").parquet(src)
        stream = read_event_stream(spark, src, max_files_per_trigger=1)
        snap.ingest_stream(
            stream,
            root,
            ckpt,
            stream_id=hashlib.md5(ckpt.encode()).hexdigest()[:12],
        )
        snap.compact(spark, root, target_files=1)
        out = snap.read_snapshot(spark, root).agg(
            F.lit(snap.current_version(root)).cast("int").alias("head_version"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum(
                F.floor(F.col("value") * 100 + 0.5).cast("bigint")
            ).cast("bigint").alias("value_cents_sum"),
        )
        # the tmp table must outlive the driver's collect: materialize
        # the 1-row result before cleanup
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)
