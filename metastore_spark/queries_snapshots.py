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
    # v2 store key: v2 added manifest min/max stats on user_id —
    # pre-stats stores must not satisfy the build-once check
    root = os.path.join(_SNAP_ROOT, f"events-v2-{fp}")
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
        stats_cols=["user_id"],  # manifest min/max -> file skipping
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


def _serving_store(spark: SparkSession, sf_dir: str) -> tuple[str, int]:
    """The events corpus SERVED through the snapshot table format
    end-to-end (VERDICT r6 task 1) — the lifecycle a 100 TB metastore
    runs on its one mutating table (the reference's append-only
    events kind, /root/reference/metastore/models.py:82-85):

    v1-v3  Structured Streaming ingest (maxFilesPerTrigger=1 ->
           foreachBatch `snapshot_sink`), one exactly-once snapshot
           commit per micro-batch;
    v4     `compact` folds the small-files ingest tail (identical
           rows, one segment);
    v5     GDPR erasure as a `commit_delete_where` COW commit through
           `commit_with_retry` — the victim user's rows are rewritten
           out of affected files only.

    Returns (root, victim_user). Built once per corpus fingerprint
    (serve.py idiom: process-private build dir, atomic rename, losers
    discard); ``ts`` is projected to epoch-micros int64 at ingest so
    the stored table is encoding-canonical."""
    from metastore_spark.serve import _fingerprint
    from metastore_spark.ts import ts_us

    src = os.path.join(sf_dir, "events.parquet")
    fp = _fingerprint([src])
    root = os.path.join(_SNAP_ROOT, f"serving-{fp}")
    victim_path = os.path.join(root, "victim.json")
    if snap.current_version(root) >= 5 and os.path.exists(victim_path):
        import json

        with open(victim_path) as fh:
            return root, json.load(fh)["user_id"]

    base = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        ts_us("ts").alias("ts_us"),
    )
    victim = int(
        base.filter(F.col("event_type") == "click")
        .agg(F.min("user_id"))
        .first()[0]
    )
    os.makedirs(_SNAP_ROOT, exist_ok=True)
    import tempfile

    tmp = f"{root}.build-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    feed = tempfile.mkdtemp(prefix="snap_feed_")
    ckpt = tempfile.mkdtemp(prefix="snap_ckpt_")
    try:
        base.repartition(3).write.mode("overwrite").parquet(feed)
        stream = (
            spark.readStream.schema(spark.read.parquet(feed).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        snap.ingest_stream(stream, tmp, ckpt, stream_id=f"events-{fp[:8]}")
        assert snap.current_version(tmp) == 3
        snap.commit_with_retry(
            tmp, lambda: snap.compact(spark, tmp, target_files=1)
        )
        snap.commit_with_retry(
            tmp,
            lambda: snap.commit_delete_where(
                spark, tmp, F.col("user_id") == victim
            ),
        )
        import json

        with open(os.path.join(tmp, "victim.json"), "w") as fh:
            json.dump({"user_id": victim}, fh)
        try:
            os.rename(tmp, root)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost the build race
    finally:
        shutil.rmtree(feed, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
    return root, victim


@query(
    "events_snapshot_serving",
    oracle="""
    WITH victim AS (
      SELECT MIN(user_id) AS u FROM events WHERE event_type = 'click'
    ),
    pre AS (SELECT * FROM events),
    post AS (
      SELECT e.* FROM events e, victim v WHERE e.user_id IS DISTINCT FROM v.u
    )
    SELECT 4 AS version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clicks,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_cents_sum,
           CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us
    FROM pre
    UNION ALL
    SELECT 5,
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT user_id) AS BIGINT),
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT),
           CAST(MIN(epoch_us(ts)) AS BIGINT),
           CAST(MAX(epoch_us(ts)) AS BIGINT)
    FROM post
    ORDER BY version
    """,
)
def events_snapshot_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events served THROUGH the snapshot table format (VERDICT r6
    task 1): the store is built by streaming ingest (3 exactly-once
    micro-batch commits) + compaction + a COW GDPR-erasure commit, and
    this query reads it at two isolation points:

    - version 4 (PINNED pre-delete): a reader holding the pre-erasure
      snapshot still reproduces the full corpus bit-for-bit — the
      oracle leg recomputes it from the raw table, so a COW delete
      that touched a carried file, or a compaction that dropped an
      ingest batch, hash-mismatches;
    - version 5 (head): the erased user is gone and everything else
      is untouched — the oracle filters the raw table by the same
      deterministic victim (MIN user_id among clicks; NULL-safe
      semantics on both engines).

    Scale shape: each leg opens exactly its manifest's segment file
    lists; the erasure rewrote only affected files (the corpus was
    just compacted, so here that is the one folded segment — on a
    user_id-clustered production layout it is the victim's cell
    files, cf. layout.forget_user); aggregates are exact int64. At
    100 TB this is the architecture: ingest appends O(batch), GDPR
    deletes O(affected), pinned readers immune to both, one commit
    protocol under all three."""
    root, _victim = _serving_store(spark, sf_dir)
    assert snap.read_manifest(root, 5)["op"] == "delete"
    legs = []
    for v in (4, 5):
        legs.append(
            snap.read_snapshot(spark, root, v).agg(
                F.lit(v).cast("int").alias("version"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.countDistinct("user_id").cast("bigint").alias("n_users"),
                F.sum(
                    (F.col("event_type") == "click").cast("bigint")
                ).cast("bigint").alias("n_clicks"),
                F.sum(
                    F.floor(F.col("value") * 100 + 0.5).cast("bigint")
                ).cast("bigint").alias("value_cents_sum"),
                F.min("ts_us").cast("bigint").alias("min_ts_us"),
                F.max("ts_us").cast("bigint").alias("max_ts_us"),
            )
        )
    return legs[0].unionAll(legs[1]).orderBy("version")


@query(
    "events_snapshot_pruned_scan",
    oracle="""
    WITH cutoff AS (SELECT MAX(user_id) // 10 AS cu,
                           MAX(user_id) * 3 // 4 AS lo FROM events),
    v2 AS (
      SELECT user_id, event_type, value FROM events
      WHERE event_id % 3 IN (0, 1)
    ),
    v3 AS (
      SELECT v2.* FROM v2, cutoff
      WHERE NOT (user_id < cu AND event_type = 'click')
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MIN(user_id) AS BIGINT) AS min_user,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_cents_sum
    FROM v3, cutoff
    WHERE user_id >= lo
    """,
)
def events_snapshot_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANIFEST-STATS FILE SKIPPING on the snapshot events table: the
    store's appends are range-clustered on user_id with footer-lifted
    min/max recorded per file in the segment manifests (stats_cols
    opt-in, Iceberg data-skipping shape), so a top-quartile user_id
    range read resolves its file list FROM METADATA — the query
    self-checks that the pruned list is a strict subset of the head's
    files before scanning, then applies the equivalent row filter and
    aggregates. The oracle recomputes the head state (v3 of the
    timetravel lifecycle) and the same range from the raw corpus.

    Scale shape: this is the layer partition pruning can't reach —
    files inside one directory, skipped by per-file stats without
    opening a footer. On a 100 TB user_id-clustered events table a
    user-range read (the GDPR audit shape) opens O(matching files);
    the erasure-key clustering that made COW deletes cheap makes these
    reads cheap for the same reason."""
    root = _events_table(spark, sf_dir)
    head = snap.current_version(root)
    m = snap.read_manifest(root, head)
    lo = int(
        snap.read_snapshot(spark, root, head)
        .agg(F.expr("max(user_id) * 3 div 4"))
        .first()[0]
    )
    pruned = snap.pruned_manifest_files(root, m, {"user_id": (lo, None)})
    n_all = len(snap.manifest_files(root, m))
    assert 0 < len(pruned) < n_all, (len(pruned), n_all)
    return (
        snap.read_snapshot(spark, root, head, prune={"user_id": (lo, None)})
        .filter(F.col("user_id") >= lo)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.min("user_id").cast("bigint").alias("min_user"),
            F.sum(
                F.floor(F.col("value") * 100 + 0.5).cast("bigint")
            ).cast("bigint").alias("value_cents_sum"),
        )
    )


@query(
    "events_snapshot_incremental",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_cents_sum
    FROM events WHERE event_id % 3 = 1
    """,
)
def events_snapshot_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL CONSUMPTION of the snapshot events table (Delta
    CDF's append slice): `read_appends(root, since_version=1)` returns
    exactly the rows the v2 append committed — the downstream
    training-pipeline checkpoint loop ("only the documents ingested
    since my last run"). The window read opens ONLY the appending
    commits' new segments (op-aware: the v3 COW delete contributes
    nothing), so consumption costs O(delta files) by construction —
    never a table scan, never a row diff. The oracle recomputes the
    same slice from the raw corpus via the deterministic batch rule
    (event_id % 3 = 1)."""
    root = _events_table(spark, sf_dir)
    inc = snap.read_appends(spark, root, since_version=1, until_version=3)
    return inc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum(
            F.floor(F.col("value") * 100 + 0.5).cast("bigint")
        ).cast("bigint").alias("value_cents_sum"),
    )
