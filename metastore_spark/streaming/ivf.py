"""Streaming IVF index maintenance: micro-batched embedding ingest
into a centroid-partitioned ANN index store.

The serving-side index (`similarity.ivf_assign` materialized
partitioned by ``centroid_id``, see queries_similarity.ann_ivf_topk)
is built once per corpus; this module is the INGEST side — new
vectors arrive as an append-only feed and must become probeable
without rebuilding the index. The coarse quantizer is FROZEN (trained
offline / deterministic sample): assignment of a vector depends only
on the vector and the centroids, so per-batch assignment is
embarrassingly batch-associative — the maintained store equals the
batch-built index for any micro-batch split of the feed.

Replay safety (at-least-once foreachBatch): each batch writes its
assignments to its OWN ``batch=<id>`` directory with mode=overwrite —
a replayed batch rewrites identical content into the same directory
instead of appending duplicates. No generation chain is needed
because batches are disjoint by construction (the source is
append-only files); contrast with streaming/hll.py where the merge is
cross-batch and needs generation swapping.

At 100 TB: the feed is the event bus, each batch's write is
O(batch) with no shuffle (assignment is a literal-folded argmin, a
map-only job), and the store accumulates as
``batch=*/centroid_id=*/`` — probes prune to nprobe centroid dirs
across every batch (partition discovery merges the directory axes),
and a background compaction job periodically rewrites small per-batch
files into consolidated centroid partitions (the same tmp+rename
discipline as layout.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from metastore_spark.similarity import ivf_assign


def apply_ivf_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_root: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Assign one micro-batch to the frozen quantizer and land it in
    the index store, replay-idempotently (overwrite of the batch's own
    partition directory)."""
    asg = ivf_assign(batch_df, centroids, id_col, vec_col).select(
        id_col, vec_col, "centroid_id"
    )
    (
        asg.write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(os.path.join(index_root, f"batch={batch_id}"))
    )


def ivf_ingest_stream(
    spark: SparkSession,
    src_path: str,
    index_root: str,
    centroids: list[list[float]],
    max_files_per_trigger: int | None = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Drain the embedding feed at ``src_path`` into the
    centroid-partitioned index store at ``index_root``; returns the
    store root (read it with ``spark.read.parquet(index_root)`` —
    Spark's partition discovery exposes ``batch`` and ``centroid_id``
    as partition columns, and a ``centroid_id`` filter prunes to the
    probed directories across all batches)."""
    schema = spark.read.parquet(src_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src_path)

    q = (
        stream.writeStream.foreachBatch(
            lambda b, bid: apply_ivf_batch(
                b, bid, index_root, centroids, id_col, vec_col
            )
        )
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", os.path.join(index_root, "_checkpoint")
        )
        .start()
    )
    q.awaitTermination()
    return index_root


def compact_index(
    spark: SparkSession,
    index_root: str,
    target_partitions_per_centroid: int = 1,
) -> str:
    """Compact the per-batch index layout (``batch=*/centroid_id=*/``,
    one small file per batch per centroid) into consolidated centroid
    partitions (``centroid_id=*/``) — the background maintenance job
    streaming ingest needs at scale, where thousands of micro-batches
    would otherwise mean thousands of tiny files per probe.

    Protocol (same atomic discipline as layout.py/serve.py): the
    compacted layout builds in a process-private ``.compact-<pid>``
    scratch dir and os.renames into ``<index_root>.compacted``;
    readers either see the old generation or the complete new one,
    never a half-written mix. The source batch dirs are left intact —
    the CALLER retires them after cutting readers over (in production
    the manifest swap and the retire are one transaction; here the
    two roots make the swap observable for tests).

    Returns the compacted root. Reading it yields the identical rows
    as reading ``index_root`` (pytest-asserted), with
    ``target_partitions_per_centroid`` files per centroid instead of
    one per (batch, centroid).
    """
    import shutil

    dest = f"{index_root}.compacted"
    tmp = f"{dest}.compact-{os.getpid()}"
    df = spark.read.parquet(index_root).drop("batch")
    (
        df.repartition(target_partitions_per_centroid, "centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(tmp)
    )
    if os.path.exists(dest):
        trash = f"{dest}.old-{os.getpid()}"
        try:
            os.rename(dest, trash)
            shutil.rmtree(trash, ignore_errors=True)
        except OSError:
            pass
    try:
        os.rename(tmp, dest)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost a concurrent race
    return dest
