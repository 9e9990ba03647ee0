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

import json
import os
import shutil
import uuid
from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from metastore_spark.similarity import ivf_assign

#: manifest file name — underscore-prefixed so Spark's parquet file
#: listing ignores it (same convention as _checkpoint/_SUCCESS).
_MANIFEST = "_MANIFEST.json"


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


def read_manifest(index_root: str) -> dict | None:
    """Load the store's manifest, or None for a store that has never
    been compacted (pure per-batch layout)."""
    try:
        with open(os.path.join(index_root, _MANIFEST)) as fh:
            return json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError):
        # a torn manifest is impossible under the tmp+rename protocol;
        # JSONDecodeError here means an empty store being initialized
        return None


def _write_manifest(index_root: str, man: dict) -> None:
    """Atomic manifest swap: write-to-scratch then os.rename — readers
    see the old pointer or the new one, never a partial file."""
    tmp = os.path.join(
        index_root, f".{_MANIFEST}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    )
    with open(tmp, "w") as fh:
        json.dump(man, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, os.path.join(index_root, _MANIFEST))


def _live_batch_dirs(index_root: str, folded: set[str]) -> list[str]:
    """Batch directories the manifest has NOT folded into a compacted
    generation — the post-compaction ingest tail."""
    return sorted(
        os.path.join(index_root, d)
        for d in os.listdir(index_root)
        if d.startswith("batch=") and d not in folded
    )


def read_index(spark: SparkSession, index_root: str) -> DataFrame:
    """THE read path for a maintained IVF store: resolve through the
    manifest — current compacted generation UNION the batch dirs
    ingested since that generation was cut. Probes filter on
    ``centroid_id``; the predicate prunes to nprobe partition
    directories in every unioned scan.

    Correctness across the compaction race: ``folded_batches`` in the
    manifest names exactly the batch dirs whose rows the compacted
    generation contains, so a crash AFTER the manifest swap but BEFORE
    the folded dirs are retired cannot double-count — the reader skips
    folded dirs whether or not they still exist on disk."""
    man = read_manifest(index_root)
    folded = set(man["folded_batches"]) if man else set()
    parts = []
    if man is not None:
        parts.append(
            spark.read.parquet(os.path.join(index_root, man["compacted_root"]))
        )
    for d in _live_batch_dirs(index_root, folded):
        parts.append(spark.read.parquet(d))
    if not parts:
        raise FileNotFoundError(f"empty IVF store at {index_root}")
    return reduce(lambda a, b: a.unionByName(b), parts)


def _owner_alive(name: str, marker: str) -> bool:
    """True when ``name`` embeds ``<marker><pid>...`` of a live process
    (same hands-off discipline as layout.py's scratch sweep,
    layout.py:459-469)."""
    pid_str = name.rpartition(marker)[2].split("-", 1)[0]
    if not pid_str.isdigit():
        return False
    try:
        os.kill(int(pid_str), 0)
        return True  # owner alive: its build/swap is in flight
    except ProcessLookupError:
        return False  # dead owner — safe to reclaim
    except PermissionError:
        return True  # alive under another uid — hands off


def retire_folded(index_root: str) -> None:
    """Garbage-collect what the current manifest supersedes: folded
    batch dirs, SUPERSEDED ``_gen=*`` generations, and dead writers'
    scratch. Idempotent and crash-safe to re-run after a crash.

    Generation ordering + pid-stamped names make the compactor race
    decidable without age gates: a compactor always builds generation
    ``manifest.generation + 1`` under a process-unique name
    (``_gen=<n>.pid-<pid>-<uuid>``), so

    - ``K < current generation`` is definitively superseded (every
      manifest at generation >= K+1 folded its rows) — delete;
    - ``K >= current`` under a different name is an in-flight
      compactor between build and manifest swap, or a crashed one —
      pid-liveness decides (alive: hands off; dead: reclaim);
    - legacy ``.tmp-`` scratch stays pid-gated as before.

    Concurrency caveat (same as every deferred-GC table format): a
    reader that resolved the OLD manifest just before a swap may
    still be scanning the superseded generation this call deletes.
    Single-process maintenance loops (ingest -> compact -> retire, as
    `compact_index` runs it) are safe because their own reads resolve
    after the swap; deployments with long-lived concurrent readers
    should delay retirement by their max query latency (retention
    window), exactly as Delta's VACUUM does."""
    man = read_manifest(index_root)
    if man is None:
        return
    folded = set(man["folded_batches"])
    current = man["compacted_root"]
    current_gen = int(man["generation"])
    for d in os.listdir(index_root):
        p = os.path.join(index_root, d)
        if d in folded:
            shutil.rmtree(p, ignore_errors=True)
        elif d.startswith("_gen=") and d != current:
            if ".tmp-" in d:
                if not _owner_alive(d, ".tmp-"):
                    shutil.rmtree(p, ignore_errors=True)
                continue
            gen_str = d[len("_gen="):].split(".", 1)[0]
            if not gen_str.isdigit():
                continue
            if int(gen_str) < current_gen or not _owner_alive(d, ".pid-"):
                shutil.rmtree(p, ignore_errors=True)
        elif d.startswith(f".{_MANIFEST}.tmp-") and not _owner_alive(
            d, ".tmp-"
        ):
            try:
                os.remove(p)
            except OSError:
                pass


def compact_index(
    spark: SparkSession,
    index_root: str,
    target_partitions_per_centroid: int = 1,
    _crash_after_manifest: bool = False,
) -> str:
    """Compact the per-batch index layout (``batch=*/centroid_id=*/``,
    one small file per batch per centroid) into a consolidated
    generation (``_gen=<n>/centroid_id=*/``) and CUT READERS OVER —
    the background maintenance job streaming ingest needs at scale,
    where thousands of micro-batches would otherwise mean thousands of
    tiny files per probe.

    End-to-end protocol (closes the round-5 caller-side gap):

    1. snapshot the manifest + live batch dirs; read everything
       through `read_index` (so repeated compactions fold the previous
       generation in, not just raw batches);
    2. build generation ``n`` directly under a PROCESS-UNIQUE name
       ``_gen=<n>.pid-<pid>-<uuid>`` — nobody reads it until the
       manifest points at it, and the unique name removes the rename
       collision a bare ``_gen=<n>`` had (a compactor that crashed
       between rename and swap used to deadlock the generation; now
       its orphan is pid-dead and GC'd, and concurrent compactors at
       the same generation resolve by last-manifest-swap-wins with
       identical-content losers reclaimed once their pid exits);
    3. swap the manifest (tmp+rename) to point at the new generation
       with ``folded_batches`` = previous folds + the snapshotted
       dirs — from this instant `read_index` serves the new
       generation plus only the ingest tail;
    4. retire the folded batch dirs and the previous generation
       (`retire_folded` — idempotent, pid-liveness-checked, safe to
       re-run after a crash anywhere in this sequence).

    A crash before (3) leaves the old manifest serving the old state;
    a crash after (3) leaves extra directories the manifest already
    excludes — `_crash_after_manifest` injects exactly that window for
    tests/test_crash_recovery.py. Batches ingested DURING the
    compaction are not in the snapshot, stay un-folded, and remain
    visible through the union — no ingest/compact coordination needed.
    """
    man = read_manifest(index_root)
    gen = (man["generation"] + 1) if man else 0
    prev_folds = set(man["folded_batches"]) if man else set()
    snapshot = [
        os.path.basename(p) for p in _live_batch_dirs(index_root, prev_folds)
    ]
    df = read_index(spark, index_root)

    gen_name = f"_gen={gen}.pid-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    (
        df.repartition(target_partitions_per_centroid, "centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(os.path.join(index_root, gen_name))
    )
    _write_manifest(
        index_root,
        {
            "generation": gen,
            "compacted_root": gen_name,
            "folded_batches": sorted(prev_folds | set(snapshot)),
        },
    )
    if _crash_after_manifest:
        return index_root  # test hook: die between swap and retire
    retire_folded(index_root)
    return index_root
