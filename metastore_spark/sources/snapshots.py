"""Snapshot-isolated table format with time travel (Delta/Iceberg shape).

Every commit writes IMMUTABLE parquet data files plus a JSON manifest
listing exactly the files that make up that snapshot. The manifest
file's creation IS the commit: ``meta/v<N>.json`` is created with
exclusive-create semantics (hard link of a staged temp file — fails if
vN already exists), so exactly one writer can ever own version N.
Readers resolve head -> manifest -> file list, so they always see a
complete snapshot — never a half-written commit — and any retained
historical version stays readable (time travel). This is the
table-format layer a 100 TB deployment needs under every other
operator in this repo: ingest appends, GDPR deletes, and compaction
all become manifest commits over immutable files, and a reader pinned
to version N is immune to all of them.

Design parallels (public formats, re-expressed for one shared FS):
- Delta Lake: the _delta_log/<N>.json put-if-absent IS the optimistic
  commit; a loser re-reads the head and retries at N+1.
- Iceberg v1: manifest = file list; copy-on-write deletes rewrite only
  AFFECTED files and carry the rest by reference.
- The repo's own streaming stores (streaming/ivf.py manifest cutover,
  serve.py winner-keeps rename) establish the crash-safety idiom;
  this module adds multi-version retention + optimistic concurrency.

Crash contract: a crash before the manifest link leaves orphan data
files only (age-gated GC reclaims them); a crash after it is a
completed commit. There is no intermediate state — single-phase
commit was chosen precisely because a staged-manifest two-phase
variant lets a losing racer clobber the winner's same-numbered
manifest.

Scale shape: commits touch O(delta) data + O(files) manifest JSON;
reads open only the listed files (no directory listing of the whole
table); copy-on-write rewrites only files that CONTAIN matching rows
(found with ONE metadata-column scan), carrying every untouched file
into the new manifest by reference.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_META = "meta"
_DATA = "data"
# a data dir this stale with no manifest referencing it belongs to a
# crashed commit; GC may reclaim it (same idiom as serve.py orphans)
_ORPHAN_AGE_SEC = 86400


class ConcurrentCommit(RuntimeError):
    """Another writer committed this version first; re-read the head
    and retry the commit against the new parent."""


class SchemaEvolutionError(ValueError):
    """Rejected schema change: only ADDING columns is supported —
    dropping or retyping a column would corrupt historical reads that
    share the old files."""


def _meta_dir(root: str) -> str:
    return os.path.join(root, _META)


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(_meta_dir(root), f"v{version}.json")


def create_table(root: str) -> None:
    os.makedirs(_meta_dir(root), exist_ok=True)
    os.makedirs(os.path.join(root, _DATA), exist_ok=True)


def current_version(root: str) -> int:
    """Head = highest committed manifest; 0 = empty table.

    A meta-dir scan, not a pointer file: manifest creation is atomic
    (exclusive link), so the listing can never observe a torn commit,
    and there is no pointer to crash between states. O(#versions) —
    bounded by retention."""
    try:
        names = os.listdir(_meta_dir(root))
    except OSError:
        return 0
    versions = [
        int(n[1:-5])
        for n in names
        if n.startswith("v") and n.endswith(".json") and n[1:-5].isdigit()
    ]
    return max(versions, default=0)


def read_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as fh:
        return json.load(fh)


def _write_data_files(spark_df: DataFrame, root: str) -> list[str]:
    """Write a new immutable data dir, return table-relative file paths.

    Files are fully on disk before any manifest can reference them —
    a crash after this point leaves an orphan dir, never a torn read.
    """
    dirname = f"{_DATA}/{uuid.uuid4().hex[:12]}"
    out = os.path.join(root, dirname)
    spark_df.write.parquet(out)
    return sorted(
        f"{dirname}/{name}"
        for name in os.listdir(out)
        if name.endswith(".parquet")
    )


def _commit(
    root: str,
    parent: int,
    op: str,
    files: list[str],
    extra: dict | None = None,
) -> int:
    """Single-phase optimistic commit: creating ``meta/v<N>.json`` IS
    the commit. The staged temp file is HARD-LINKED to the manifest
    name — link(2) fails with EEXIST if vN exists, so exactly one
    writer ever owns a version; a loser raises ConcurrentCommit with
    the winner's manifest untouched (Delta's log put-if-absent,
    expressed in POSIX)."""
    version = parent + 1
    manifest = {
        "version": version,
        "parent": parent,
        "op": op,
        "ts": int(time.time()),
        "files": files,
        **(extra or {}),
    }
    path = _manifest_path(root, version)
    tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    try:
        os.link(tmp, path)
    except FileExistsError:
        raise ConcurrentCommit(
            f"v{version} was committed by another writer; retry on the "
            "new head"
        ) from None
    finally:
        os.unlink(tmp)
    return version


def _schema_extra(df: DataFrame) -> dict:
    return {"schema": json.loads(df.schema.json())}


def _check_add_only(parent_manifest: dict, df: DataFrame) -> None:
    """Add-only schema evolution: every parent column must survive
    with its type. New columns are fine — the stored snapshot schema
    null-fills them when reading older files."""
    ps = parent_manifest.get("schema")
    if not ps:
        return
    new = {f.name: f.dataType.jsonValue() for f in df.schema.fields}
    for field in ps["fields"]:
        name = field["name"]
        if name not in new:
            raise SchemaEvolutionError(f"append drops column {name!r}")
        if new[name] != field["type"]:
            raise SchemaEvolutionError(
                f"column {name!r} changed type {field['type']!r} -> "
                f"{new[name]!r}"
            )


def _read_files(spark: SparkSession, root: str, manifest: dict) -> DataFrame:
    """Read a manifest's exact file list under its COMMITTED schema
    (Iceberg-style: schema lives in metadata, so readers never pay a
    footer-merge pass, and files written before an added column
    null-fill it)."""
    paths = [os.path.join(root, f) for f in manifest["files"]]
    reader = spark.read
    if "schema" in manifest:
        from pyspark.sql.types import StructType

        reader = reader.schema(StructType.fromJson(manifest["schema"]))
    return reader.parquet(*paths)


def commit_append(spark: SparkSession, root: str, df: DataFrame) -> int:
    """Append-only commit: new files + every parent file, by
    reference. The committed snapshot schema is the APPEND's schema
    (add-only evolution enforced), so a widened append upgrades the
    table for readers of this and later versions while older versions
    keep their own committed schema."""
    create_table(root)
    parent = current_version(root)
    prev_manifest = read_manifest(root, parent) if parent else {}
    _check_add_only(prev_manifest, df)
    prev = prev_manifest.get("files", [])
    files = _write_data_files(df, root)
    return _commit(root, parent, "append", prev + files, _schema_extra(df))


def commit_delete_where(spark: SparkSession, root: str, predicate) -> int:
    """Copy-on-write delete: rewrite ONLY files containing matching
    rows (survivor rows to a fresh dir), carry untouched files by
    reference. Affected files are found with one scan of the hidden
    ``_metadata.file_path`` column — no per-file probe jobs.

    ``predicate`` is a Column over the table schema; rows where it
    evaluates TRUE are deleted as of the new snapshot. SQL DELETE
    semantics: rows where it evaluates NULL (e.g. a NULL column in the
    condition) are KEPT, exactly like FALSE — only TRUE removes.
    """
    parent = current_version(root)
    if not parent:
        raise ValueError("cannot delete from an empty table")
    prev_manifest = read_manifest(root, parent)
    prev = prev_manifest["files"]
    # three-valued logic pinned once and reused by BOTH the affected-
    # file scan and the survivor filter, so they can never disagree on
    # a NULL-predicate row
    hit = F.coalesce(predicate.cast("boolean"), F.lit(False))
    # _metadata.file_path spells the local path as file:/... — strip
    # the scheme so manifest-relative paths compare cleanly
    with_file = _read_files(spark, root, prev_manifest).withColumn(
        "_src",
        F.regexp_replace(F.col("_metadata.file_path"), "^file:/*", "/"),
    )
    affected = {
        os.path.relpath(r["_src"], root)
        for r in with_file.filter(hit).select("_src").distinct().collect()
    }
    schema_extra = (
        {"schema": prev_manifest["schema"]}
        if "schema" in prev_manifest
        else None
    )
    if not affected:
        return _commit(root, parent, "delete", prev, schema_extra)
    survivors = with_file.filter(
        F.col("_src").isin([os.path.join(root, f) for f in sorted(affected)])
        & ~hit
    ).drop("_src")
    rewritten = _write_data_files(survivors, root)
    kept = [f for f in prev if f not in affected]
    return _commit(root, parent, "delete", kept + rewritten, schema_extra)


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: the exact file list of ``version`` (default:
    current head). Empty table -> raises like a missing parquet path
    would; version 0 is not a readable snapshot."""
    v = current_version(root) if version is None else version
    return _read_files(spark, root, read_manifest(root, v))


def expire_snapshots(root: str, keep_last: int = 2) -> list[str]:
    """Retention GC: drop manifests older than the newest
    ``keep_last`` (head always kept), then delete data files no kept
    manifest references. Immutability makes this a pure set
    difference, in two safety classes:

    - files referenced ONLY by expired manifests were fully committed
      once — no in-flight writer can be mid-write to them — so they
      delete immediately;
    - files referenced by NO manifest at all are either crashed-commit
      orphans or a commit staged between our manifest listing and the
      sweep — age-gated (same idiom as serve.py's build orphans).

    Returns deleted paths (for tests/audit)."""
    head = current_version(root)
    if not head:
        return []
    versions = sorted(
        int(name[1:-5])
        for name in os.listdir(_meta_dir(root))
        if name.startswith("v") and name.endswith(".json")
    )
    keep = {v for v in versions if v > head - keep_last} | {head}
    live: set[str] = set()
    expired_refs: set[str] = set()
    for v in versions:
        files = read_manifest(root, v)["files"]
        (live if v in keep else expired_refs).update(files)
    deleted: list[str] = []
    for v in versions:
        if v not in keep:
            os.remove(_manifest_path(root, v))
            deleted.append(f"meta/v{v}.json")
    data_root = os.path.join(root, _DATA)
    now = time.time()
    for d in sorted(os.listdir(data_root)):
        ddir = os.path.join(data_root, d)
        swept_expired = False
        for name in sorted(os.listdir(ddir)):
            rel = f"{_DATA}/{d}/{name}"
            if rel in live:
                continue
            if rel not in expired_refs and (
                not name.endswith(".parquet")
                or now - os.stat(os.path.join(ddir, name)).st_mtime
                < _ORPHAN_AGE_SEC
            ):
                continue
            os.remove(os.path.join(ddir, name))
            deleted.append(rel)
            swept_expired = swept_expired or rel in expired_refs
        # a dir whose parquet files are all gone holds only write
        # markers (_SUCCESS) — reclaim it whole. Gate: an in-flight
        # _write_data_files dir ALSO has no top-level parquet yet
        # (only _temporary/), so a dir is reclaimed only when we just
        # emptied it of once-committed expired files (that write
        # finished long ago — data dirs are write-once) or it has
        # aged past the same orphan gate the per-file sweep uses.
        if not any(n.endswith(".parquet") for n in os.listdir(ddir)) and (
            swept_expired or now - os.stat(ddir).st_mtime >= _ORPHAN_AGE_SEC
        ):
            shutil.rmtree(ddir, ignore_errors=True)
    return deleted


def _find_stream_commit(root: str, stream_id: str, batch_id: int) -> int | None:
    """Version already holding this (stream, batch), or None. Scan is
    O(retained versions) of small JSON — the idempotence ledger is the
    manifest history itself, no side state to drift."""
    try:
        names = os.listdir(_meta_dir(root))
    except OSError:
        return None
    for name in sorted(names, reverse=True):
        if not (name.startswith("v") and name.endswith(".json")):
            continue
        m = read_manifest(root, int(name[1:-5]))
        if m.get("stream_id") == stream_id and m.get("batch_id") == batch_id:
            return m["version"]
    return None


def _commit_with_retry(
    root: str, op: str, new_files: list[str], extra: dict | None = None
) -> int:
    """Append-shaped commit loop: on ConcurrentCommit, re-read the new
    head and retry — new_files are immutable, so only the carried
    prefix changes."""
    while True:
        parent = current_version(root)
        prev = read_manifest(root, parent)["files"] if parent else []
        manifest_extra = dict(extra or {})
        try:
            return _commit(root, parent, op, prev + new_files, manifest_extra)
        except ConcurrentCommit:
            continue


def snapshot_sink(root: str, stream_id: str):
    """foreachBatch writer committing each micro-batch as a snapshot
    append with EXACTLY-ONCE semantics: the manifest records
    (stream_id, batch_id), and a re-delivered batch (crash between
    the manifest link and the checkpoint commit) is recognized and
    skipped. A crash between the data write and the manifest link
    re-runs the batch — the first attempt's files are unreferenced
    orphans, never double-counted. Usage:

        stream.writeStream.foreachBatch(snapshot_sink(root, sid))
              .option("checkpointLocation", ckpt)
              .trigger(availableNow=True).start()
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if _find_stream_commit(root, stream_id, batch_id) is not None:
            return  # re-delivered after a post-commit crash
        create_table(root)
        files = _write_data_files(batch_df, root)
        _commit_with_retry(
            root,
            "append",
            files,
            {
                "stream_id": stream_id,
                "batch_id": batch_id,
                **_schema_extra(batch_df),
            },
        )

    return write_batch


def ingest_stream(
    stream: DataFrame, root: str, checkpoint_dir: str, stream_id: str
) -> None:
    """Drain an availableNow stream into the snapshot table — each
    micro-batch one committed, replay-idempotent version."""
    (
        stream.writeStream.foreachBatch(snapshot_sink(root, stream_id))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def compact(spark: SparkSession, root: str, target_files: int = 1) -> int:
    """Small-files maintenance: rewrite the head snapshot's files into
    ``target_files``, commit as op=compact with the IDENTICAL row set.
    Readers pinned to older versions keep their files (retention GC
    reclaims them later); concurrent appends are preserved — if the
    head moves mid-compaction, the retry carries every file added
    since the compacted parent instead of silently dropping it.

    Conflict rule (Delta/Iceberg shape): a concurrent commit that
    REMOVED any base file (a COW delete, or another compaction)
    invalidates the rewrite — the rewritten data was built from the
    pre-delete base, so committing it would silently resurrect the
    deleted rows. That conflict raises ConcurrentCommit; the caller
    re-runs compaction against the new head."""
    parent = current_version(root)
    if not parent:
        raise ValueError("cannot compact an empty table")
    base_manifest = read_manifest(root, parent)
    base = base_manifest["files"]
    df = _read_files(spark, root, base_manifest)
    rewritten = _write_data_files(df.coalesce(target_files), root)
    while True:
        head = current_version(root)
        head_files = read_manifest(root, head)["files"]
        removed = set(base) - set(head_files)
        if removed:
            raise ConcurrentCommit(
                f"{len(removed)} base file(s) were removed by a "
                "concurrent commit (delete/compact); committing this "
                "rewrite would resurrect their deleted rows — re-run "
                "compaction on the new head"
            )
        added = [f for f in head_files if f not in set(base)]
        head_manifest = read_manifest(root, head)
        schema_extra = (
            {"schema": head_manifest["schema"]}
            if "schema" in head_manifest
            else None
        )
        try:
            return _commit(
                root, head, "compact", rewritten + added, schema_extra
            )
        except ConcurrentCommit:
            continue
