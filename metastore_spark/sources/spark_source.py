"""The snapshot table format as a FIRST-CLASS Spark data source.

Registers a Python DataSource (Spark 4 ``pyspark.sql.datasource``)
named ``snapshot`` so the format plugs into the standard reader APIs
instead of a library call:

    spark.dataSource.register(SnapshotDataSource)
    spark.read.format("snapshot").load(root)                  # head
    spark.read.format("snapshot").option("version", 3).load(root)
    spark.read.format("snapshot").option("version", "prod").load(root)
    spark.read.format("snapshot").option("ref", "audit").load(root)
    (spark.readStream.format("snapshot").load(root)            # tail
         .writeStream...)                                      # the feed

Batch reads resolve the manifest exactly like
`snapshots.read_snapshot` — committed schema, column-ID evolution
mapping per file cohort, merge-on-read position deletes — but execute
as one InputPartition per data file with a pyarrow worker-side kernel
(columns pruned to the projection, delete positions masked before
projection), so the scan parallelism is the manifest's file list.

The STREAM reader makes the commit log a Structured Streaming source
with snapshot VERSIONS as offsets: `initialOffset` starts at 0 (or
``option("since", v)``), `latestOffset` is the trunk head, and each
micro-batch reads exactly the new segments of the append commits in
``(start, end]`` — `snapshots.read_appends`' contract (deletes /
compactions / publishes contribute nothing; rows are served AS OF
their append). Offsets live in Spark's checkpoint, so restart resumes
exactly-once without any side ledger; a checkpoint that fell behind
retention fails the stream with `RetentionExpired` rather than a
silent gap.

Scale shape: offset resolution and partition planning are O(window
manifests) of small JSON on the driver; data movement is one arrow
read per NEW file, pruned to the projected columns. This is the
"table format as streaming source" design of Delta's source /
Iceberg's incremental scan, expressed through Spark's public Python
DataSource API.

PERF ASYMMETRY (deliberate): this source reads parquet per-file via
pyarrow inside Python workers — the Spark 4 Python DataSource API's
shape — so it is the INTEROP surface, not the fast path. Library
reads (`snapshots.read_snapshot`) scan through Spark's JVM parquet
reader with whole-stage codegen and are what the serving layer uses.
File skipping IS available here: ``option("prune.<col>", "lo,hi")``
range bounds and ``option("prune_in.<col>", "a,b,c")`` value sets
resolve manifest min/max stats, partition tuples, and bloom filters
before planning, so a pruned scan plans strictly fewer input
partitions (same caller-owed row-filter contract as read_snapshot's
``prune``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from metastore_spark.sources import snapshots as snap


class _FileSlice(InputPartition):
    """One data file plus everything the worker kernel needs: the
    target schema (JSON), the manifest's column-ID map, the file's
    write-time column metadata, the snapshot's position-delete files,
    and the equality-delete entries whose scope covers THIS file
    (resolved driver-side; [{paths, cols}] JSON)."""

    def __init__(self, path, schema_json, ids_json, columns_json,
                 delete_paths, eq_json=None):
        self.path = path
        self.schema_json = schema_json
        self.ids_json = ids_json
        self.columns_json = columns_json
        self.delete_paths = delete_paths
        self.eq_json = eq_json


def _arrow_read(part: _FileSlice):
    """Worker kernel: parquet -> (MOR mask) -> ID/name projection ->
    arrow batches matching the target schema exactly. Runs inside the
    Python data source executor; imports stay local."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_type

    schema = StructType.fromJson(json.loads(part.schema_json))
    ids = json.loads(part.ids_json) if part.ids_json else None
    cols_meta = (
        json.loads(part.columns_json) if part.columns_json else None
    )
    by_id = (
        {v["id"]: name for name, v in cols_meta.items()}
        if cols_meta
        else {}
    )

    def src_of(field_name: str):
        if ids and by_id:
            return by_id.get(ids.get(field_name))
        return field_name

    present = set(pq.ParquetFile(part.path).schema_arrow.names)
    wanted = [
        s
        for s in (src_of(f.name) for f in schema.fields)
        if s is not None and s in present
    ]
    tbl = pq.read_table(part.path, columns=wanted)  # column pruning
    if part.delete_paths:
        fname = os.path.basename(part.path)
        dels = pq.read_table(
            part.delete_paths, columns=["file_name", "pos"]
        )
        pos = dels.filter(pc.equal(dels["file_name"], fname))["pos"]
        if len(pos):
            keep = pa.array(
                ~_positions_mask(pos.to_pylist(), tbl.num_rows)
            )
            tbl = tbl.filter(keep)
    arrays, names = [], []
    for f in schema.fields:
        target = to_arrow_type(f.dataType)
        s = src_of(f.name)
        if s is not None and s in tbl.column_names:
            col = tbl[s].combine_chunks()
            if col.type != target:
                col = col.cast(target)  # widen (e.g. int32 -> int64)
        else:
            col = pa.nulls(tbl.num_rows, target)
        arrays.append(col)
        names.append(f.name)
    out = pa.table(arrays, names=names)
    # equality deletes scoped to this file: anti-join the key sets on
    # the PROJECTED (committed-name) frame — keys bind committed names
    # at their commit time, and evolution of a referenced key column
    # is blocked while the delete is live
    for entry in json.loads(part.eq_json) if part.eq_json else []:
        keys = pq.read_table(entry["paths"], columns=entry["cols"])
        out = out.join(
            keys, keys=entry["cols"], join_type="left anti"
        )
    yield from out.to_batches(max_chunksize=8192)


def _positions_mask(positions, n):
    import numpy as np

    m = np.zeros(n, dtype=bool)
    idx = np.asarray(positions, dtype="int64")
    m[idx[idx < n]] = True
    return m


def _slices_for_manifest(
    root: str, manifest: dict, schema_json: str, files: list[str] | None = None
) -> list[_FileSlice]:
    """Driver-side planning: one slice per data file, carrying its
    segment's write-time column metadata (evolution cohort) and the
    manifest's delete files."""
    ids_json = (
        json.dumps(manifest["column_ids"])
        if manifest.get("column_ids")
        else None
    )
    delete_paths = [
        os.path.join(root, f)
        for f in (manifest.get("delete_files") or [])
    ]
    # equality-delete entries with their scope resolved ONCE to file
    # sets; each slice carries only the entries that cover its file
    eq_entries = []
    for e in manifest.get("eq_delete_files") or []:
        scope: set[str] = set()
        for s in e["scope_segments"]:
            scope.update(snap._read_segment(root, s))
        eq_entries.append(
            (
                scope,
                {
                    "paths": [os.path.join(root, f) for f in e["files"]],
                    "cols": list(e["cols"]),
                },
            )
        )

    def _eq_json_for(f: str):
        if not eq_entries:
            return None
        hits = [payload for scope, payload in eq_entries if f in scope]
        return json.dumps(hits) if hits else None

    only = set(files) if files is not None else None
    # segments written BEFORE the first evolution carry no per-segment
    # column metadata; their write-time mapping is the manifest's
    # legacy_columns snapshot (same fallback the library read uses)
    legacy_cj = (
        json.dumps(manifest["legacy_columns"])
        if manifest.get("legacy_columns")
        else None
    )
    out = []
    if "segments" in manifest:
        for seg in manifest["segments"]:
            obj = snap._read_segment_obj(root, seg)
            cj = (
                json.dumps(obj["columns"])
                if obj.get("columns")
                else legacy_cj
            )
            for f in obj["files"]:
                if only is not None and f not in only:
                    continue
                out.append(
                    _FileSlice(
                        os.path.join(root, f),
                        schema_json,
                        ids_json,
                        cj,
                        delete_paths,
                        _eq_json_for(f),
                    )
                )
    else:  # legacy inline-files manifest
        for f in manifest.get("files", []):
            if only is not None and f not in only:
                continue
            out.append(
                _FileSlice(
                    os.path.join(root, f),
                    schema_json,
                    ids_json,
                    legacy_cj,
                    delete_paths,
                    _eq_json_for(f),
                )
            )
    return out


def _nullable_schema_json(schema_obj: dict) -> dict:
    """The committed schema with every top-level field nullable.

    Parquet reads are always nullable in Spark's own scan (a user
    schema's nullable=false is advisory there), and add-only evolution
    null-fills files written before a column existed — but the
    DataSource path ENFORCES declared nullability in the arrow
    exchange, so a non-nullable committed flag would crash the very
    null-fill the format guarantees. Declare the truth instead."""
    out = json.loads(json.dumps(schema_obj))
    for f in out.get("fields", []):
        f["nullable"] = True
    return out


def _schema_of(root: str, version: int, ref: str = "main") -> StructType:
    m = snap.read_manifest(root, version, ref)
    if "schema" not in m:
        raise ValueError(
            "legacy table has no committed schema; read it via "
            "snapshots.read_snapshot"
        )
    return StructType.fromJson(_nullable_schema_json(m["schema"]))


class _BatchReader(DataSourceReader):
    def __init__(self, root: str, version, ref: str, prune=None):
        self.root = root
        if isinstance(version, str) and not version.isdigit():
            version = snap.tag_version(root, version)
        self.version = (
            int(version)
            if version is not None
            else snap.current_version(root, ref)
        )
        self.ref = ref
        self.prune = prune
        self.manifest = snap.read_manifest(root, self.version, ref)

    def partitions(self):
        schema_json = json.dumps(
            _nullable_schema_json(self.manifest["schema"])
        )
        files = None
        if self.prune:
            # manifest min/max + partition-tuple + bloom skipping,
            # resolved BEFORE planning: skipped files are never
            # listed, opened, or footer-read
            files = snap.pruned_manifest_files(
                self.root, self.manifest, self.prune
            )
        return _slices_for_manifest(
            self.root, self.manifest, schema_json, files=files
        )

    def read(self, partition):
        yield from _arrow_read(partition)


class _StreamReader(DataSourceStreamReader):
    """Snapshot versions ARE the offsets: {"version": N}. Each batch
    serves the new segments of append commits in (start, end] under
    the schema pinned at stream start (later-added columns surface
    when the stream restarts on the wider schema)."""

    def __init__(self, root: str, since: int, schema_json: str,
                 ids_json, legacy_json=None):
        self.root = root
        self.since = since
        self.schema_json = schema_json
        self.ids_json = ids_json
        self._pinned_fields = [
            f["name"] for f in json.loads(schema_json)["fields"]
        ]
        self._pinned_ids = json.loads(ids_json) if ids_json else None
        self._pinned_legacy = (
            json.loads(legacy_json) if legacy_json else None
        )

    def initialOffset(self):
        return {"version": self.since}

    def latestOffset(self):
        return {"version": snap.current_version(self.root)}

    def partitions(self, start, end):
        lo, hi = int(start["version"]), int(end["version"])
        self._check_retention(lo)
        out = []
        for v in range(lo + 1, hi + 1):
            m = snap.read_manifest(self.root, v)
            self._check_schema_stable(m, v)
            if m["op"] != "append":
                continue
            pm = (
                snap.read_manifest(self.root, m["parent"])
                if m["parent"]
                else {}
            )
            sub = snap._append_delta(self.root, m, pm)
            if sub is None:
                continue
            if self._pinned_ids and not m.get("column_ids"):
                # backlog commit written BEFORE the table's first
                # evolution: its files carry write-time names, and the
                # pinned (possibly renamed) schema would resolve to
                # nothing and null-fill. Resolve through the head's
                # legacy_columns snapshot — the same mapping
                # snapshots._read_files uses for pre-ID segments.
                if not self._pinned_legacy:
                    raise ValueError(
                        f"v{v} predates the table's column IDs and no "
                        "legacy_columns snapshot exists to resolve the "
                        "pinned schema; restart the stream"
                    )
                sub["column_ids"] = self._pinned_ids
                sub["legacy_columns"] = self._pinned_legacy
            out.extend(
                _slices_for_manifest(self.root, sub, self.schema_json)
            )
        return out

    def _check_schema_stable(self, m: dict, v: int) -> None:
        """A rename/drop of a pinned column mid-stream would silently
        null-fill it (the pinned name no longer resolves through the
        later manifest's ID map) — fail the stream instead, Delta's
        contract: restart to adopt the new schema. Added columns are
        benign (not in the pinned projection)."""
        wids = m.get("column_ids")
        if not wids:
            return
        for name in self._pinned_fields:
            ok = name in wids and (
                self._pinned_ids is None
                or wids[name] == self._pinned_ids.get(name, wids[name])
            )
            if not ok:
                raise ValueError(
                    f"column {name!r} was renamed or dropped at "
                    f"v{v} while this stream was running; restart "
                    "the stream to adopt the evolved schema"
                )

    def _check_retention(self, start_version: int) -> None:
        head = snap.current_version(self.root)
        names = os.listdir(snap._meta_dir(self.root))
        retained = sorted(
            int(n[1:-5])
            for n in names
            if n.startswith("v") and n.endswith(".json")
            and n[1:-5].isdigit()
        )
        oldest = head
        for v in reversed(retained):
            if v in (oldest, oldest - 1):
                oldest = v
            elif v < oldest:
                break
        min_since = 0 if oldest <= 1 else oldest
        if start_version < min_since:
            raise snap.RetentionExpired(
                f"stream checkpoint at v{start_version} is behind the "
                f"retention horizon; oldest readable checkpoint is "
                f"{min_since} — reseed from a snapshot read"
            )

    def read(self, partition):
        yield from _arrow_read(partition)

    def commit(self, end):
        pass  # offsets live in Spark's checkpoint; nothing to ack

    def stop(self):
        pass


class SnapshotDataSource(DataSource):
    """``format("snapshot")``: batch + streaming reads of the snapshot
    table format through Spark's public Python DataSource API."""

    @classmethod
    def name(cls):
        return "snapshot"

    def _root(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError(
                "snapshot source needs a table root: .load(<root>)"
            )
        return root

    def _pinned(self) -> tuple[int, str]:
        """Resolve (version, ref) ONCE per DataSource instance: Spark
        calls schema() then reader() on the same instance, and a
        commit landing between two independent head resolutions would
        plan a newer manifest than the advertised schema (an arrow /
        schema mismatch at read time)."""
        if not hasattr(self, "_pinned_version"):
            root = self._root()
            ref = self.options.get("ref", "main")
            v = self.options.get("version")
            if isinstance(v, str) and not v.isdigit():
                v = snap.tag_version(root, v)
            self._pinned_version = (
                int(v)
                if v is not None
                else snap.current_version(root, ref)
            )
            self._pinned_ref = ref
        return self._pinned_version, self._pinned_ref

    def schema(self):
        version, ref = self._pinned()
        return _schema_of(self._root(), version, ref)

    def _prune_opts(self) -> dict | None:
        """File-skipping bounds from reader options (option keys are
        lowercased by Spark — name engine columns accordingly):

            .option("prune.<col>", "lo,hi")     # range; empty = open
            .option("prune_in.<col>", "a,b,c")  # value set (+ blooms)

        Resolved through the manifest's min/max stats, partition
        tuples, and bloom filters BEFORE partition planning, so the
        source plans strictly fewer input partitions. Same contract
        as read_snapshot's ``prune``: an optimization only valid
        UNDER the caller's equivalent row filter."""

        def coerce(s: str):
            s = s.strip()
            if not s:
                return None
            for cast in (int, float):
                try:
                    return cast(s)
                except ValueError:
                    continue
            return s

        prune: dict = {}
        for k, v in self.options.items():
            if k.startswith("prune."):
                parts = v.split(",")
                if len(parts) != 2:
                    raise ValueError(
                        f"option {k!r} wants 'lo,hi' (empty side = "
                        f"open), got {v!r}"
                    )
                prune[k[len("prune."):]] = (
                    coerce(parts[0]),
                    coerce(parts[1]),
                )
            elif k.startswith("prune_in."):
                prune[k[len("prune_in."):]] = [
                    coerce(x) for x in v.split(",")
                ]
        return prune or None

    def reader(self, schema):
        version, ref = self._pinned()
        return _BatchReader(
            self._root(), version, ref, self._prune_opts()
        )

    def streamReader(self, schema):
        root = self._root()
        since = int(self.options.get("since", 0))
        head = snap.current_version(root)
        m = snap.read_manifest(root, head)
        ids_json = (
            json.dumps(m["column_ids"]) if m.get("column_ids") else None
        )
        legacy_json = (
            json.dumps(m["legacy_columns"])
            if m.get("legacy_columns")
            else None
        )
        return _StreamReader(
            root,
            since,
            json.dumps(_nullable_schema_json(m["schema"])),
            ids_json,
            legacy_json,
        )
