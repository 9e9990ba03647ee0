"""The snapshot format's DataSource WRITE path (VERDICT r10 task 4)
and the ``timestamp`` reader option (task 5): batch append/overwrite
through ``df.write.format("snapshot")``, the streaming sink's
(stream_id, batch_id) exactly-once ledger, upsert mode as the CDC
apply, and TIMESTAMP AS OF boundary cases through the reader."""

import os

import pytest
from pyspark.sql import functions as F

from metastore_spark.sources import snapshots as snap
from metastore_spark.sources.spark_source import SnapshotDataSource


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(SnapshotDataSource)
    return spark


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("g")
    )


def _sorted(df):
    return [tuple(r) for r in df.orderBy("k").collect()]


# ---- batch writes ---------------------------------------------------


def test_write_append_creates_and_accumulates(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "t")
    _df(spark, 0, 100).write.format("snapshot").mode("append").save(root)
    assert snap.current_version(root) == 1
    _df(spark, 100, 250).write.format("snapshot").mode("append").save(
        root
    )
    assert snap.current_version(root) == 2
    via_lib = snap.read_snapshot(spark, root)
    assert via_lib.count() == 250
    assert _sorted(via_lib) == _sorted(_df(spark, 0, 250))
    # and the source reads its own writes
    assert _sorted(spark.read.format("snapshot").load(root)) == _sorted(
        _df(spark, 0, 250)
    )


def test_write_interops_with_library_commits(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100))
    _df(spark, 100, 200).write.format("snapshot").mode("append").save(
        root
    )
    snap.commit_mor_delete(spark, root, F.col("g") == 3)
    out = snap.read_snapshot(spark, root)
    assert out.count() == 200 - 20
    assert out.filter("g = 3").count() == 0


def test_write_overwrite_replaces_but_history_survives(
    registered, tmp_path
):
    spark = registered
    root = str(tmp_path / "t")
    _df(spark, 0, 100).write.format("snapshot").mode("append").save(root)
    _df(spark, 500, 530).write.format("snapshot").mode(
        "overwrite"
    ).save(root)
    head = snap.read_snapshot(spark, root)
    assert head.count() == 30
    assert head.agg(F.min("k")).first()[0] == 500
    # the pre-overwrite snapshot is still a readable version
    assert snap.read_snapshot(spark, root, version=1).count() == 100
    # carried deletes were dropped with the rows they applied to
    assert not snap.read_manifest(
        root, snap.current_version(root)
    ).get("eq_delete_files")


def test_write_add_only_schema_enforced(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "t")
    _df(spark, 0, 10).write.format("snapshot").mode("append").save(root)
    bad = spark.range(5).select(F.col("id").alias("k"))  # drops g
    with pytest.raises(Exception, match="drops column"):
        bad.write.format("snapshot").mode("append").save(root)
    with pytest.raises(Exception, match="drops column"):
        bad.write.format("snapshot").mode("overwrite").save(root)
    # widening appends evolve the committed schema, like commit_append
    wide = spark.range(10, 20).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("g"),
        F.lit("x").alias("note"),
    )
    wide.write.format("snapshot").mode("append").save(root)
    out = snap.read_snapshot(spark, root)
    assert out.columns == ["k", "g", "note"]
    assert out.filter("k < 10").filter("note is null").count() == 10


def test_write_inherits_partition_spec_and_stats(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "t")
    snap.commit_append(
        spark,
        root,
        _df(spark, 0, 100),
        stats_cols=["k"],
        partition_by=["g"],
    )
    _df(spark, 100, 200).write.format("snapshot").mode("append").save(
        root
    )
    m = snap.read_manifest(root, snap.current_version(root))
    assert m["partition_spec"] == ["g"]
    assert m["stats_cols"] == ["k"]
    # the staged files landed hive-laid-out and partition-prunable:
    # g=7 holds 10+10 rows per cohort, one file set per tuple
    files_all = snap.manifest_files(root, m)
    files_g7 = snap.pruned_manifest_files(root, m, {"g": (7, 7)})
    assert 0 < len(files_g7) < len(files_all)
    got = snap.read_snapshot(spark, root, prune={"g": (7, 7)})
    assert got.filter("g = 7").count() == 20
    # min/max stats prune the new cohort's files too
    files_hi = snap.pruned_manifest_files(root, m, {"k": (150, 160)})
    assert len(files_hi) < len(files_all)


def test_write_first_commit_partition_by_option(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "t")
    (
        _df(spark, 0, 100)
        .write.format("snapshot")
        .option("partition_by", "g")
        .option("stats_cols", "k")
        .mode("append")
        .save(root)
    )
    m = snap.read_manifest(root, 1)
    assert m["partition_spec"] == ["g"]
    assert m["stats_cols"] == ["k"]
    assert (
        snap.read_snapshot(spark, root, prune={"g": (3, 3)})
        .filter("g = 3")
        .count()
        == 10
    )


def test_write_null_partition_value_never_pruned(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "t")
    df = spark.range(20).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 5, F.lit(None)).otherwise(
            F.col("id") % 3
        ).alias("g"),
    )
    df.write.format("snapshot").option("partition_by", "g").mode(
        "append"
    ).save(root)
    out = snap.read_snapshot(spark, root)
    assert out.count() == 20
    assert out.filter("g is null").count() == 5
    # null-tuple files are conservatively kept by any partition prune
    m = snap.read_manifest(root, 1)
    kept = snap.pruned_manifest_files(root, m, {"g": (2, 2)})
    got = {
        r.k
        for r in snap.read_snapshot(spark, root, prune={"g": (2, 2)})
        .filter("g = 2 or g is null")
        .collect()
    }
    assert kept and {r.k for r in df.filter("g = 2").collect()} <= got


# ---- streaming sink -------------------------------------------------


def _feed(spark, tmp_path, n_files=3):
    src = str(tmp_path / "feed")
    _df(spark, 0, 300).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(src)
    return src


def _run_sink(spark, src, root, ckpt, stream_id, **opts):
    q = (
        spark.readStream.schema("k bigint, g bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.format("snapshot")
        .option("stream_id", stream_id)
        .option("checkpointLocation", ckpt)
    )
    for k, v in opts.items():
        q = q.option(k, v)
    q = q.trigger(availableNow=True).start(root)
    q.awaitTermination(180)


def test_stream_sink_append_one_version_per_batch(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "t")
    src = _feed(spark, tmp_path, n_files=3)
    _run_sink(spark, src, root, str(tmp_path / "ckpt"), "s1")
    assert snap.current_version(root) == 3  # one commit per micro-batch
    out = snap.read_snapshot(spark, root)
    assert out.count() == 300
    assert out.agg(F.sum("k")).first()[0] == sum(range(300))
    # ledger rows recorded on every commit
    for v in (1, 2, 3):
        m = snap.read_manifest(root, v)
        assert m["stream_id"] == "s1" and m["batch_id"] in (0, 1, 2)
    # idle re-run adds nothing
    _run_sink(spark, src, root, str(tmp_path / "ckpt"), "s1")
    assert snap.current_version(root) == 3


def test_stream_sink_replayed_batch_skipped_by_ledger(
    registered, tmp_path
):
    """A batch re-delivered after a crash between the manifest commit
    and Spark's checkpoint commit must be recognized and skipped —
    drive the writer's commit() directly with an already-committed
    batchId."""
    from metastore_spark.sources.spark_source import (
        _SnapshotStreamWriter,
        _WriteResult,
    )

    spark = registered
    root = str(tmp_path / "t")
    src = _feed(spark, tmp_path)
    _run_sink(spark, src, root, str(tmp_path / "ckpt"), "s1")
    head = snap.current_version(root)
    w = _SnapshotStreamWriter(
        root,
        spark.createDataFrame([], "k bigint, g bigint").schema,
        {"stream_id": "s1"},
    )
    w.commit([_WriteResult(["data/zz/never-written.parquet"])], 0)
    assert snap.current_version(root) == head  # skipped, not re-applied
    assert snap.read_snapshot(spark, root).count() == 300


def test_stream_sink_upsert_latest_wins(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 200))
    # CDC feed: restate g for even keys (x100), insert 200..250
    feed = (
        _df(spark, 0, 200)
        .filter(F.col("k") % 2 == 0)
        .withColumn("g", F.col("g") * 100)
        .unionByName(_df(spark, 200, 250))
    )
    src = str(tmp_path / "cdc")
    feed.repartition(4).write.mode("overwrite").parquet(src)
    _run_sink(
        spark,
        src,
        root,
        str(tmp_path / "ckpt"),
        "cdc1",
        mode="upsert",
        keys="k",
    )
    assert snap.current_version(root) == 5  # base + 4 upsert commits
    out = snap.read_snapshot(spark, root)
    assert out.count() == 250  # one row per key
    assert out.filter("k = 4").first().g == 400  # restated served
    assert out.filter("k = 3").first().g == 3  # untouched odd key
    assert out.filter("k = 210").first().g == 0  # insert present
    # compact folds the accumulated eq-deletes; same rows
    snap.commit_with_retry(
        root, lambda: snap.compact(spark, root, target_files=2)
    )
    folded = snap.read_snapshot(spark, root)
    assert folded.count() == 250
    assert folded.filter("k = 4").first().g == 400


def test_stream_sink_upsert_bootstraps_empty_table(
    registered, tmp_path
):
    spark = registered
    root = str(tmp_path / "t")
    src = str(tmp_path / "cdc")
    _df(spark, 0, 50).coalesce(1).write.mode("overwrite").parquet(src)
    _run_sink(
        spark,
        src,
        root,
        str(tmp_path / "ckpt"),
        "cdc1",
        mode="upsert",
        keys="k",
    )
    assert snap.current_version(root) == 1
    assert snap.read_snapshot(spark, root).count() == 50


def test_stream_sink_requires_stream_id_and_valid_mode(
    registered, tmp_path
):
    spark = registered
    src = _feed(spark, tmp_path)
    with pytest.raises(Exception, match="stream_id"):
        _run_sink(
            spark,
            src,
            str(tmp_path / "t1"),
            str(tmp_path / "c1"),
            "",
        )
    with pytest.raises(Exception, match="keys"):
        _run_sink(
            spark,
            src,
            str(tmp_path / "t2"),
            str(tmp_path / "c2"),
            "s",
            mode="upsert",
        )


# ---- TIMESTAMP AS OF through the reader -----------------------------


def test_reader_timestamp_as_of_boundaries(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100))
    t1 = snap._manifest_ts_us(snap.read_manifest(root, 1)) / 1e6
    snap.commit_append(spark, root, _df(spark, 100, 150))

    def rd():
        return spark.read.format("snapshot")

    # exact commit instant -> that version; between commits -> older
    assert rd().option("timestamp", str(t1)).load(root).count() == 100
    assert (
        rd().option("timestamp", str(t1 + 1e-6)).load(root).count()
        == 100
    )
    # far future -> head; equals the library resolution
    now = rd().option("timestamp", str(t1 + 1e6)).load(root)
    assert _sorted(now) == _sorted(
        snap.read_snapshot(spark, root, timestamp=t1 + 1e6)
    )
    # ISO-8601 strings resolve too
    import datetime

    iso = datetime.datetime.fromtimestamp(t1).isoformat()
    assert rd().option("timestamp", iso).load(root).count() == 100
    # pre-creation -> typed ValueError
    with pytest.raises(Exception, match="predates"):
        rd().option("timestamp", str(t1 - 10)).load(root).schema
    # version and timestamp are mutually exclusive
    with pytest.raises(Exception, match="mutually exclusive"):
        rd().option("timestamp", str(t1)).option("version", 1).load(
            root
        ).schema


def test_reader_timestamp_behind_retention_fails_typed(
    registered, tmp_path
):
    spark = registered
    root = str(tmp_path / "t")
    ts = []
    for lo in (0, 100, 200, 300):
        snap.commit_append(spark, root, _df(spark, lo, lo + 100))
        ts.append(
            snap._manifest_ts_us(
                snap.read_manifest(root, snap.current_version(root))
            )
            / 1e6
        )
    snap.expire_snapshots(root, keep_last=2)
    # Spark wraps the typed RetentionExpired in AnalysisException at
    # the DataSource boundary; the typed message survives
    with pytest.raises(Exception, match="RetentionExpired|expired"):
        spark.read.format("snapshot").option(
            "timestamp", str(ts[0])
        ).load(root).schema
    assert (
        spark.read.format("snapshot")
        .option("timestamp", str(ts[3]))
        .load(root)
        .count()
        == 400
    )


# ---- metadata tables through the reader ------------------------------


def test_metadata_tables_match_library_views(registered, tmp_path):
    """option("metadata", <kind>) must serve the SAME rows as the
    library's table_history / table_files / table_partitions /
    table_refs / read_amplification — one source of numbers, two
    spellings."""
    spark = registered
    root = str(tmp_path / "t")
    snap.commit_append(
        spark, root, _df(spark, 0, 100), partition_by=["g"]
    )
    snap.commit_mor_upsert(
        spark,
        root,
        _df(spark, 0, 10).withColumn("g", F.col("g") + 100),
        ["k"],
    )
    snap.create_tag(root, "pin")
    snap.create_branch(root, "b")

    def meta(kind):
        return (
            spark.read.format("snapshot")
            .option("metadata", kind)
            .load(root)
        )

    hist_src = meta("history").orderBy("version").collect()
    hist_lib = snap.table_history(spark, root).orderBy("version").collect()
    assert hist_src == hist_lib
    assert hist_src[-1].n_eq_delete_entries == 1

    files_src = meta("files").orderBy("file").collect()
    files_lib = snap.table_files(spark, root).orderBy("file").collect()
    assert [tuple(r) for r in files_src] == [tuple(r) for r in files_lib]

    parts_src = meta("partitions").orderBy("g").collect()
    parts_lib = (
        snap.table_partitions(spark, root).orderBy("g").collect()
    )
    assert [tuple(r) for r in parts_src] == [tuple(r) for r in parts_lib]

    refs_src = meta("refs").orderBy("ref").collect()
    refs_lib = snap.table_refs(spark, root).orderBy("ref").collect()
    assert refs_src == refs_lib

    amp = meta("amplification").first()
    ra = snap.read_amplification(root)
    assert amp.n_eq_delete_entries == ra["n_eq_delete_entries"] == 1
    assert amp.compact_recommended == ra["compact_recommended"]

    with pytest.raises(Exception, match="unknown metadata table"):
        meta("nope").schema


def test_write_append_to_branch_wap(registered, tmp_path):
    """Write-audit-publish through df.write: option("ref") appends to
    a branch, the trunk stays untouched until publish_branch, and
    overwrite-to-branch is rejected (publish IS the audited replace)."""
    spark = registered
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100))
    snap.create_branch(root, "audit")
    (
        _df(spark, 100, 150)
        .write.format("snapshot")
        .option("ref", "audit")
        .mode("append")
        .save(root)
    )
    assert snap.read_snapshot(spark, root).count() == 100  # trunk intact
    assert (
        snap.read_snapshot(spark, root, ref="audit").count() == 150
    )
    snap.publish_branch(root, "audit")
    assert snap.read_snapshot(spark, root).count() == 150
    with pytest.raises(Exception, match="no branch"):
        _df(spark, 0, 5).write.format("snapshot").option(
            "ref", "ghost"
        ).mode("append").save(root)
    with pytest.raises(Exception, match="trunk"):
        _df(spark, 0, 5).write.format("snapshot").option(
            "ref", "audit"
        ).mode("overwrite").save(root)


def test_write_partition_values_hive_escaped(registered, tmp_path):
    """Partition values containing '/', '=', '%', and spaces must
    survive the hive path round-trip: the writer percent-quotes path
    components and `_partition_values` unquotes them, so pruning and
    reads resolve the exact tuples."""
    spark = registered
    root = str(tmp_path / "t")
    vals = ["a/b", "a=b", "10% off", "plain", "sp ace"]
    df = spark.createDataFrame(
        [(i, vals[i % 5]) for i in range(50)], "k long, g string"
    )
    df.write.format("snapshot").option("partition_by", "g").mode(
        "append"
    ).save(root)
    out = snap.read_snapshot(spark, root)
    assert out.count() == 50
    got = {r.g for r in out.select("g").distinct().collect()}
    assert got == set(vals)
    # partition tuples resolved exactly -> value-set prune hits one
    m = snap.read_manifest(root, 1)
    only = snap.pruned_manifest_files(root, m, {"g": ["a=b"]})
    assert 0 < len(only) < len(snap.manifest_files(root, m))
    assert (
        snap.read_snapshot(spark, root, prune={"g": ["a=b"]})
        .filter(F.col("g") == "a=b")
        .count()
        == 10
    )


def test_write_abort_cleans_staged_task_dirs(registered, tmp_path):
    """A failed write job must leave no manifest commit; abort()'s
    best-effort cleanup removes the dirs of tasks that DID return a
    commit message."""
    spark = registered
    root = str(tmp_path / "t")
    _df(spark, 0, 10).write.format("snapshot").mode("append").save(root)
    bad = _df(spark, 0, 100).withColumn(
        "g",
        F.when(F.col("k") < 99, F.col("g")).otherwise(
            F.expr("raise_error('task boom')").cast("long")
        ),
    )
    with pytest.raises(Exception, match="task boom"):
        bad.write.format("snapshot").mode("append").save(root)
    assert snap.current_version(root) == 1  # no commit from the failure
    assert snap.read_snapshot(spark, root).count() == 10


def test_reader_prune_typed_by_committed_schema(registered, tmp_path):
    """ADVICE r10: prune literals must be typed by the COMMITTED
    schema — a numeric-looking bound on a STRING column stays a
    string (zero-padded ids), an int column's bound becomes an int."""
    spark = registered
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(f"{i:04d}", i) for i in range(100)], "sid string, v long"
    )
    snap.commit_append(spark, root, df.repartition(4), stats_cols=["sid", "v"])

    rd = (
        spark.read.format("snapshot")
        .option("prune.sid", "0010,0019")
        .load(root)
        .filter((F.col("sid") >= "0010") & (F.col("sid") <= "0019"))
    )
    assert rd.count() == 10  # string bounds compare lexically, no crash
    rd2 = (
        spark.read.format("snapshot")
        .option("prune.v", "10,19")
        .load(root)
        .filter((F.col("v") >= 10) & (F.col("v") <= 19))
    )
    assert rd2.count() == 10
    with pytest.raises(Exception, match="not a primitive column"):
        spark.read.format("snapshot").option(
            "prune.ghost", "1,2"
        ).load(root).count()


def test_stream_sink_preserves_partition_layout(registered, tmp_path):
    """Micro-batches through the stream sink land hive-laid-out under
    the table's inherited partition spec, so partition pruning works
    on stream-written cohorts exactly as on batch ones."""
    spark = registered
    root = str(tmp_path / "t")
    snap.commit_append(
        spark, root, _df(spark, 0, 50), partition_by=["g"]
    )
    src = str(tmp_path / "feed")
    _df(spark, 50, 200).repartition(3).write.mode("overwrite").parquet(src)
    _run_sink(spark, src, root, str(tmp_path / "ckpt"), "s1")
    m = snap.read_manifest(root, snap.current_version(root))
    assert m["partition_spec"] == ["g"]
    only = snap.pruned_manifest_files(root, m, {"g": (4, 4)})
    assert 0 < len(only) < len(snap.manifest_files(root, m))
    assert (
        snap.read_snapshot(spark, root, prune={"g": (4, 4)})
        .filter("g = 4")
        .count()
        == 20
    )


def test_metadata_partitions_two_column_spec(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "t")
    df = spark.range(60).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("a"),
        (F.col("id") % 2).cast("string").alias("b"),
    )
    snap.commit_append(spark, root, df, partition_by=["a", "b"])
    src = (
        spark.read.format("snapshot")
        .option("metadata", "partitions")
        .load(root)
        .orderBy("a", "b")
        .collect()
    )
    lib = (
        snap.table_partitions(spark, root).orderBy("a", "b").collect()
    )
    assert [tuple(r) for r in src] == [tuple(r) for r in lib]
    assert len(src) == 6 and all(r.n_rows == 10 for r in src)


def test_metadata_partitions_with_null_partition_files(
    registered, tmp_path
):
    """Files whose partition value is hive-null parse to a None
    partition tuple; the partitions metadata sort must not compare
    None against strings (ADVICE r11) — the null group surfaces as an
    explicit leading row instead of a TypeError."""
    spark = registered
    root = str(tmp_path / "t")
    df = spark.range(20).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 5, F.lit(None))
        .otherwise((F.col("id") % 3).cast("string"))
        .alias("g"),
    )
    df.write.format("snapshot").option("partition_by", "g").mode(
        "append"
    ).save(root)
    rows = (
        spark.read.format("snapshot")
        .option("metadata", "partitions")
        .load(root)
        .collect()
    )
    by_g = {r.g: r.n_rows for r in rows}
    assert None in by_g and by_g[None] == 5
    assert sum(r.n_rows for r in rows) == 20
    # null group sorts first (None-safe key orders it before strings)
    assert rows[0].g is None


def test_write_nan_partition_rows_not_lost(registered, tmp_path):
    """A NaN in a float partition column forms its own arrow group,
    but pc.equal(NaN, NaN) is false — without the is_nan branch those
    rows silently vanish from every staged file (ADVICE r11)."""
    spark = registered
    root = str(tmp_path / "t")
    df = spark.range(12).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 3, F.lit(float("nan")))
        .when(F.col("id") < 6, F.lit(None).cast("double"))
        .otherwise((F.col("id") % 2).cast("double"))
        .alias("g"),
    )
    df.write.format("snapshot").option("partition_by", "g").mode(
        "append"
    ).save(root)
    out = snap.read_snapshot(spark, root)
    assert out.count() == 12
    assert out.filter(F.isnan("g")).count() == 3
    assert out.filter(F.col("g").isNull()).count() == 3


def test_prune_option_on_date_partition_column(registered, tmp_path):
    """prune./prune_in. on a date-typed identity partition: the typed
    bound (datetime.date) must meet a date-coerced path value in
    _bound_excludes instead of raising str-vs-date (ADVICE r11)."""
    spark = registered
    root = str(tmp_path / "t")
    df = spark.range(30).select(
        F.col("id").alias("k"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 3).cast("int")).alias("d"),
    )
    df.write.format("snapshot").option("partition_by", "d").mode(
        "append"
    ).save(root)
    picked = (
        spark.read.format("snapshot")
        .option("prune.d", "2024-01-02,2024-01-02")
        .load(root)
    )
    assert picked.filter("d = DATE'2024-01-02'").count() == 10
    # the prune really cut the file list, not just the rows
    m = snap.read_manifest(root, 1)
    import datetime

    kept = snap.pruned_manifest_files(
        root,
        m,
        {"d": (datetime.date(2024, 1, 2), datetime.date(2024, 1, 2))},
    )
    assert 0 < len(kept) < len(snap.manifest_files(root, m))
