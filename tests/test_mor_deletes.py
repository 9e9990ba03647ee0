"""Merge-on-read position deletes (Iceberg v2 position deletes /
Delta deletion vectors): zero-rewrite deletes applied at read
assembly, cleared by compaction
(metastore_spark/sources/snapshots.py commit_mor_delete)."""

import os
import time

import pytest
from pyspark.sql import functions as F

from metastore_spark.sources import snapshots as snap


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("g")
    )


def test_mor_delete_rewrites_nothing(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 1000).repartition(4))
    f1 = set(snap.files_of(root, 1))
    snap.commit_mor_delete(spark, root, F.col("g") == 3)
    assert set(snap.files_of(root, 2)) == f1  # zero data files rewritten
    assert snap.read_snapshot(spark, root).count() == 900
    assert snap.read_snapshot(spark, root).filter("g = 3").count() == 0
    # time travel still sees the pre-delete rows
    assert snap.read_snapshot(spark, root, 1).count() == 1000
    assert snap.read_manifest(root, 2)["op"] == "delete-mor"


def test_mor_deletes_accumulate_and_carry(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 1000).repartition(4))
    snap.commit_mor_delete(spark, root, F.col("g") == 3)
    snap.commit_mor_delete(spark, root, F.col("g") == 4)
    assert snap.read_snapshot(spark, root).count() == 800
    # every later commit type carries the delete set forward
    snap.commit_append(spark, root, _df(spark, 1000, 1100))
    assert snap.read_snapshot(spark, root).count() == 900
    snap.rename_column(root, "g", "grp")
    assert (
        snap.read_snapshot(spark, root).filter("grp = 3").count() == 10
    )  # only the post-delete append's rows survive
    total = snap.read_snapshot(spark, root).agg(F.sum("k")).first()[0]
    keep = [i for i in range(1000) if i % 10 not in (3, 4)] + list(
        range(1000, 1100)
    )
    assert total == sum(keep)


def test_cow_delete_does_not_resurrect_mor_rows(spark, tmp_path):
    """A COW rewrite of files containing MOR-deleted rows must build
    its survivors from the deletes-applied read."""
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 1000).repartition(4))
    snap.commit_mor_delete(spark, root, F.col("g") == 3)
    snap.commit_delete_where(spark, root, F.col("g") == 5)  # rewrites all
    head = snap.read_snapshot(spark, root)
    assert head.count() == 800
    assert head.filter("g in (3, 5)").count() == 0


def test_mor_then_merge_upsert(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100).repartition(2))
    snap.commit_mor_delete(spark, root, F.col("g") == 3)
    src = spark.range(0, 5).select(
        F.col("id").alias("k"), F.lit(77).cast("long").alias("g")
    )
    snap.commit_merge(spark, root, src, ["k"])
    head = snap.read_snapshot(spark, root)
    # k=3 was MOR-deleted, then re-inserted by the merge (no target
    # match since the row is gone from the read)
    assert head.filter("k = 3").count() == 1
    assert head.filter("g = 3").count() == 0
    # 90 live rows, 4 of them replaced in place, k=3 re-inserted
    assert head.count() == 91


def test_compact_applies_and_clears_mor_deletes(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 1000).repartition(4))
    snap.commit_mor_delete(spark, root, F.col("g") == 3)
    v = snap.compact(spark, root, target_files=1)
    m = snap.read_manifest(root, v)
    assert not m.get("delete_files")
    assert snap.read_snapshot(spark, root, v).count() == 900
    # physically gone: re-reading the fold finds no g=3 anywhere
    assert snap.read_snapshot(spark, root, v).filter("g = 3").count() == 0


def test_compact_aborts_on_concurrent_mor_delete(
    spark, tmp_path, monkeypatch
):
    """Compaction folds under the BASE's delete set and clears
    delete_files — a delete-mor landing mid-fold must abort it, or
    its rows resurrect inside the fold."""
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 400).repartition(4))
    orig = snap._write_data_files
    state = {"raced": False}

    def hooked(df, r, partition_by=None):
        files = orig(df, r, partition_by)
        if not state["raced"]:
            state["raced"] = True
            monkeypatch.setattr(snap, "_write_data_files", orig)
            snap.commit_mor_delete(spark, root, F.col("g") == 7)
        return files

    monkeypatch.setattr(snap, "_write_data_files", hooked)
    with pytest.raises(snap.ConcurrentCommit):
        snap.compact(spark, root, target_files=1)
    # the MOR delete survives, un-resurrected
    assert snap.read_snapshot(spark, root).filter("g = 7").count() == 0
    # rerun against the new head succeeds and clears the deletes
    v = snap.compact(spark, root, target_files=1)
    assert snap.read_snapshot(spark, root, v).count() == 360
    assert not snap.read_manifest(root, v).get("delete_files")


def test_mor_on_branch_and_publish(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100).repartition(2))
    snap.create_branch(root, "audit")
    snap.commit_mor_delete(spark, root, F.col("g") == 0, ref="audit")
    assert snap.read_snapshot(spark, root).count() == 100  # trunk intact
    assert snap.read_snapshot(spark, root, ref="audit").count() == 90
    snap.publish_branch(root, "audit")
    assert snap.read_snapshot(spark, root).count() == 90


def test_mor_survives_rollback(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100).repartition(2))
    snap.commit_mor_delete(spark, root, F.col("g") == 0)  # v2
    snap.commit_append(spark, root, _df(spark, 100, 200))  # v3
    snap.rollback_to(root, 2)  # v4 = v2's row set incl. delete state
    assert snap.read_snapshot(spark, root).count() == 90
    assert snap.read_snapshot(spark, root).filter("g = 0").count() == 0


def test_mor_null_predicate_keeps_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(10).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 5, F.col("id")).alias("g"),
    )
    snap.commit_append(spark, root, df)
    snap.commit_mor_delete(spark, root, F.col("g") < 3)
    # NULL-g rows evaluate NULL -> kept (SQL DELETE semantics)
    assert snap.read_snapshot(spark, root).count() == 7


def test_mor_scan_prune_scopes_the_position_scan(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _df(spark, 0, 300).withColumn(
        "day", (F.col("k") % 3).cast("string")
    )
    snap.commit_append(spark, root, df, partition_by=["day"])
    snap.commit_mor_delete(
        spark,
        root,
        (F.col("day") == "1") & (F.col("g") == 1),
        scan_prune={"day": ["1"]},
    )
    head = snap.read_snapshot(spark, root)
    assert head.count() == 300 - 30
    assert head.filter("day = '1' and g = 1").count() == 0


def test_expire_reclaims_expired_delete_files(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100).repartition(2))
    snap.commit_mor_delete(spark, root, F.col("g") == 0)  # v2
    del_files = snap.read_manifest(root, 2)["delete_files"]
    assert del_files
    v = snap.compact(spark, root, target_files=1)  # v3 clears deletes
    for lo in range(3):
        snap.commit_append(spark, root, _df(spark, 100 + lo, 101 + lo))
    snap.expire_snapshots(root, keep_last=2)
    # delete files of expired versions are reclaimed...
    for f in del_files:
        assert not os.path.exists(os.path.join(root, f)), f
    # ...and the head still reads correctly
    assert snap.read_snapshot(spark, root).count() == 93


def test_expire_keeps_live_delete_files(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100).repartition(2))
    snap.commit_mor_delete(spark, root, F.col("g") == 0)
    for lo in range(3):
        snap.commit_append(spark, root, _df(spark, 100 + lo, 101 + lo))
    snap.expire_snapshots(root, keep_last=2)
    head = snap.read_snapshot(spark, root)
    assert head.count() == 93
    assert head.filter("g = 0 and k < 100").count() == 0


def test_mor_across_schema_evolution_cohorts(spark, tmp_path):
    """MOR positions join per-file, so evolved tables (multi-cohort
    grouped reads) must apply them inside every cohort."""
    root = str(tmp_path / "t")
    snap.commit_append(
        spark,
        root,
        spark.range(50).select(
            F.col("id").alias("k"),
            (F.col("id") % 10).cast("int").alias("g"),
        ),
    )
    snap.widen_column(root, "g", "long")
    snap.commit_append(spark, root, _df(spark, 50, 100))
    snap.commit_mor_delete(spark, root, F.col("g") == 2)
    head = snap.read_snapshot(spark, root)
    assert head.count() == 90
    assert head.filter("g = 2").count() == 0
    # both cohorts lost exactly their g=2 rows
    assert head.filter("k < 50").count() == 45


# ------------------------------------------------- atomic replaceWhere


def test_overwrite_where_replaces_slice_atomically(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _df(spark, 0, 300).withColumn(
        "day", (F.col("k") % 3).cast("string")
    )
    snap.commit_append(spark, root, df, partition_by=["day"])
    # backfill day 1 with corrected values (doubled), one commit
    fixed = (
        _df(spark, 0, 300)
        .withColumn("day", (F.col("k") % 3).cast("string"))
        .filter(F.col("day") == "1")
        .withColumn("g", F.col("g") * 2)
    )
    v = snap.commit_overwrite_where(
        spark, root, fixed, F.col("day") == "1",
        scan_prune={"day": ["1"]},
    )
    assert snap.read_manifest(root, v)["op"] == "overwrite"
    head = snap.read_snapshot(spark, root)
    assert head.count() == 300
    assert head.filter("day = '1'").agg(F.sum("g")).first()[0] == 2 * sum(
        i % 10 for i in range(300) if i % 3 == 1
    )
    # other days untouched, history intact
    assert head.filter("day = '0'").agg(F.sum("g")).first()[0] == sum(
        i % 10 for i in range(300) if i % 3 == 0
    )
    assert snap.read_snapshot(spark, root, 1).count() == 300


def test_overwrite_where_rejects_stray_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _df(spark, 0, 100).withColumn(
        "day", (F.col("k") % 2).cast("string")
    )
    snap.commit_append(spark, root, df)
    with pytest.raises(ValueError, match="predicate"):
        snap.commit_overwrite_where(
            spark, root, df, F.col("day") == "1"
        )
    assert snap.current_version(root) == 1  # nothing committed


def test_overwrite_where_not_in_append_feed(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100))
    snap.commit_overwrite_where(
        spark,
        root,
        _df(spark, 0, 100).filter("g = 1").withColumn(
            "g", F.lit(1).cast("long")
        ),
        F.col("g") == 1,
    )
    assert snap.read_appends(spark, root, 1).count() == 0


def test_overwrite_where_carries_mor_deletes(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100).repartition(2))
    snap.commit_mor_delete(spark, root, F.col("g") == 0)
    snap.commit_overwrite_where(
        spark,
        root,
        _df(spark, 0, 100).filter("g = 5").withColumn(
            "g", F.lit(5).cast("long")
        ),
        F.col("g") == 5,
    )
    head = snap.read_snapshot(spark, root)
    assert head.filter("g = 0").count() == 0  # MOR delete survived
    assert head.count() == 90  # 10 MOR-deleted, 10 replaced in place


def test_overwrite_where_on_branch(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100))
    snap.create_branch(root, "b")
    snap.commit_overwrite_where(
        spark,
        root,
        _df(spark, 200, 210).withColumn("g", F.lit(3).cast("long")),
        F.col("g") == 3,
        ref="b",
    )
    assert snap.read_snapshot(spark, root).count() == 100
    b = snap.read_snapshot(spark, root, ref="b")
    assert b.count() == 100  # 10 removed, 10 inserted
    assert b.filter("g = 3 and k >= 200").count() == 10


# ------------------------------------------------- equality deletes


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "g long")


def test_eq_delete_rewrites_nothing_and_scans_nothing(spark, tmp_path):
    """VERDICT r9 task 4: delete-by-key with NO scan at commit — zero
    data files rewritten AND zero jobs over the table at commit time
    (the keys frame is the caller's, O(keys))."""
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 1000).repartition(4))
    f1 = set(snap.files_of(root, 1))
    snap.commit_mor_delete_keys(spark, root, _keys(spark, [3, 4]))
    assert set(snap.files_of(root, 2)) == f1
    out = snap.read_snapshot(spark, root)
    assert out.count() == 800
    assert out.filter("g in (3, 4)").count() == 0
    # pinned pre-delete version intact (time travel)
    assert snap.read_snapshot(spark, root, 1).count() == 1000
    assert snap.read_manifest(root, 2)["op"] == "delete-mor-eq"


def test_eq_delete_scopes_to_prior_rows_only(spark, tmp_path):
    """The Iceberg sequence-number rule: a row with a deleted key
    appended AFTER the delete (CDC re-insert) is served."""
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100))
    snap.commit_mor_delete_keys(spark, root, _keys(spark, [3]))
    snap.commit_append(spark, root, _df(spark, 100, 140))  # has g=3 rows
    out = snap.read_snapshot(spark, root)
    got = {r["k"] for r in out.filter("g = 3").collect()}
    assert got == {k for k in range(100, 140) if k % 10 == 3}
    assert out.count() == 100 - 10 + 40


def test_eq_delete_null_keys_never_match(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 20).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 5, None).otherwise(F.col("id") % 10).alias("g"),
    )
    snap.commit_append(spark, root, df)
    keys = spark.createDataFrame([(None,)], "g long")
    snap.commit_mor_delete_keys(spark, root, keys)
    # SQL equality: NULL = NULL is not TRUE, so null-keyed rows stay
    assert snap.read_snapshot(spark, root).count() == 20


def test_eq_delete_multi_column_key(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100))
    keys = spark.createDataFrame([(13, 3), (27, 7)], "k long, g long")
    snap.commit_mor_delete_keys(spark, root, keys)
    out = snap.read_snapshot(spark, root)
    assert out.count() == 98
    assert out.filter("k in (13, 27)").count() == 0
    # single-column matches of the pair keys survive
    assert out.filter("g = 3").count() == 9


def test_eq_delete_rejects_unknown_key_column(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 10))
    with pytest.raises(ValueError, match="not in the committed schema"):
        snap.commit_mor_delete_keys(
            spark, root, spark.createDataFrame([(1,)], "nope long")
        )


def test_eq_deletes_stack_with_position_deletes(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100))
    snap.commit_mor_delete(spark, root, F.col("g") == 4)
    snap.commit_mor_delete_keys(spark, root, _keys(spark, [7]))
    out = snap.read_snapshot(spark, root)
    assert out.count() == 80
    assert out.filter("g in (4, 7)").count() == 0
    # and a second eq delete accumulates
    snap.commit_mor_delete_keys(spark, root, _keys(spark, [9]))
    assert snap.read_snapshot(spark, root).count() == 70


def test_compact_applies_and_clears_eq_deletes(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100).repartition(4))
    snap.commit_mor_delete_keys(spark, root, _keys(spark, [3]))
    snap.commit_append(spark, root, _df(spark, 100, 110))
    v = snap.compact(spark, root, target_files=1)
    m = snap.read_manifest(root, v)
    assert not m.get("eq_delete_files")
    out = snap.read_snapshot(spark, root, v)
    assert out.count() == 100
    # pre-delete g=3 gone, post-delete g=3 (k=103) kept
    assert {r["k"] for r in out.filter("g = 3").collect()} == {103}


def test_compact_aborts_on_concurrent_eq_delete(
    spark, tmp_path, monkeypatch
):
    """An equality delete landing mid-fold must abort the compaction
    — the fold applied the BASE's key sets and clears the list, so
    committing it would resurrect the newly-deleted keys."""
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 400).repartition(4))
    orig = snap._write_data_files
    state = {"raced": False}

    def hooked(df, r, partition_by=None):
        files = orig(df, r, partition_by)
        if not state["raced"]:
            state["raced"] = True
            monkeypatch.setattr(snap, "_write_data_files", orig)
            snap.commit_mor_delete_keys(spark, root, _keys(spark, [7]))
        return files

    monkeypatch.setattr(snap, "_write_data_files", hooked)
    with pytest.raises(snap.ConcurrentCommit, match="equality deletes"):
        snap.compact(spark, root, target_files=1)
    # the eq delete survives, un-resurrected
    assert snap.read_snapshot(spark, root).filter("g = 7").count() == 0
    # rerun against the new head succeeds and clears the deletes
    v = snap.compact(spark, root, target_files=1)
    assert snap.read_snapshot(spark, root, v).count() == 360
    assert not snap.read_manifest(root, v).get("eq_delete_files")


def test_eq_delete_survives_cow_merge_and_overwrite(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100).repartition(4))
    snap.commit_mor_delete_keys(spark, root, _keys(spark, [3]))
    # COW delete of another key: rewrite applies eq deletes to the
    # rewritten rows and carries the entry for untouched files
    snap.commit_delete_where(spark, root, F.col("g") == 5)
    out = snap.read_snapshot(spark, root)
    assert out.count() == 80
    assert out.filter("g in (3, 5)").count() == 0


def test_eq_delete_rollback_restores_keys(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100))
    snap.commit_mor_delete_keys(spark, root, _keys(spark, [3]))
    snap.rollback_to(root, 1)
    assert snap.read_snapshot(spark, root).count() == 100
    # and rolling forward to v2 again re-applies
    assert snap.read_snapshot(spark, root, 2).count() == 90


def test_eq_delete_blocks_rename_drop_of_key_column(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100))
    snap.commit_mor_delete_keys(spark, root, _keys(spark, [3]))
    with pytest.raises(snap.SchemaEvolutionError, match="equality-delete"):
        snap.rename_column(root, "g", "grp")
    with pytest.raises(snap.SchemaEvolutionError, match="equality-delete"):
        snap.drop_column(root, "g")
    # non-key columns still evolve freely
    snap.rename_column(root, "k", "key")
    out = snap.read_snapshot(spark, root)
    assert out.count() == 90 and "key" in out.columns


def test_expire_keeps_eq_key_files_and_scope_segments(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100).repartition(4))
    snap.commit_mor_delete_keys(spark, root, _keys(spark, [3]))
    for i in range(4):
        snap.commit_append(spark, root, _df(spark, 100 + i, 101 + i))
    snap.expire_snapshots(root, keep_last=2)
    out = snap.read_snapshot(spark, root)
    assert out.filter("g = 3 and k < 100").count() == 0
    assert out.count() == 94


def test_eq_delete_change_feed_emits_deleted_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100))
    snap.commit_mor_delete_keys(spark, root, _keys(spark, [3]))
    ch = snap.read_changes(spark, root, 1)
    rows = ch.collect()
    assert {r["_change_type"] for r in rows} == {"delete"}
    assert {r["k"] for r in rows} == {k for k in range(100) if k % 10 == 3}
    # re-deleting the same key is feed-silent (already gone)
    snap.commit_mor_delete_keys(spark, root, _keys(spark, [3]))
    assert snap.read_changes(spark, root, 2).count() == 0


def test_eq_delete_through_spark_datasource(spark, tmp_path):
    from metastore_spark.sources.spark_source import SnapshotDataSource

    spark.dataSource.register(SnapshotDataSource)
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100).repartition(3))
    snap.commit_mor_delete_keys(spark, root, _keys(spark, [3]))
    snap.commit_append(spark, root, _df(spark, 100, 120))
    via_source = spark.read.format("snapshot").load(root)
    via_lib = snap.read_snapshot(spark, root)
    assert sorted(map(tuple, via_source.collect())) == sorted(
        map(tuple, via_lib.collect())
    )
    assert via_source.filter("g = 3 and k < 100").count() == 0
    assert via_source.filter("g = 3 and k >= 100").count() == 2


# --------------------------------------------------- MOR upsert (CDC)


def test_mor_upsert_is_one_atomic_commit_no_rewrite(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100).repartition(4))
    f1 = set(snap.files_of(root, 1))
    up = spark.range(0, 20).select(
        F.col("id").alias("k"), (F.col("id") % 10 + 100).alias("g")
    )  # restate k<20 with g+100, keys k
    snap.commit_mor_upsert(spark, root, up, ["k"])
    assert snap.current_version(root) == 2  # ONE commit
    assert f1 <= set(snap.files_of(root, 2))  # zero files rewritten
    out = snap.read_snapshot(spark, root)
    assert out.count() == 100  # no dupes for updated keys
    assert out.filter("k < 20 and g < 100").count() == 0  # old gone
    assert out.filter("k < 20 and g >= 100").count() == 20  # new served
    assert out.filter("k >= 20 and g >= 100").count() == 0
    # pinned pre-upsert version intact
    assert snap.read_snapshot(spark, root, 1).filter("g >= 100").count() == 0
    assert snap.read_manifest(root, 2)["op"] == "upsert-mor"


def test_mor_upsert_inserts_new_keys(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 50))
    up = _df(spark, 40, 70)  # 10 updates + 20 inserts
    snap.commit_mor_upsert(spark, root, up, ["k"])
    out = snap.read_snapshot(spark, root)
    assert out.count() == 70
    assert {r["k"] for r in out.collect()} == set(range(70))


def test_mor_upsert_latest_wins_across_repeats(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 30))
    for bump in (100, 200):
        up = spark.range(0, 10).select(
            F.col("id").alias("k"), (F.col("id") + bump).alias("g")
        )
        snap.commit_mor_upsert(spark, root, up, ["k"])
    out = snap.read_snapshot(spark, root)
    assert out.count() == 30
    got = {r["k"]: r["g"] for r in out.filter("k < 10").collect()}
    assert got == {k: k + 200 for k in range(10)}  # second upsert wins


def test_mor_upsert_change_feed_emits_delete_insert_pair(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 50))
    up = spark.range(45, 60).select(
        F.col("id").alias("k"), (F.col("id") + 500).alias("g")
    )
    snap.commit_mor_upsert(spark, root, up, ["k"])
    ch = snap.read_changes(spark, root, 1)
    counts = {
        (r["_commit_version"], r["_change_type"]): r["count"]
        for r in ch.groupBy("_commit_version", "_change_type")
        .count()
        .collect()
    }
    # 5 updated keys retract, 15 rows insert (5 updates + 10 new)
    assert counts == {(2, "delete"): 5, (2, "insert"): 15}
    # replaying the feed over v1 reconstructs v2
    assert snap.read_snapshot(spark, root).count() == 60


def test_mor_upsert_not_in_appends_feed(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 50))
    snap.commit_mor_upsert(spark, root, _df(spark, 40, 60), ["k"])
    # like COW merge, an upsert is not an append: consumers of the
    # appends feed reseed via snapshots/CDF for restatements
    assert snap.read_appends(spark, root, 1).count() == 0


def test_mor_upsert_validates_keys_and_empty_table(spark, tmp_path):
    root = str(tmp_path / "t")
    with pytest.raises(ValueError, match="empty table"):
        snap.commit_mor_upsert(spark, root, _df(spark, 0, 5), ["k"])
    snap.commit_append(spark, root, _df(spark, 0, 5))
    with pytest.raises(ValueError, match="not in the frame"):
        snap.commit_mor_upsert(
            spark, root, _df(spark, 0, 5).select("g"), ["k"]
        )
    with pytest.raises(ValueError, match="at least one column"):
        snap.commit_mor_upsert(spark, root, _df(spark, 0, 5), [])


def test_mor_upsert_compact_folds_and_conflicts(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100).repartition(4))
    snap.commit_mor_upsert(
        spark,
        root,
        spark.range(0, 10).select(
            F.col("id").alias("k"), (F.col("id") + 100).alias("g")
        ),
        ["k"],
    )
    v = snap.compact(spark, root, target_files=1)
    m = snap.read_manifest(root, v)
    assert not m.get("eq_delete_files")
    out = snap.read_snapshot(spark, root, v)
    assert out.count() == 100
    assert out.filter("k < 10 and g < 100").count() == 0
    # conflict: an upsert landing mid-fold aborts the compaction
    orig = snap._write_data_files
    state = {"raced": False}

    def hooked(df, r, partition_by=None):
        files = orig(df, r, partition_by)
        if not state["raced"]:
            state["raced"] = True
            monkeypatch.setattr(snap, "_write_data_files", orig)
            snap.commit_mor_upsert(
                spark,
                root,
                spark.range(0, 5).select(
                    F.col("id").alias("k"),
                    (F.col("id") + 900).alias("g"),
                ),
                ["k"],
            )
        return files

    monkeypatch.setattr(snap, "_write_data_files", hooked)
    with pytest.raises(snap.ConcurrentCommit, match="equality deletes"):
        snap.compact(spark, root, target_files=1)
    assert (
        snap.read_snapshot(spark, root).filter("k < 5 and g < 900").count()
        == 0
    )


def test_upsert_sink_exactly_once_replay(spark, tmp_path):
    """A batch re-delivered to the upsert sink (crash between the
    manifest link and the checkpoint commit) must be recognized by
    the (stream_id, batch_id) ledger and skipped — replay converges
    to the same history, nothing double-applied."""
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 50))
    sink = snap.upsert_sink(root, "cdc-1", ["k"])
    up = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") + 100).alias("g")
    )
    sink(up, 0)
    v_after = snap.current_version(root)
    sink(up, 0)  # re-delivery: ledger hit, no new commit
    assert snap.current_version(root) == v_after
    out = snap.read_snapshot(spark, root)
    assert out.count() == 50
    assert out.filter("k < 10 and g < 100").count() == 0
    # a NEW batch commits and latest-wins over the first
    up2 = spark.range(5, 15).select(
        F.col("id").alias("k"), (F.col("id") + 200).alias("g")
    )
    sink(up2, 1)
    got = {r["k"]: r["g"] for r in snap.read_snapshot(spark, root).filter("k < 15").collect()}
    want = {k: k + 100 for k in range(5)}
    want |= {k: k + 200 for k in range(5, 15)}
    assert got == want


def test_eq_delete_after_rename_resolves_old_cohorts(spark, tmp_path):
    """An equality delete committed AFTER a rename binds the NEW name;
    rows in pre-rename files resolve through the column-ID mapping at
    read, so the anti-join on the assembled (committed-name) frame
    must still delete them."""
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 50))
    snap.rename_column(root, "g", "grp")
    snap.commit_append(
        spark,
        root,
        spark.range(50, 80).selectExpr("id as k", "id % 10 as grp"),
    )
    keys = spark.createDataFrame([(3,)], "grp long")
    snap.commit_mor_delete_keys(spark, root, keys)
    out = snap.read_snapshot(spark, root)
    # grp=3 deleted from BOTH cohorts (old files stored it as 'g')
    assert out.filter("grp = 3").count() == 0
    assert out.count() == 80 - 5 - 3


def test_eq_delete_widened_key_column_still_matches(spark, tmp_path):
    """Widening a key column (int->long) after an eq delete keeps the
    join matching: old key files carry the narrow type, the join
    coerces."""
    root = str(tmp_path / "t")
    df = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") % 10).cast("int").alias("g")
    )
    snap.commit_append(spark, root, df)
    keys = spark.createDataFrame([(7,)], "g int")
    snap.commit_mor_delete_keys(spark, root, keys)
    snap.widen_column(root, "g", "long")
    out = snap.read_snapshot(spark, root)
    assert out.filter("g = 7").count() == 0
    assert out.count() == 36
    assert dict(out.dtypes)["g"] == "bigint"
    # the pyarrow DataSource path coerces the narrow key type too
    # (ADVICE r10: it used to error on the mismatched-type anti-join)
    from metastore_spark.sources.spark_source import SnapshotDataSource

    spark.dataSource.register(SnapshotDataSource)
    via_source = spark.read.format("snapshot").load(root)
    assert via_source.filter("g = 7").count() == 0
    assert via_source.count() == 36


def test_timestamp_version_unreachable_tag_island(spark, tmp_path):
    """A tag-pinned manifest BELOW the contiguous retained run is an
    island: timestamp resolution must raise RetentionExpired for
    instants in the gap rather than resolving to the island (the
    versions between island and run are unreconstructable)."""
    import json as _json

    root = str(tmp_path / "t")
    for i in range(5):
        snap.commit_append(spark, root, _df(spark, i * 10, i * 10 + 10))
    for v, t in ((1, 100), (2, 200), (3, 300), (4, 400), (5, 500)):
        p = snap._manifest_path(root, v)
        with open(p) as fh:
            m = _json.load(fh)
        m["ts_us"] = t * 1_000_000
        m["ts"] = t
        with open(p, "w") as fh:
            _json.dump(m, fh)
    snap.create_tag(root, "pin", 1)  # island below the run
    snap.expire_snapshots(root, keep_last=2)
    # v1 survives (tag-pinned), v2-v3 expired, v4-v5 retained
    assert snap.read_snapshot(spark, root, 1).count() == 10
    with pytest.raises(snap.RetentionExpired):
        snap.timestamp_version(root, 250)  # in the expired gap
    with pytest.raises(snap.RetentionExpired):
        snap.timestamp_version(root, 150)  # island instant: also gone
    assert snap.timestamp_version(root, 450) == 4


def test_crashed_upsert_leaves_reclaimable_orphans(spark, tmp_path):
    """A writer killed between the upsert's file writes and the
    manifest link leaves orphan data+key files and NO commit: the
    head is untouched, reads are unaffected, and vacuum reclaims the
    debris once past the abandonment window."""
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 50))
    # crash simulation: stage the upsert's data and key files, die
    # before _commit
    up = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") + 100).alias("g")
    )
    orphan_data = snap._write_data_files(up, root)
    orphan_keys = snap._write_data_files(up.select("k").distinct(), root)
    assert snap.current_version(root) == 1
    assert snap.read_snapshot(spark, root).count() == 50
    old = time.time() - 2 * snap._ORPHAN_AGE_SEC
    for f in orphan_data + orphan_keys:
        p = os.path.join(root, f)
        os.utime(p, (old, old))
        os.utime(os.path.dirname(p), (old, old))
    snap.vacuum(root, keep_last=2)
    for f in orphan_data + orphan_keys:
        assert not os.path.exists(os.path.join(root, f))
    assert snap.read_snapshot(spark, root).count() == 50


def test_upsert_sink_retry_recomputes_scope(
    spark, tmp_path, monkeypatch
):
    """An upsert losing its optimistic commit to a concurrent append
    must retry with the scope RECOMPUTED against the new head: the
    CDC batch is ordered after the interleaved append, so its keys
    must override the interleaved rows too (latest-wins), not slip
    underneath them."""
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 30))
    orig = snap._write_data_files
    state = {"raced": False}

    def hooked(df, r, partition_by=None):
        files = orig(df, r, partition_by)
        if not state["raced"]:
            state["raced"] = True
            monkeypatch.setattr(snap, "_write_data_files", orig)
            # interleaved append REUSES keys 0-4 while the upsert is
            # mid-write: the upsert's first commit attempt loses
            snap.commit_append(
                spark,
                root,
                spark.range(0, 5).select(
                    F.col("id").alias("k"),
                    (F.col("id") + 500).alias("g"),
                ),
            )
        return files

    monkeypatch.setattr(snap, "_write_data_files", hooked)
    sink = snap.upsert_sink(root, "cdc-r", ["k"])
    up = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") + 100).alias("g")
    )
    sink(up, 0)
    out = snap.read_snapshot(spark, root)
    got = {r["k"]: r["g"] for r in out.filter("k < 10").collect()}
    assert got == {k: k + 100 for k in range(10)}  # upsert wins
    assert out.count() == 30


def test_read_amplification_guard_and_maybe_compact(spark, tmp_path):
    """VERDICT r10 task 6: a CDC stream that never compacts must not
    degrade reads SILENTLY — 20 upserts trip the accumulated-entry
    warning, `read_amplification` / table_history surface the counts,
    and the `maybe_compact` policy hook folds the debt."""
    import warnings

    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        for i in range(20):
            snap.commit_mor_upsert(
                spark, root, _df(spark, i, i + 5), ["k"]
            )
    msgs = [
        str(w.message)
        for w in caught
        if issubclass(w.category, RuntimeWarning)
    ]
    assert any("equality-delete entries" in m for m in msgs)
    ra = snap.read_amplification(root)
    assert ra["n_eq_delete_entries"] == 20
    assert ra["worst_segment_entries"] == 20  # the base segment pays all
    assert ra["compact_recommended"]
    hist = {
        r.version: r.n_eq_delete_entries
        for r in snap.table_history(spark, root).collect()
    }
    assert hist[21] == 20 and hist[1] == 0
    before = sorted(
        tuple(r) for r in snap.read_snapshot(spark, root).collect()
    )
    assert snap.maybe_compact(spark, root) == 22  # over threshold: folds
    after_ra = snap.read_amplification(root)
    assert after_ra["n_eq_delete_entries"] == 0
    assert not after_ra["compact_recommended"]
    assert (
        sorted(tuple(r) for r in snap.read_snapshot(spark, root).collect())
        == before
    )
    assert snap.maybe_compact(spark, root) is None  # debt folded: no-op


def test_upsert_sink_auto_compact_bounds_entries(spark, tmp_path):
    """upsert_sink(max_eq_entries=N) keeps a sustained CDC stream's
    read amplification bounded: entries fold whenever they exceed N,
    values stay correct, and history shows the interleaved compacts."""
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100))
    sink = snap.upsert_sink(root, "cdc", ["k"], max_eq_entries=2)
    for i in range(7):
        sink(_df(spark, i * 3, i * 3 + 3).withColumn("g", F.lit(777).cast("long")), i)
        assert (
            snap.read_amplification(root)["n_eq_delete_entries"] <= 2
        )
    out = snap.read_snapshot(spark, root)
    assert out.count() == 100
    assert out.filter("g = 777").count() == 21  # keys 0..20 restated
    ops = [r.op for r in snap.table_history(spark, root).collect()]
    assert "compact" in ops and "upsert-mor" in ops
    # replayed batch: no new version, no double-apply
    head = snap.current_version(root)
    sink(_df(spark, 0, 3).withColumn("g", F.lit(1).cast("long")), 0)
    assert snap.read_snapshot(spark, root).filter("g = 777").count() == 21
    assert snap.current_version(root) == head
