"""The r12 merged sequence-rank equality-delete read plan
(metastore_spark/sources/snapshots.py `_merge_eq_plans` /
`_apply_eq_deletes`): a nested-scope CDC chain must collapse to one
per-key max-rank join + one file-threshold broadcast, produce rows
identical to the per-entry fallback path, and leave non-nested
groups on the fallback path untouched."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from metastore_spark.sources import snapshots as snap


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("g")
    )


def _chain_table(spark, tmp_path, name="t"):
    """v1 base append → v2,v3 upserts → v4 plain append (so both
    upsert entries are PARTIALLY scoped on a head read: the v3 data
    and v4 files postdate v2's entry, the v4 files postdate v3's)."""
    root = str(tmp_path / name)
    snap.commit_append(spark, root, _df(spark, 0, 100).repartition(2))
    snap.commit_mor_upsert(
        spark,
        root,
        _df(spark, 0, 20).withColumn("g", F.lit(77).cast("long")),
        ["k"],
    )
    snap.commit_mor_upsert(
        spark,
        root,
        _df(spark, 10, 30).withColumn("g", F.lit(88).cast("long")),
        ["k"],
    )
    snap.commit_append(spark, root, _df(spark, 200, 210))
    return root


def _expected_chain_rows():
    """CDC semantics of `_chain_table` computed independently."""
    rows = {}
    for k in range(100):
        rows[k] = k % 10
    for k in range(0, 20):
        rows[k] = 77
    for k in range(10, 30):
        rows[k] = 88  # latest wins; inserts 20-29
    for k in range(200, 210):
        rows[k] = k % 10
    return sorted(rows.items())


def test_merge_eq_plans_nested_chain_ranks_and_thresholds():
    plans = [
        (["d1.parquet"], ["k"], {"b.parquet", "c.parquet", "d.parquet"}),
        (["d2.parquet"], ["k"], {"c.parquet", "d.parquet"}),
        (["d3.parquet"], ["k"], {"d.parquet"}),
    ]
    merged, leftover = snap._merge_eq_plans(plans)
    assert leftover == []
    assert len(merged) == 1
    cols, ranked, file_t = merged[0]
    assert cols == ["k"]
    # rank 1 = biggest newer (earliest entry), ascending scope
    assert [p for _r, p in ranked] == [
        ["d1.parquet"], ["d2.parquet"], ["d3.parquet"]
    ]
    # b: first scoped at rank 2; c: rank 3; d: never scoped → n+1
    assert file_t == {"b.parquet": 2, "c.parquet": 3, "d.parquet": 4}


def test_merge_eq_plans_full_scope_group_needs_no_file_table():
    plans = [
        (["d1.parquet"], ["k"], None),
        (["d2.parquet"], ["k"], None),
    ]
    merged, leftover = snap._merge_eq_plans(plans)
    assert leftover == []
    assert merged[0][2] is None  # single anti-join, no _mor_file test


def test_merge_eq_plans_non_nested_group_falls_back():
    plans = [
        (["d1.parquet"], ["k"], {"a.parquet"}),
        (["d2.parquet"], ["k"], {"b.parquet"}),
    ]
    merged, leftover = snap._merge_eq_plans(plans)
    assert merged == []
    assert leftover == plans


def test_merge_eq_plans_groups_by_key_columns():
    plans = [
        (["d1.parquet"], ["k"], None),
        (["d2.parquet"], ["k", "g"], None),
        (["d3.parquet"], ["k"], None),
    ]
    merged, leftover = snap._merge_eq_plans(plans)
    assert leftover == []
    assert [tuple(c) for c, _r, _t in merged] == [("k",), ("k", "g")]


def test_merged_read_matches_expected_cdc_semantics(spark, tmp_path):
    root = _chain_table(spark, tmp_path)
    got = sorted(
        (r["k"], r["g"])
        for r in snap.read_snapshot(spark, root).collect()
    )
    assert got == _expected_chain_rows()


def test_merged_read_matches_per_entry_fallback(
    spark, tmp_path, monkeypatch
):
    root = _chain_table(spark, tmp_path)
    merged_rows = sorted(
        tuple(r) for r in snap.read_snapshot(spark, root).collect()
    )
    # force every plan onto the per-entry fallback path
    monkeypatch.setattr(
        snap, "_merge_eq_plans", lambda plans: ([], list(plans))
    )
    fallback_rows = sorted(
        tuple(r) for r in snap.read_snapshot(spark, root).collect()
    )
    assert merged_rows == fallback_rows


def test_merged_head_read_plans_constant_join_count(spark, tmp_path):
    """4 accumulated upsert entries must NOT cost 1-2 joins each: the
    merged plan carries exactly one key join + one file-threshold
    join regardless of entry count."""
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100).repartition(2))
    for i in range(4):
        snap.commit_mor_upsert(
            spark,
            root,
            _df(spark, 10 * i, 10 * i + 10).withColumn(
                "g", F.lit(50 + i).cast("long")
            ),
            ["k"],
        )
    buf = io.StringIO()
    with redirect_stdout(buf):
        snap.read_snapshot(spark, root).explain("formatted")
    text = buf.getvalue()
    # "formatted" prints each operator in the tree AND a details
    # section; "Join type:" appears exactly once per join node
    n_joins = text.count("Join type:")
    assert n_joins <= 2, f"expected <=2 joins, saw {n_joins}:\n{text}"


def test_merged_head_read_plans_single_key_scan(spark, tmp_path):
    """The merged path reads ALL entries' key sidecars in ONE columnar
    scan (rank attached from input_file_name), not one scan per entry
    — 4 accumulated upserts must plan exactly 2 parquet scans total:
    the data files and the unioned key files."""
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 100).repartition(2))
    for i in range(4):
        snap.commit_mor_upsert(
            spark,
            root,
            _df(spark, 10 * i, 10 * i + 10).withColumn(
                "g", F.lit(50 + i).cast("long")
            ),
            ["k"],
        )
    buf = io.StringIO()
    with redirect_stdout(buf):
        snap.read_snapshot(spark, root).explain("formatted")
    text = buf.getvalue()
    # count detail entries ("(N) Scan parquet") — the tree section
    # prints each scan node a second time
    import re

    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", text, re.M))
    assert n_scans <= 2, f"expected <=2 parquet scans, saw {n_scans}"


def test_time_travel_mid_chain_still_correct(spark, tmp_path):
    root = _chain_table(spark, tmp_path)
    # v3: base + both upserts, no trailing append
    got = sorted(
        (r["k"], r["g"])
        for r in snap.read_snapshot(spark, root, 3).collect()
    )
    exp = {k: k % 10 for k in range(100)}
    for k in range(0, 20):
        exp[k] = 77
    for k in range(10, 30):
        exp[k] = 88
    assert got == sorted(exp.items())


def test_upsert_key_sidecar_holds_batch_distinct_keys(spark, tmp_path):
    """The key sidecar is now derived from the staged data files; it
    must still hold exactly the batch's distinct keys."""
    root = str(tmp_path / "t")
    snap.commit_append(spark, root, _df(spark, 0, 50).repartition(2))
    batch = _df(spark, 10, 20).unionByName(_df(spark, 10, 20))
    snap.commit_mor_upsert(spark, root, batch, ["k"])
    entry = snap.read_manifest(root, 2)["eq_delete_files"][-1]
    import os

    keys = sorted(
        r["k"]
        for r in spark.read.parquet(
            *[os.path.join(root, f) for f in entry["files"]]
        ).collect()
    )
    assert keys == list(range(10, 20))
