"""Model-based commit-protocol test: random op sequences (append /
delete-where / delete-keys / merge / merge-on-read delete / compact /
rollback / rename / widen / branch-cycle / tag) applied to BOTH the
snapshot store and an in-memory Python model; after every op the head
must equal the model, and every historical version must still
reproduce its own recorded state UNDER ITS OWN committed schema
(snapshot isolation + schema evolution across arbitrary interleavings
— the invariant each per-op test checks only pointwise). Branch
cycles fork a branch, run 1-2 commits against a branch model in
isolation (trunk asserted untouched), then publish (trunk adopts the
branch state) or drop. Tags snapshot (column, state) at creation and
must reproduce it even AFTER retention expires untagged history."""

import random

import pytest
from pyspark.sql import functions as F

from metastore_spark.sources import snapshots as snap


def _to_df(spark, rows, vcol, vtype):
    df = spark.createDataFrame(
        [(k, v) for k, v in sorted(rows.items())], "k bigint, v bigint"
    )
    return df.select(F.col("k"), F.col("v").cast(vtype).alias(vcol))


def _read_state(spark, root, vcol, version=None):
    return {
        (r["k"], None if r[vcol] is None else int(r[vcol]))
        for r in snap.read_snapshot(spark, root, version).collect()
    }


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_random_op_sequences_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    root = str(tmp_path / f"t{seed}")
    model: dict[int, int] = {i: i * 10 for i in range(40)}
    vcol, vtype = "v", "int"
    snap.commit_append(spark, root, _to_df(spark, model, vcol, vtype))
    history = {1: (vcol, set(model.items()))}
    tags: dict[str, tuple] = {}
    next_key = 1000

    for step in range(14):
        op = rng.choice(
            ["append", "delete_where", "delete_keys", "merge",
             "compact", "rollback", "rename", "widen",
             "mor_delete", "branch_cycle", "tag"]
        )
        if op == "append":
            new = {next_key + i: rng.randrange(1000) for i in range(5)}
            next_key += 10
            v = snap.commit_append(
                spark, root, _to_df(spark, new, vcol, vtype)
            )
            model.update(new)
        elif op == "delete_where":
            cut = rng.randrange(0, 2000)
            v = snap.commit_delete_where(
                spark, root, F.col("k") < cut
            )
            model = {k: x for k, x in model.items() if not k < cut}
        elif op == "delete_keys":
            ks = rng.sample(sorted(model), min(3, len(model))) + [987654]
            v = snap.commit_delete_keys(
                spark,
                root,
                spark.createDataFrame([(k,) for k in ks], "k bigint"),
                ["k"],
            )
            model = {k: x for k, x in model.items() if k not in ks}
        elif op == "merge":
            upd = {
                k: -rng.randrange(100)
                for k in rng.sample(sorted(model), min(3, len(model)))
            }
            ins = {next_key + i: -1 for i in range(2)}
            next_key += 10
            src = {**upd, **ins}
            v = snap.commit_merge(
                spark, root, _to_df(spark, src, vcol, vtype), ["k"]
            )
            model.update(src)
        elif op == "mor_delete":
            mod, rem = rng.choice([(3, 0), (5, 1), (7, 2)])
            v = snap.commit_mor_delete(
                spark, root, F.col("k") % mod == rem
            )
            model = {
                k: x for k, x in model.items() if not k % mod == rem
            }
        elif op == "branch_cycle":
            bname = f"b{step}"
            snap.create_branch(root, bname)
            bmodel = dict(model)
            for _ in range(rng.randrange(1, 3)):
                bop = rng.choice(["append", "mor_delete", "delete"])
                if bop == "append":
                    new = {
                        next_key + i: rng.randrange(1000)
                        for i in range(3)
                    }
                    next_key += 10
                    snap.commit_append(
                        spark, root, _to_df(spark, new, vcol, vtype),
                        ref=bname,
                    )
                    bmodel.update(new)
                elif bop == "mor_delete":
                    mod, rem = rng.choice([(4, 1), (6, 3)])
                    snap.commit_mor_delete(
                        spark, root, F.col("k") % mod == rem, ref=bname
                    )
                    bmodel = {
                        k: x
                        for k, x in bmodel.items()
                        if not k % mod == rem
                    }
                else:
                    cut = rng.randrange(0, 2000)
                    snap.commit_delete_where(
                        spark, root, F.col("k") >= cut, ref=bname
                    )
                    bmodel = {
                        k: x for k, x in bmodel.items() if not k >= cut
                    }
            # isolation: the trunk never moved during the branch work
            assert _read_state(spark, root, vcol) == set(model.items())
            if rng.random() < 0.7:
                v = snap.publish_branch(root, bname)
                model = bmodel
            else:
                snap.drop_branch(root, bname)
                continue  # no trunk commit this step
        elif op == "tag":
            tname = f"tag{step}"
            snap.create_tag(root, tname)
            tags[tname] = (vcol, set(model.items()))
            continue  # metadata-only: no trunk commit this step
        elif op == "compact":
            v = snap.commit_with_retry(
                root, lambda: snap.compact(spark, root, target_files=1)
            )
        elif op == "rename":
            new_name = f"v_r{step}"
            v = snap.rename_column(root, vcol, new_name)
            vcol = new_name
        elif op == "widen":
            if vtype == "bigint":
                continue  # already wide: no commit this step
            v = snap.widen_column(root, vcol, "long")
            vtype = "bigint"
        else:  # rollback to a random retained version
            target = rng.choice(sorted(history))
            v = snap.rollback_to(root, target)
            vcol = history[target][0]
            model = dict(history[target][1])
            # the physical type travels with the restored schema;
            # derive it from the manifest rather than tracking
            m = snap.read_manifest(root, v)
            vtype = next(
                "bigint" if f["type"] == "long" else "int"
                for f in m["schema"]["fields"]
                if f["name"] == vcol
            )

        history[v] = (vcol, set(model.items()))
        assert _read_state(spark, root, vcol) == set(model.items()), (
            f"seed {seed} step {step} op {op}: head diverged from model"
        )

    # every retained historical version still reproduces ITS state
    # under ITS schema
    for ver, (col, state) in history.items():
        assert _read_state(spark, root, col, ver) == state, (
            f"seed {seed}: version {ver} no longer reproduces its state"
        )
    # tags reproduce their creation-time state...
    for tname, (col, state) in tags.items():
        got = {
            (r["k"], None if r[col] is None else int(r[col]))
            for r in snap.read_snapshot(spark, root, tname).collect()
        }
        assert got == state, f"seed {seed}: tag {tname} drifted"
    # ...even after retention expires the untagged history
    snap.expire_snapshots(root, keep_last=2)
    for tname, (col, state) in tags.items():
        got = {
            (r["k"], None if r[col] is None else int(r[col]))
            for r in snap.read_snapshot(spark, root, tname).collect()
        }
        assert got == state, (
            f"seed {seed}: tag {tname} lost state after retention"
        )
    head_col, head_state = history[max(history)]
    assert _read_state(spark, root, head_col) == head_state
