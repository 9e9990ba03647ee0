"""Registry scale-contract tags: validation_only twins must point at a
real scale-safe sibling, and the known all-pairs query carries the tag."""

import __spark_entry__  # noqa: F401 — registers every query module
from metastore_spark.queries import REGISTRY


def test_emb_near_pairs_is_production_bounded():
    # VERDICT r9 task 3: emb_near_pairs was re-contracted from the
    # exact all-pairs twin (quadratic output, oracle unrunnable past
    # sf0.1) to SRP-blocked + per-vector-capped — bounded candidates
    # AND bounded output, so it is a production query again, not a
    # validation twin, and its oracle runs at sf1+.
    qd = REGISTRY["emb_near_pairs"]
    assert qd.validation_only is False
    assert qd.scale_path is None


def test_scale_paths_resolve_to_registered_untagged_queries():
    for name, qd in REGISTRY.items():
        if qd.validation_only:
            assert qd.scale_path, f"{name}: validation_only without scale_path"
            assert qd.scale_path in REGISTRY, (name, qd.scale_path)
            assert not REGISTRY[qd.scale_path].validation_only, (
                f"{name}: scale_path {qd.scale_path} is itself tagged"
            )


def test_jaccard_pairs_is_validation_only():
    # round-5 contract (VERDICT r4 task 2): the (lang, length-bucket)
    # block is still all-pairs inside the modal block, so the exact
    # token-set query is a validation twin of the LSH-pruned verified
    # path, which is the 100 TB plan.
    qd = REGISTRY["dedup_jaccard_pairs"]
    assert qd.validation_only is True
    assert qd.scale_path == "dedup_jaccard_verified"
