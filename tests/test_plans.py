"""Physical-plan regression tests: the plans SCALE.md promises must
stay the plans Catalyst produces. A perf regression that changes a
join strategy or loses pushdown fails here, not in production.
"""

import contextlib
import io

import pytest

from metastore_spark.queries import REGISTRY
import metastore_spark.queries_analytics  # noqa: F401
import metastore_spark.queries_tpch_extra  # noqa: F401

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_scan_pushdown_and_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reached parquet
    # column pruning: read exactly the 7 needed columns, not all 11
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert read_schema.split("struct<")[1].count(":") == 7
    assert "l_orderkey" not in read_schema


def test_q1_partial_aggregation(spark):
    plan = _plan(spark, "q1_pricing_summary")
    # partial (map-side) agg before the exchange, final after
    assert plan.count("HashAggregate") >= 2


def test_q3_broadcasts_and_topk(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort
    assert "SortMergeJoin" not in plan  # no fact-fact shuffle join


def test_q5_lineitem_never_shuffle_joins(spark):
    plan = _plan(spark, "q5_region_volume")
    # every join broadcast: the only exchanges are for the final agg
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_q19_pushes_factored_predicates(spark):
    plan = _plan(spark, "q19_disjunctive_pushdown")
    # Catalyst factors per-table conjuncts out of the OR-of-ANDs and
    # pushes them into both scans
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("l_quantity" in l for l in pushed)
    assert any("p_brand" in l or "p_size" in l for l in pushed)


def test_events_sort_page_is_topk(spark):
    import metastore_spark.queries  # noqa: F401

    plan = _plan(spark, "events_sort_page")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no full sort operator


def test_q7_q9_fact_never_shuffle_joins(spark):
    # dims broadcast; lineitem reaches its aggregation without a
    # join-induced shuffle (the only exchange is the final groupBy's)
    import metastore_spark.queries_tpch_joins  # noqa: F401

    for name in ("q7_nation_trade_volume", "q9_product_profit"):
        plan = _plan(spark, name)
        assert "SortMergeJoin" not in plan, name
        assert "ShuffledHashJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name


def test_q10_topk_after_aggregate(spark):
    import metastore_spark.queries_tpch_joins  # noqa: F401

    plan = _plan(spark, "q10_returned_items")
    assert "TakeOrderedAndProject" in plan  # top-20 merges, no global sort
    assert "SortMergeJoin" not in plan


def test_q13_outer_join_preserves_filter_placement(spark):
    import metastore_spark.queries_tpch_joins  # noqa: F401

    plan = _plan(spark, "q13_order_count_distribution")
    # the priority filter must push into the orders scan (join-side
    # filter of an outer join prunes the inner side pre-join)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("o_orderpriority" in l for l in pushed)


def test_deciles_no_global_window(spark):
    # customer_spend_deciles must never degrade to the single-partition
    # NTILE window. A global window plans `Exchange SinglePartition`;
    # the distributed ranking plans only range/hash exchanges. The
    # marker is validated against a deliberately-global control plan in
    # the same session, so a format change in explain() output cannot
    # silently turn this test vacuous.
    import io
    import contextlib

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    ctl = (
        spark.range(100)
        .withColumn("decile", F.ntile(10).over(W.orderBy("id")))
        .groupBy("decile")
        .count()
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ctl.explain("formatted")
    assert "SinglePartition" in buf.getvalue()  # marker sanity check

    plan = _plan(spark, "customer_spend_deciles")
    assert "SinglePartition" not in plan, "global WindowExec found"
    assert "rangepartitioning" in plan.lower()


def test_chunk_and_schedule_are_map_only(spark):
    # sequence→explode→slice queries must fuse into the scan: any
    # Exchange means a shuffle crept into a map-only operator
    import metastore_spark.queries_curation  # noqa: F401
    import metastore_spark.queries_multimodal  # noqa: F401

    for name in ("docs_chunk_split", "multimodal_frame_schedule"):
        plan = _plan(spark, name)
        assert "Exchange" not in plan, f"{name} shuffles"


def test_cdc_latest_state_is_partial_agg_not_window(spark):
    # latest-wins compaction must combine map-side (partial_max_by
    # before the exchange) and must not fall back to a per-key
    # ROW_NUMBER window (full-row shuffle + sort)
    import metastore_spark.queries_temporal  # noqa: F401

    df = REGISTRY["events_cdc_latest_state"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_max_by" in plan
    # the partial aggregate must sit BELOW the hash exchange
    # (toString prints top-down: final agg, then exchange, then partial)
    assert plan.index("partial_max_by") > plan.index("Exchange hashpartitioning")


def test_join_strategy_hints_are_honored(spark):
    """§4 optimizer contract: the engine can steer join strategy per
    relation when the planner's default is wrong for the data shape
    (e.g. force shuffle-hash for a medium build side that would
    otherwise sort-merge)."""
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")

    merged = o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan

    hashed = o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey)
    plan = hashed._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan

    bcast = o.join(c.hint("broadcast"), o.o_custkey == c.c_custkey)
    plan = bcast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_heavy_hitters_verify_is_broadcast_semi(spark):
    # pass 2 must semi-join facts against the (tiny) candidate set by
    # broadcast — a shuffled semi would defeat the sketch's purpose
    import metastore_spark.queries_sketch  # noqa: F401

    df = REGISTRY["events_heavy_hitters"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_ann_ivf_probe_partition_prunes(spark):
    """The served IVF index is partitioned by centroid_id, so the
    nprobe filter must reach the scan as a partition filter."""
    import metastore_spark.queries_similarity  # noqa: F401

    df = REGISTRY["ann_ivf_topk"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "centroid_id" in plan


def test_jaccard_pairs_prefix_filtered_candidates(spark):
    """dedup_jaccard_pairs (r11): candidates must come from the
    PREFIX-FILTERED equi-join on (token, lang) — the per-doc
    row_number window that ranks tokens by global df and keeps only
    the PPJoin prefix is the structural guarantee that the join input
    is prefix rows, not all-pairs blocks. No nested-loop degradation."""
    import metastore_spark.queries_dedup  # noqa: F401

    plan = _plan(spark, "dedup_jaccard_pairs")
    assert "row_number" in plan  # per-doc prefix ranking window
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_grouped_topk_reduces_before_exchange(spark):
    """Phase-1 MapInPandas must sit BELOW the window's exchange: the
    shuffle then carries only per-partition survivors, which is the
    operator's entire reason to exist."""
    from pyspark.sql import functions as F

    from metastore_spark.operators.topk import grouped_topk

    df = spark.range(0, 1000, numPartitions=4).select(
        F.col("id"), (F.col("id") % 5).alias("g")
    )
    out = grouped_topk(df, ["g"], [("id", True)], k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    mip = plan.index("MapInPandas")
    ex = plan.index("Exchange hashpartitioning")
    # executedPlan prints top-down: the exchange (upstream consumer of
    # the kernel's output) appears BEFORE MapInPandas in the string
    assert ex < mip, plan


def test_q11_threshold_is_broadcast_scalar(spark):
    """Q11's HAVING threshold must be a 1-row broadcast join over the
    reused per-part aggregate, with the dims broadcast — never a
    fact-fact shuffle join or a cartesian over the fact."""
    plan = _plan(spark, "q11_important_parts")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan  # supplier/nation dim joins
    # the scalar threshold is a broadcast nested-loop over ONE row
    assert "BroadcastNestedLoopJoin" in plan


def test_bigram_counts_partial_agg_and_broadcast_context(spark):
    """Bigram count table: partial-agg before its exchange; the
    unigram-sized context table is broadcast."""
    import metastore_spark.queries_text  # noqa: F401

    plan = _plan(spark, "docs_bigram_surprisal")
    assert plan.count("HashAggregate") >= 4  # fb, fc, per-doc (partial+final)
    assert "BroadcastHashJoin" in plan  # fc join


def test_quality_score_single_pass(spark):
    """The classifier features come from ONE explode pass and ONE
    O(docs) partial-agg shuffle — no joins at all."""
    import metastore_spark.queries_text  # noqa: F401

    plan = _plan(spark, "docs_quality_score")
    assert "Join" not in plan
    assert "explode" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_ndcg_topk_is_sort_limit(spark):
    """Every top-10 prefix in the NDCG eval must be a distributed
    sort-limit (TakeOrderedAndProject), not a global sort."""
    import metastore_spark.queries_search  # noqa: F401

    plan = _plan(spark, "search_eval_ndcg")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_ndcg_panel_scored_in_one_pass(spark):
    """The whole eval panel shares ONE fused scoring pass: postings,
    docfreq and doclen are each scanned exactly once (the per-query
    bm25_scores form scanned each one per panel query — 3 corpus-sized
    passes), and the DCG probe joins the labels frame once against the
    unioned ranked prefix."""
    import metastore_spark.queries_search  # noqa: F401

    plan = _plan(spark, "search_eval_ndcg")
    for side in ("postings", "docfreq", "doclen"):
        n = sum(1 for l in plan.splitlines() if "Location" in l and side in l)
        assert n == 1, f"{side} scanned {n}x, want 1 fused scan"


def test_rfm_segments_no_single_partition_window(spark):
    """RFM quartiles are three distributed exact-NTILE passes (range
    repartition + per-partition row_number + offsets) — never the
    single-partition NTILE window a naive port would plan. Control
    plan in test_deciles_no_global_window certifies the marker."""
    plan = _plan(spark, "customers_rfm_segments")
    assert "SinglePartition" not in plan, "global WindowExec found"
    assert "SortMergeJoin" not in plan


def test_market_basket_pairs_generate_not_self_join(spark):
    """Part-pair candidates generate IN-EXPRESSION from each sorted
    per-order basket (Generate/explode, bounded by basket² per order)
    — never a lineitem self-join; the only joins are broadcast item
    counts, and top-30 is a distributed sort-limit."""
    plan = _plan(spark, "parts_market_basket")
    assert "Generate" in plan  # in-expression pair explode
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan  # vocabulary-sized item counts
    assert "TakeOrderedAndProject" in plan


def test_dau_wau_single_fanout_no_self_join(spark):
    """The trailing-7-day distinct uses ONE bounded 7x window-end
    fan-out (a single Generate over day-deduped users), never a 7-way
    events self-join; the dau-wau day join is broadcast-sized."""
    import re

    plan = _plan(spark, "events_dau_wau_stickiness")
    fanouts = {m for m in re.findall(r"\((\d+)\) Generate", plan)}
    assert len(fanouts) == 1, f"expected one fan-out, got {fanouts}"
    assert "SortMergeJoin" not in plan
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_attribution_last_touch_is_one_window_no_join(spark):
    """Last-touch attribution is ONE user-partitioned carry-forward
    window pass over a single events scan — no self-join, no
    per-purchase probe, and the event_type filter reaches the scan."""
    import re

    import metastore_spark.queries_temporal  # noqa: F401

    plan = _plan(spark, "events_attribution_last_touch")
    assert "Join" not in plan
    assert "Window" in plan
    scans = {m for m in re.findall(r"\((\d+)\) Scan parquet", plan)}
    assert len(scans) == 1, f"expected one events scan, got {scans}"


def test_jaccard_pairs_candidate_join_never_broadcasts(spark):
    # r5 lesson, r11 shape: both prefix sides are corpus-sized but
    # descend from a file-sized scan, so Catalyst's estimate would
    # broadcast one — wrong at 100 TB. The explicit same-key
    # repartitions + shuffle_hash hint must keep the candidate join
    # a ShuffledHashJoin.
    plan = _plan(spark, "dedup_jaccard_pairs")
    assert "ShuffledHashJoin" in plan


def test_emb_semdedup_salted_shuffle_hash_join(spark):
    # same pathology, same pin: ~n/2500 centroid keys with quadratic
    # per-key CPU must spread over salt x fanout tasks, not broadcast.
    import metastore_spark.queries_similarity  # noqa: F401

    plan = _plan(spark, "emb_semdedup")
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "salt" in plan


def _n_scans(plan: str) -> int:
    # "formatted" prints each node once in the tree and once in the
    # details section — count the numbered detail entries only
    import re

    return len(re.findall(r"\(\d+\) Scan parquet", plan))


def test_drift_monitor_single_scan_no_join(spark):
    """events_distribution_drift folds the reference/live flag into
    the aggregate and takes per-type totals via a window over the
    bounded (types x 10 bins) counts frame — ONE events scan, no
    period self-join, no groupBy+rejoin scan duplication."""
    import metastore_spark.queries_governance  # noqa: F401

    plan = _plan(spark, "events_distribution_drift")
    assert _n_scans(plan) == 1
    assert "Join" not in plan


def test_sampled_estimate_single_scan_no_join(spark):
    """The HT estimator and the exact truth come from one conditional
    aggregation pass — one scan, zero joins."""
    import metastore_spark.queries_governance  # noqa: F401

    plan = _plan(spark, "events_sampled_value_estimate")
    assert _n_scans(plan) == 1
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_dq_expectations_row_rules_one_scan(spark):
    """The row-level rule battery is ONE conditional-agg scan; the
    whole suite (incl. FK + PK branches) reads lineitem at most 3
    times and never plans a cartesian or a window."""
    import metastore_spark.queries_governance  # noqa: F401

    plan = _plan(spark, "lineitem_dq_expectations")
    assert _n_scans(plan) <= 4  # 3x lineitem + 1x orders
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_hybrid_rrf_legs_are_sort_limit_no_cartesian(spark):
    """Both retrieval legs must be TakeOrderedAndProject (top-k
    prefixes, never a global sort) and the fusion must join prefixes,
    never cross-join corpus frames."""
    import metastore_spark.queries_search  # noqa: F401

    plan = _plan(spark, "search_hybrid_rrf")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_substring_applied_no_cartesian_partial_aggs(spark):
    """The passage ≥2-doc filter must be a partial-agg shuffle (never a
    corpus self-join), and the span/token joins must be equi-joins."""
    import metastore_spark.queries_dedup  # noqa: F401

    plan = _plan(spark, "dedup_substring_applied")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # map-side partial + final aggregate for the passage doc-counts
    assert plan.count("HashAggregate") >= 4


def test_ivf_recall_prunes_served_partitions_and_uses_topk_kernel(spark):
    """The IVF leg must scan the served store through a centroid_id
    partition filter (directory pruning — the union of the panel's
    probe lists), and both top-10s must go through the grouped_topk
    Arrow kernel below an exchange (candidates shuffle, not the
    corpus)."""
    import metastore_spark.queries_similarity  # noqa: F401

    plan = _plan(spark, "ann_ivf_recall")
    pf = [
        l
        for l in plan.splitlines()
        if "PartitionFilters" in l and "centroid_id" in l
    ]
    assert pf, plan
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan


def test_media_param_fanout_survives_aqe(spark):
    """Codec parameter frames must fan to defaultParallelism before the
    Arrow stage even from a 1-partition source, and the repartition
    must be the explicit-width form AQE cannot coalesce."""
    from pyspark.sql import functions as F

    from metastore_spark.multimodal import synthesize_media

    params = spark.range(0, 200, numPartitions=1).select(
        F.col("id").alias("media_id"),
        F.lit(16).alias("w"),
        F.lit(16).alias("h"),
    )
    out = synthesize_media(params)
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # explicit numPartitions on the repartition node — the form AQE
    # cannot coalesce (a bare column repartition would print no count);
    # the count is anchored to the repartition node itself so an
    # unrelated bracketed list cannot satisfy the assertion
    import re

    n = spark.sparkContext.defaultParallelism
    assert re.search(
        rf"RepartitionByExpression \[media_id[^\]]*\], {n}\b", plan
    ), plan


def test_mor_read_broadcasts_deletes_and_keeps_pushdown(
    spark, tmp_path
):
    """A merge-on-read read must stay scan-shaped: the position-delete
    side broadcast (never a sort-merge shuffle of the table), the
    caller's filter pushed to the parquet scan, and unused columns
    pruned out of ReadSchema despite the anti-join's metadata
    columns."""
    from pyspark.sql import functions as F

    from metastore_spark.sources import snapshots as snap

    root = str(tmp_path / "t")
    df = spark.range(50000).selectExpr(
        "id as k", "id % 100 as g", "cast(id as string) as s"
    )
    snap.commit_append(spark, root, df.repartition(4))
    snap.commit_mor_delete(spark, root, F.col("g") == 3)
    q = snap.read_snapshot(spark, root).filter("g = 7").select("k")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "EqualTo(g,7)" in plan, plan  # pushed to the scan
    # the untouched string column never reaches any ReadSchema
    import re

    schemas = re.findall(r"ReadSchema: struct<[^>]*>", plan)
    assert schemas and all("s:string" not in x for x in schemas), plan


def test_global_shuffle_no_single_partition_sort(spark):
    """VERDICT r9 task 7: docs_global_shuffle's total order must plan
    as hash-partitioned per-shard window sorts — ONE hash exchange for
    the windows, no `Exchange SinglePartition` (a global window) and
    no rangepartitioning sampling pass (a global orderBy feeding the
    windows). The final tiny orderBy on the 16-row aggregate is the
    only acceptable range exchange."""
    import metastore_spark.queries_curation  # noqa: F401

    plan = _plan(spark, "docs_global_shuffle")
    assert "Exchange SinglePartition" not in plan
    # exactly ONE hash exchange: it feeds BOTH window functions (one
    # shared Window node) AND the per-(epoch, shard) aggregate — the
    # partial agg reuses the window partitioning, no second shuffle
    assert plan.count("hashpartitioning") == 1
    # the only range exchange is the final orderBy on the 16-row
    # aggregate — never a corpus-wide global sort
    assert plan.count("rangepartitioning") == 1
    assert plan.index("rangepartitioning") > plan.index("row_number()")
    assert "row_number()" in plan
