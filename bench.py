"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": <scale factor>}

Each query is executed to completion (count() — forces full evaluation
of every operator including sorts/limits via collect-less action; for
top-k queries the count equals k but the plan still runs end-to-end).
A warmup query amortizes JVM/session startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


HEADLINE = [
    # TPC-H-style relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_volume",
    "q7_nation_trade_volume",
    "q9_product_profit",
    "q13_order_count_distribution",
    "q18_large_orders",
    "q19_disjunctive_pushdown",
    "q21_waiting_suppliers",
    "top_customers_per_nation",
    # reference search semantics
    "events_visibility",
    "events_sort_page",
    "search_bm25_docs",
    "search_bm25_stemmed",
    "docs_match_token",
    "api_events_envelope",
    "api_dataset_envelope",
    # LLM-pipeline operators
    "docs_token_stats",
    "docs_bpe_tokens",
    "dedup_exact_keys",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    # NOTE serving-store-backed queries (dedup_jaccard_verified,
    # search_bm25_*, ann_ivf_topk) measure STEADY-STATE reads once the
    # fingerprinted store exists — the intended product shape; the
    # one-time build cost is an ingest cost, tracked in SELFCHECK sf1/
    # sf3 cold runs instead.
    "dedup_jaccard_verified",
    "docs_repetition_signals",
    "docs_contamination",
    "ann_cosine_topk",
    "emb_near_pairs",
    "multimodal_binary_dedup",
    "docs_curation_pipeline",
    "docs_chunk_split",
    "docs_unigram_logprob",
    # temporal / streaming
    "events_asof_signup",
    "events_funnel",
    "events_retention_cohorts",
    "events_stream_hourly",
    # sketch-accelerated / graph / quantized (round 2 additions)
    "lineitem_bloom_semijoin",
    "events_heavy_hitters",
    "docs_tfidf_similar_pairs",
    "nation_trade_pagerank",
    "ann_sq8_topk",
    "events_gapfill_daily",
    "events_scd2_intervals",
    "events_stream_interval_join",
    "ann_pq_topk",
    "events_cdc_latest_state",
    "events_multires_rollup",
    "events_peak_concurrency",
    # round 4 additions
    "dedup_containment_pairs",
    "docs_ngram_novelty",
    "events_rolling_zscore",
    "docs_pii_scan",
    "multimodal_decode_features",
    "docs_langid",
    "docs_char_entropy",
    "emb_near_pairs_srp",
    "ann_ivf_topk",
    "events_top_value_per_type",
    "docs_top_chars_per_source",
    "q11_important_parts",
    "docs_bigram_surprisal",
    "docs_quality_score",
    "search_eval_ndcg",
    "emb_pca_power_projection",
    "events_attribution_last_touch",
    "customers_rfm_segments",
    "events_user_hll_registers",
    "nation_revenue_ses_forecast",
    "docs_perplexity_buckets",
    "events_time_to_convert",
    "docs_corpus_datasheet",
    "parts_market_basket",
    "events_value_quantile_sketch",
    "events_ab_test_zscore",
    "docs_mixture_temperature_weights",
    "orders_cohort_ltv_curve",
    "events_purchase_prior_state",
    "events_dau_wau_stickiness",
    "supplier_lead_time_percentiles",
    "orders_lineitem_bucketed_join",
    "events_type_cms_counts",
    "events_zorder_box_pruned",
    # round 5 additions
    "multimodal_audio_codec_windows",
    "lineitem_dq_expectations",
    "events_kanonymity_audit",
    "events_distribution_drift",
    "docs_bpe_trainer",
    "ann_ivf_recall",
    "ann_pq_recall",
    "ann_mrl_recall",
    "ann_ivf_pq_topk",
    "events_snapshot_timetravel",
    "events_stream_snapshot_ingest",
    "search_hybrid_rrf",
    "dedup_substring_applied",
    "docs_bpe_encode",
    "docs_training_shards",
    "multimodal_resize_grid",
    "docs_winnowing_fingerprints",
    # round 7 additions
    "events_snapshot_serving",
    "ann_pq_recall_trained",
    "ann_ivf_recall_trained",
    "events_snapshot_pruned_scan",
    "events_snapshot_incremental",
    "ann_ivf_pq_topk_trained",
    "api_events_envelope_snapshot",
    # round 8 additions
    "events_snapshot_day_pruned",
    "events_snapshot_partition_erasure",
    "events_snapshot_history",
    # round 9 additions: named refs / WAP, metadata tables, MOR
    # deletes, the registered data source, replaceWhere, CDF
    "events_snapshot_wap_publish",
    "events_snapshot_refs_metadata",
    "events_snapshot_partitions_metadata",
    "events_snapshot_mor_delete",
    "events_snapshot_source_batch",
    "events_snapshot_stream_source",
    "events_snapshot_overwrite_backfill",
    "events_snapshot_cdf",
    "events_snapshot_bloom_pruned",
    "events_snapshot_sorted_compaction",
    # round 10 additions: TIMESTAMP AS OF, equality deletes, the
    # zero-scan CDC upsert (batch + streaming), the trained quality
    # classifier, and the deterministic global shuffle
    "events_snapshot_timetravel_ts",
    "events_snapshot_eq_delete",
    "events_snapshot_mor_upsert",
    "events_stream_cdc_upsert",
    "docs_quality_trained",
    "docs_global_shuffle",
    "events_snapshot_write_path",
    "events_snapshot_mor_compact_fold",
    # round 12: the user-facing writeStream upsert spelling + the
    # stream source's backlog admission control
    "events_stream_upsert_sink",
    "events_stream_backlog_drain",
]


# Pinned calibration references for value_normalized.
#
# Round-4 finding: the pure-codegen range-sum probe ANTI-correlates with
# query wall time (r4 host: probe 2x FASTER than the 37.5s-era host, query
# times unchanged) — these 47 queries are dominated by per-job/per-task
# scheduler overhead (~6 ms/task on the r4 host, measured via 10x
# trivial-job loops), not by JVM compute. So the normalizer is a
# workload-shaped probe: 10 tiny two-stage jobs, timing exactly the
# schedule/dispatch path. The codegen probe stays in the JSON for
# history continuity.
#
# Reference pinned on the round-4 host (2026-08-14): jobs probe mean
# ~1.0 s/10 jobs (with locality.wait=0) alongside a ~41 s headline
# total — so round 4's normalized ≈ raw by construction, and a future
# host with half the scheduler latency normalizes a ~20 s total back
# to ~40 s for apples-to-apples round comparison. The probe itself
# drifts ~40% within one run (start vs end), so normalized values are
# a coarse cross-host corrector, not a precision metric; per-query
# ratios within a run remain the stable signal.
CALIB_REF_JOBS_SEC = 1.0
CALIB_REF_SPARK_SEC = 0.374  # best-history codegen probe (ts=1786658170)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    from pyspark.sql import functions as F

    from metastore_spark.session import get_spark
    import __spark_entry__  # noqa: F401 — registers every query module
    from metastore_spark.queries import REGISTRY

    spark = get_spark("metastore-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: JIT/codegen/session init out of the measured path, plus
    # one tiny applyInPandas to spawn the Python worker pool (Arrow
    # path) before any measured pandas-UDF query.
    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).count()
    spark.range(32).withColumn("g", F.col("id") % 4).groupBy("g").applyInPandas(
        lambda pdf: pdf, "id bigint, g bigint"
    ).count()
    # The events substrate (catalog SNAPSHOT_KINDS) is an ingest-time
    # artifact like the serving stores: ensure it exists before timing
    # so measured queries see the steady-state manifest-head read.
    from metastore_spark import catalog as _catalog

    for _kind in _catalog.SNAPSHOT_KINDS:
        _catalog.snapshot_root(spark, sf_dir, _kind)

    # Machine calibration: a fixed JVM-side micro-op (codegen sum over
    # range) and a fixed single-thread Python loop. Bench totals only
    # compare across rounds after dividing by this — the hosts differ
    # round-to-round (round 3's box measured ~2x slower per core than
    # round 2's on identical code paths).
    def probe_spark() -> float:
        # best-of-2: external load only ever ADDS time, so min is the
        # least-contaminated estimate of the host's true per-core speed
        best = None
        for _ in range(2):
            t0 = time.time()
            spark.range(500_000_000).selectExpr("sum(id * 2)").collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    def probe_jobs() -> tuple[float, list[float]]:
        # 10 trivial two-stage jobs: times the scheduler/dispatch path
        # that dominates small-SF query wall time. MEDIAN-of-3
        # (VERDICT r10 task 2): a single bursty rep once flipped the
        # cross-round normalizer 2x on identical code (probe 1.43 s vs
        # 4.64 s seventeen minutes apart); the median is robust to one
        # contaminated rep, and the raw reps are recorded so the gate
        # can refuse to trust a run whose probe was unstable.
        reps = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(10):
                spark.range(1000, numPartitions=8).repartition(8).count()
            reps.append(round(time.time() - t0, 3))
        return sorted(reps)[1], reps

    calib_spark = probe_spark()
    calib_jobs, calib_jobs_reps = probe_jobs()
    t0 = time.time()
    acc = 0
    for i in range(10_000_000):
        acc += i
    calib_py = round(time.time() - t0, 3)

    # Subset mode (A/B adjudication legs, quick local iteration):
    # SPARK_GRAFT_BENCH_ONLY="q1,q2" restricts the run; such runs are
    # NOT appended to history (a few-query line would skew the
    # common-set total the gate compares). SPARK_GRAFT_BENCH_REPS
    # widens best-of-N for noise-sensitive adjudication runs.
    only = [
        q.strip()
        for q in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",")
        if q.strip()
    ]
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    timings: dict[str, float] = {}
    for name in only or HEADLINE:
        if name not in REGISTRY:
            continue
        best = None
        for _ in range(reps):  # best-of-N: this box's noise is ±2×
            # Cache-cold reps (r13, VERDICT r12 item 2): Spark's cache
            # manager matches by logical plan, so a query that
            # persist()s internally materialized on rep 1 and served
            # reps 2-3 warm — best-of-N reported the warm number for
            # cache-using queries while non-caching queries stayed
            # cold. Clearing BEFORE every rep makes each rep compute
            # from the parquet inputs. (Also the per-query heap
            # hygiene: 47 queries' caches must not accumulate in one
            # JVM. Serving stores are parquet reopens, unaffected.)
            spark.catalog.clearCache()
            t0 = time.time()
            df = REGISTRY[name].fn(spark, sf_dir)
            # noop sink evaluates EVERY column of every row — count()
            # would let Catalyst prune projection-only queries down to
            # a metadata read and time nothing
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        n = REGISTRY[name].fn(spark, sf_dir).count()  # untimed, for the log
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
        spark.catalog.clearCache()

    # second calibration probe: the host's throughput is bursty
    # (disjoint queries measure 2-5x apart between runs minutes apart
    # with identical code); start+end probes bound the drift WITHIN
    # this run for the cross-round normalizer.
    calib_spark_end = probe_spark()
    calib_jobs_end, calib_jobs_end_reps = probe_jobs()

    total = round(sum(timings.values()), 3)
    # Normalize to the pinned reference host speed via the JOBS probe
    # (scheduler-shaped — see CALIB_REF_JOBS_SEC). MIN of the two
    # median-of-3 probes: external load only ever ADDS time, so the
    # smaller median is the least-contaminated estimate of the host's
    # true dispatch latency (the old mean-of-single-shots manufactured
    # a 2x normalized flip on identical code). probe_spread records
    # max/min over all six reps — the gate refuses to adjudicate
    # regressions on a run whose own probe was unstable.
    all_reps = calib_jobs_reps + calib_jobs_end_reps
    probe_spread = round(max(all_reps) / min(all_reps), 2)
    calib_run = round(min(calib_jobs, calib_jobs_end), 3)
    value_normalized = round(total * (CALIB_REF_JOBS_SEC / calib_run), 3)
    result = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "value_normalized": value_normalized,
        "queries": timings,
        # r13: every rep is cache-cold (clearCache before each rep) —
        # cache-using queries read honestly slower than warm-rep-era
        # history lines, which lack this marker.
        "timing_basis": "cold_reps",
        "sf": sf,
        "calib": {"spark_range_sum_sec": calib_spark,
                  "py_loop_sec": calib_py,
                  "spark_range_sum_end_sec": calib_spark_end,
                  "spark_jobs10_sec": calib_jobs,
                  "spark_jobs10_end_sec": calib_jobs_end,
                  "spark_jobs10_reps": all_reps,
                  "probe_spread": probe_spread,
                  "calib_ref_jobs_sec": CALIB_REF_JOBS_SEC,
                  "calib_ref_spark_sec": CALIB_REF_SPARK_SEC},
    }
    print(json.dumps(result))
    # Append to the per-query history log so round-over-round regression
    # detection is mechanical (compare same query across lines; the
    # driver's BENCH_r{N}.json only keeps the latest run). git_code_head
    # stamps which CODE produced the line — the last commit touching
    # the paths that can change query results or their measurement
    # (same definition as tools/check_evidence_fresh.py, plus this
    # harness) — so a docs/evidence commit does not strip a run of its
    # legitimate same-code peers in the gate's noise adjudication.
    # git_head (full HEAD) is kept for provenance.
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    try:
        import subprocess

        git_head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10, cwd=repo_dir,
        ).stdout.strip() or None
        git_code_head = subprocess.run(
            ["git", "log", "-1", "--format=%h", "--",
             "metastore_spark", "__spark_entry__.py", "bench.py"],
            capture_output=True, text=True, timeout=10, cwd=repo_dir,
        ).stdout.strip() or None
    except Exception:
        git_head = git_code_head = None
    if only:
        print(
            "# subset run (SPARK_GRAFT_BENCH_ONLY): history append and "
            "gate skipped",
            file=sys.stderr,
        )
        return 0
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_HISTORY.jsonl"), "a"
        ) as fh:
            fh.write(json.dumps(
                {
                    "ts": int(time.time()),
                    "git_head": git_head,
                    "git_code_head": git_code_head,
                    **result,
                }
            ) + "\n")
    except OSError:
        pass  # history is best-effort; the stdout contract is the product
    # Regression gate (stderr only — stdout stays ONE JSON line): flag
    # any query >1.5x its normalized history median; report the
    # headline ratio. Informational here; tools/bench_gate.py exits
    # nonzero standalone when the 1.3x total gate trips.
    try:
        import subprocess

        gate = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "bench_gate.py")],
            capture_output=True, text=True, timeout=60,
        )
        for line in (gate.stdout + gate.stderr).strip().splitlines():
            print(f"# gate: {line}", file=sys.stderr)
    except Exception:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
