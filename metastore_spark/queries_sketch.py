"""Sketch-accelerated exact queries: bloom-pruned semi-join and
two-pass heavy hitters.

Both follow the candidates-then-verify discipline the engine already
uses for LSH dedup (queries_dedup.dedup_jaccard_verified): a cheap
candidate pass with a *no-false-negative* guarantee shrinks the data
the expensive pass touches, and an exact verify step keeps the final
answer byte-identical to the naive plan — which is exactly what the
DuckDB oracles check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metastore_spark.operators.sketches import (
    bloom_build,
    bloom_prefilter,
    mg_candidates,
)
from metastore_spark.queries import query, _t

_PRICE_CUT = 450000.0
_HH_FRAC = 0.002


@query(
    "lineitem_bloom_semijoin",
    oracle=f"""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN (SELECT o_orderkey, o_orderpriority FROM orders
          WHERE o_totalprice > {_PRICE_CUT}) o
      ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def lineitem_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of lineitems belonging to high-value orders, with an
    explicit runtime bloom filter pruning the fact scan.

    Scale story: the selective dimension predicate (top ~10% of
    orders) is aggregated into an expression-built bloom filter sized
    at 10 bits/key (operators/sketches.py) that ships as one array
    literal — the explicit form of Spark's InjectRuntimeFilter. The
    probe is xxhash64 codegen fused into the lineitem scan, so ~90%
    of fact rows die before the join; the broadcast hash join
    afterwards removes bloom false positives, keeping the result
    exactly the plain join the oracle runs. On a cluster this
    converts a 100 TB shuffle-side scan into a filtered one at the
    cost of a bits-per-key-sized broadcast.
    """
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > _PRICE_CUT
    )
    dim = orders.select("o_orderkey", "o_orderpriority")
    words = bloom_build(dim, F.col("o_orderkey"))
    li = bloom_prefilter(
        _t(spark, sf_dir, "lineitem"), F.col("l_orderkey"), words
    )
    return (
        li.join(F.broadcast(dim), li.l_orderkey == dim.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


@query(
    "events_heavy_hitters",
    oracle=f"""
    WITH tot AS (SELECT COUNT(*) AS n FROM events)
    SELECT e.user_id, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(COUNT(*) * 1.0 / MAX(t.n), 4) AS share
    FROM events e CROSS JOIN tot t
    GROUP BY e.user_id, e.event_type
    HAVING COUNT(*) >= {_HH_FRAC} * MAX(t.n)
    """,
)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, event_type) pairs holding >= 0.2% of all events — exact
    counts, found without shuffling the full key space.

    Pass 1 (mg_candidates) keeps O(1/frac) counters per partition and
    emits a provable superset of the heavy keys (Misra-Gries bound;
    see operators/sketches.py). Pass 2 re-scans with a broadcast
    semi-join on the candidate set and aggregates exactly — only
    candidate keys enter the shuffle. With billions of distinct keys
    the naive groupBy exchanges all of them; this exchanges
    O(partitions / frac) candidates.
    """
    e = _t(spark, sf_dir, "events")
    keys = ["user_id", "event_type"]
    cands = mg_candidates(e, keys, _HH_FRAC).distinct()
    total = e.agg(F.count("*").alias("n"))
    return (
        e.join(F.broadcast(cands), keys, "left_semi")
        .groupBy(*keys)
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= _HH_FRAC * F.col("n"))
        .select(
            "user_id",
            "event_type",
            "cnt",
            F.round(F.col("cnt") / F.col("n"), 4).alias("share"),
        )
    )


@query(
    "events_type_cms_counts",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS exact_cnt,
           true AS cms_within_bound
    FROM events
    GROUP BY event_type
    """,
)
def events_type_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch point estimates validated in-query — the third
    member of the sketch family (HLL distinct counts, Misra-Gries
    heavy hitters, CMS frequencies; Cormode & Muthukrishnan 2005).

    The sketch is built as a plain DataFrame aggregation, which makes
    its mergeability explicit: every row explodes into d (hash_row,
    bucket) updates, and a partial-agg groupBy yields the d×w count
    table — the exchange carries at most d×w rows per partition
    regardless of input size, exactly how a 100 TB sketch build
    behaves. Estimation is a broadcast join of each key\'s d buckets
    against the table, MIN over rows. CMS guarantees estimate ∈
    [exact, exact + εN] w.p. 1−δ (ε = e/w, δ = e^-d); the oracle pins
    the exact counts AND that the bound held — the recall-gate
    pattern every inherently-approximate operator here uses.
    """
    W, D = 2048, 5
    e = _t(spark, sf_dir, "events")
    total = e.count()  # scalar N for the εN bound — parameter-sized
    eps_n = int(2.718281828 * total / W) + 1

    def buckets(col):
        return [
            F.struct(
                F.lit(i).alias("hrow"),
                F.pmod(F.xxhash64(col, F.lit(i)), F.lit(W)).alias("bucket"),
            )
            for i in range(D)
        ]

    table = (
        e.select(F.explode(F.array(*buckets(F.col("event_type")))).alias("u"))
        .groupBy(F.col("u.hrow").alias("hrow"), F.col("u.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_cnt"))
    probes = exact.select(
        "event_type",
        "exact_cnt",
        F.explode(F.array(*buckets(F.col("event_type")))).alias("u"),
    ).select(
        "event_type",
        "exact_cnt",
        F.col("u.hrow").alias("hrow"),
        F.col("u.bucket").alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(table), ["hrow", "bucket"])
        .groupBy("event_type", "exact_cnt")
        .agg(F.min("cnt").alias("_est"))
    )
    return est.select(
        "event_type",
        "exact_cnt",
        (
            (F.col("_est") >= F.col("exact_cnt"))
            & (F.col("_est") <= F.col("exact_cnt") + F.lit(eps_n))
        ).alias("cms_within_bound"),
    )


# --- portable HyperLogLog (explicit registers) ------------------------------

# Constants live in operators/hll.py (shared with the streaming
# register-maintenance path); the SQL mirrors below inject them as
# identical literals.
from metastore_spark.operators.hll import ALPHA_M2 as _HLL_ALPHA_M2
from metastore_spark.operators.hll import M as _HLL_M


def _hll_est_sql(used: str = "used", spow: str = "spow") -> str:
    """Estimate from (register count, sum of 2^-r): raw HLL with the
    small-range linear-counting correction, identical structure on
    both engines."""
    zeros = f"({_HLL_M} - {used})"
    raw = f"({_HLL_A_LIT} / ({spow} + {zeros}))"
    return (
        f"CASE WHEN {zeros} > 0 AND {raw} <= {2.5 * _HLL_M!r} "
        f"THEN {_HLL_M}.0 * ln({_HLL_M}.0 / {zeros}) ELSE {raw} END"
    )


_HLL_A_LIT = repr(_HLL_ALPHA_M2)


def _hll_oracle() -> str:
    from metastore_spark.queries_dedup import _ph60

    est = _hll_est_sql()
    return f"""
    WITH hsh AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d, user_id,
             {_ph60("user_id::VARCHAR")} AS h
      FROM events
    ),
    rho AS (
      SELECT d, h % {_HLL_M} AS bucket,
             CASE WHEN h // {_HLL_M} = 0 THEN 51
                  ELSE 51 - length(to_base(CAST(h // {_HLL_M} AS BIGINT), 2))
                  END AS rho
      FROM hsh
    ),
    regs AS (SELECT d, bucket, MAX(rho) AS r FROM rho GROUP BY 1, 2),
    day_est AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS used,
             SUM(POW(2.0, -r)) AS spow
      FROM regs GROUP BY 1
    ),
    day_exact AS (
      SELECT d, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
      FROM hsh GROUP BY 1
    ),
    tot_regs AS (SELECT bucket, MAX(r) AS r FROM regs GROUP BY 1),
    tot_est AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS used, SUM(POW(2.0, -r)) AS spow
      FROM tot_regs
    ),
    tot_exact AS (
      SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
      FROM hsh
    )
    SELECT CAST(d AS VARCHAR) AS scope, ROUND({est}, 4) AS hll_estimate,
           exact_users
    FROM day_est JOIN day_exact USING (d)
    UNION ALL
    SELECT 'total' AS scope, ROUND({est}, 4) AS hll_estimate, exact_users
    FROM tot_est CROSS JOIN tot_exact
    ORDER BY scope
    """


@query("events_user_hll_registers", oracle=_hll_oracle())
def events_user_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transparent HyperLogLog: per-day distinct-user sketches as an
    EXPLICIT 1024-register table (p=10), merged into a corpus sketch
    by per-bucket MAX — the mergeability that makes HLL the sketch of
    choice for stratified rollups (day→week→all without rescanning
    raw data). Unlike `events_user_approx_distinct` (Spark's opaque
    HLL, bounded-error oracle), every register — and therefore every
    estimate — is value-hash-oracled: the hash is portable_hash60,
    bucket/rank are integer ops (rank via base-2 digit count), and
    the Flajolet bias constant is one shared literal, so both engines
    produce the identical estimate to 4dp, linear-counting branch and
    all. Exact per-scope distincts ride along as the accuracy
    reference.

    Scale shape: raw events reduce to O(days × 1024) register rows in
    one partial-agg shuffle; the corpus merge reads registers, never
    events. At 100 TB the register table is the serving artifact —
    the same trade the bloom/Misra-Gries operators make."""
    from metastore_spark.operators import hll

    ev = _t(spark, sf_dir, "events")
    regs = hll.day_registers(ev, "ts", "user_id")
    regs.persist()
    est = hll.scope_estimates(regs).drop("used")
    # NEGATIVE RESULT (r12 at sf0.1, re-tested r13 at sf1 AND sf3 per
    # VERDICT r12 item 7 — do not re-attempt below sf10): sharing one
    # distinct-(day,user) pass between the two exact legs (3 events
    # scans -> 2) measured SLOWER on every interleaved leg at every SF
    # tried (1.16x best-of-legs at sf1: 2.34 vs 2.71 s; 1.14x at sf3:
    # 2.61 vs 2.98 s) — the distinct-pair shuffle + persist barrier
    # costs more than the saved map-side-partial-agg scan, and the
    # scan it removes is the cheapest part of the query.
    day_exact = ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts")))
        .cast("string")
        .alias("scope")
    ).agg(F.countDistinct("user_id").alias("exact_users"))
    tot_exact = ev.agg(
        F.countDistinct("user_id").alias("exact_users")
    ).select(F.lit("total").alias("scope"), "exact_users")
    exact = day_exact.unionAll(tot_exact)
    return (
        est.join(exact, "scope")
        .select("scope", "hll_estimate", "exact_users")
        .orderBy("scope")
    )


def quantile_buckets(ev: DataFrame) -> DataFrame:
    """(d, b) projection of an events frame: day + integer log-bucket
    of the cents value — the shared front-end of the batch sketch and
    the streaming histogram ingest."""
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
    e = ev.select(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
        cents.alias("cents"),
    )
    blen = "length(conv(cast(cents as string), 10, 2))"
    b = F.when(F.col("cents") < 64, F.col("cents")).otherwise(
        F.expr(
            f"64 + ({blen} - 7) * 8"
            f" + (shiftright(cents, {blen} - 4) & 7)"
        )
    )
    return e.select("d", b.alias("b"))


def quantile_bucket_lb(bk: int) -> int:
    """Exact lower bound of bucket ``bk`` (Python-int mirror of the
    SQL inverse)."""
    if bk < 64:
        return bk
    k = bk - 64
    return (8 + k % 8) << (k // 8 + 3)


def quantile_estimates(hist: list[tuple[int, int]], fracs=(0.5, 0.95, 0.99)):
    """(n, [estimates]) from a merged (bucket, count) histogram —
    exact integer cumulative extraction, scaled to dollars at 2dp."""
    import math

    n = sum(c for _, c in hist)
    out = []
    for frac in fracs:
        target = int(math.ceil(frac * n))
        run, val = 0, None
        for bk, c in hist:
            run += c
            if run >= target:
                val = round(quantile_bucket_lb(bk) / 100.0, 2)
                break
        if val is None and hist:
            val = round(quantile_bucket_lb(hist[-1][0]) / 100.0, 2)
        out.append(val)
    return n, out



@query(
    "events_value_quantile_sketch",
    oracle="""
    WITH e AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    bk AS (
      SELECT d,
             CASE WHEN cents < 64 THEN cents
                  ELSE 64 + (length(to_base(cents, 2)) - 7) * 8
                       + ((cents >> (length(to_base(cents, 2)) - 4)) & 7)
             END AS b
      FROM e
    ),
    regs AS (SELECT d, b, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM bk GROUP BY 1, 2),
    tot AS (SELECT b, CAST(SUM(cnt) AS BIGINT) AS cnt FROM regs GROUP BY 1),
    cum AS (
      SELECT b, SUM(cnt) OVER (ORDER BY b) AS run FROM tot
    ),
    n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM tot),
    q AS (
      SELECT
        (SELECT MIN(b) FROM cum, n WHERE run >= CAST(ceil(0.50 * n) AS BIGINT)) AS b50,
        (SELECT MIN(b) FROM cum, n WHERE run >= CAST(ceil(0.95 * n) AS BIGINT)) AS b95,
        (SELECT MIN(b) FROM cum, n WHERE run >= CAST(ceil(0.99 * n) AS BIGINT)) AS b99
    ),
    lb AS (
      SELECT
        CASE WHEN b50 < 64 THEN b50
             ELSE (8 + (b50 - 64) % 8) * CAST(POW(2, (b50 - 64) // 8 + 3) AS BIGINT)
        END AS lb50,
        CASE WHEN b95 < 64 THEN b95
             ELSE (8 + (b95 - 64) % 8) * CAST(POW(2, (b95 - 64) // 8 + 3) AS BIGINT)
        END AS lb95,
        CASE WHEN b99 < 64 THEN b99
             ELSE (8 + (b99 - 64) % 8) * CAST(POW(2, (b99 - 64) // 8 + 3) AS BIGINT)
        END AS lb99
      FROM q
    )
    SELECT n.n AS n_events,
           ROUND(lb50 / 100.0, 2) AS p50_est,
           ROUND(lb95 / 100.0, 2) AS p95_est,
           ROUND(lb99 / 100.0, 2) AS p99_est,
           (SELECT ROUND(quantile_cont(cents, 0.50) / 100.0, 4) FROM e) AS p50_exact,
           (SELECT ROUND(quantile_cont(cents, 0.95) / 100.0, 4) FROM e) AS p95_exact,
           (SELECT ROUND(quantile_cont(cents, 0.99) / 100.0, 4) FROM e) AS p99_exact
    FROM lb CROSS JOIN n
    """,
)
def events_value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch: per-day integer log-bucket
    histograms (values < 64 cents exact, above that the top bit plus
    3 sub-bits — ≤ 12.5% relative bucket width) SUM-merged into a
    corpus histogram, then p50/p95/p99 read off the cumulative counts
    — the HLL-register story applied to quantiles: the day sketches
    are the serving artifact, merging is associative, raw data is
    never rescanned. Every bucket id and lower bound is exact integer
    arithmetic (bit length via base-2 digit count — no float log
    whose last ulp could flip a bucket), so both engines' estimates
    hash-match; exact interpolated percentiles ride along as the
    accuracy reference.

    Scale shape: one partial-agg shuffle to O(days × buckets) rows;
    quantile extraction runs on the ≤ ~150-row merged histogram."""
    ev = _t(spark, sf_dir, "events")
    regs = (
        quantile_buckets(ev)
        .groupBy("d", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # merge the day sketches; the merged histogram is parameter-sized
    # (≤ ~150 buckets) — quantile extraction happens driver-side in
    # exact Python ints, the same trade as the PQ/IVF codebooks
    hist = sorted(
        (int(r["b"]), int(r["cnt"]))
        for r in regs.groupBy("b").agg(F.sum("cnt").alias("cnt")).collect()
    )
    n, (e50, e95, e99) = quantile_estimates(hist)
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
    e = ev.select(cents.alias("cents"))
    exact = e.agg(
        F.round(F.expr("percentile(cents, 0.50)") / 100.0, 4).alias(
            "p50_exact"
        ),
        F.round(F.expr("percentile(cents, 0.95)") / 100.0, 4).alias(
            "p95_exact"
        ),
        F.round(F.expr("percentile(cents, 0.99)") / 100.0, 4).alias(
            "p99_exact"
        ),
    )
    return exact.select(
        F.lit(n).cast("bigint").alias("n_events"),
        # cast: a None estimate (empty corpus) must stay a NULL DOUBLE,
        # not a void column (schema mismatch vs the oracle; unwritable)
        F.lit(e50).cast("double").alias("p50_est"),
        F.lit(e95).cast("double").alias("p95_est"),
        F.lit(e99).cast("double").alias("p99_est"),
        "p50_exact",
        "p95_exact",
        "p99_exact",
    )
