"""Wider analytics coverage: window functions, rollup, anti-joins,
distinct aggregates, running totals — each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metastore_spark.queries import query, _t
from metastore_spark.ts import ts_us, us_to_ts


@query(
    "top_customers_per_nation",
    oracle="""
    SELECT n_name, c_custkey, ROUND(c_acctbal, 2) AS acctbal, rnk
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (
               PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey
             ) AS rnk
      FROM customer
    ) t
    JOIN nation ON c_nationkey = n_nationkey
    WHERE rnk <= 3
    """,
)
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: window row_number, dimension broadcast join.

    Scale notes: one shuffle on the partition key; nation broadcast.
    For heavy skew on the window key, pre-aggregate a per-partition
    top-k before the global window (not needed at catalog cardinality).
    """
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    ranked = c.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 3)
    return ranked.join(
        F.broadcast(n), ranked.c_nationkey == n.n_nationkey
    ).select(
        "n_name",
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        "rnk",
    )


@query(
    "orders_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT)      AS n_orders,
           ROUND(SUM(o_totalprice), 2)   AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregation: ROLLUP(status, priority) including
    the grand total — Spark expands grouping sets in one pass with
    partial aggregation per set."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
    )
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: existence-negation without materializing the right
    side — broadcast when the key set fits, else a shuffled left-anti.
    Scoped to H1-1995 orders so the result is non-trivial at every SF.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp")
    )
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "distinct_suppliers_per_flag",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(*) AS BIGINT)                  AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def distinct_suppliers_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple exact distinct aggregates: Catalyst's expand+partial
    strategy — each distinct column shuffles once on (group, value)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "customer_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
           ), 2) AS running_spend
    FROM orders
    WHERE o_custkey < 50
    """,
)
def customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer: ordered window aggregation.

    The frame is the default RANGE-to-current-row over a total order
    (orderdate, orderkey unique) → deterministic cumulative sums.
    """
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "part_type_revenue_share",
    oracle="""
    WITH rev AS (
      SELECT p_type, SUM(l_extendedprice * (1 - l_discount)) AS r
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_type
    )
    SELECT p_type,
           ROUND(r, 2) AS revenue,
           ROUND(r / SUM(r) OVER (), 6) AS share
    FROM rev
    """,
)
def part_type_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-total: aggregate then unpartitioned window over the
    (tiny) aggregate — the big table shuffles once for the groupBy;
    the window runs on groups only."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_type")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r"))
    )
    w = Window.partitionBy()
    return rev.select(
        "p_type",
        F.round("r", 2).alias("revenue"),
        F.round(F.col("r") / F.sum("r").over(w), 6).alias("share"),
    )


@query(
    "customer_spend_deciles",
    oracle="""
    WITH spend AS (
      SELECT c_custkey, SUM(o_totalprice) AS total_spend
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT)      AS n_customers,
           ROUND(SUM(total_spend), 2)    AS decile_spend,
           ROUND(AVG(total_spend), 4)    AS avg_spend
    FROM (
      SELECT c_custkey, total_spend,
             NTILE(10) OVER (ORDER BY total_spend, c_custkey) AS decile
      FROM spend
    )
    GROUP BY decile
    ORDER BY decile
    """,
)
def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value deciles with NO global window: exact
    global rank via range-repartition + per-partition row_number +
    cumulative partition offsets (operators/ranking.py), then the
    exact NTILE bucket as a pure function of (rank, n). Bit-identical
    to the oracle's NTILE(10) OVER (ORDER BY total_spend, c_custkey)
    — the custkey tiebreaker makes assignment deterministic — but
    every stage is parallel: the plan has no single-partition
    WindowExec (asserted in tests/test_plans.py), so the shape
    survives a 100× customer count."""
    from metastore_spark.operators.ranking import global_rank, ntile_from_rank

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    spend = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(F.sum("o_totalprice").alias("total_spend"))
    )
    ranked = global_rank(spend, ["total_spend", "c_custkey"], "rank")
    n = ranked.count()  # materialized by global_rank — count reads the checkpoint
    return (
        ranked.withColumn("decile", ntile_from_rank(F.col("rank"), n, 10))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("total_spend"), 2).alias("decile_spend"),
            F.round(F.avg("total_spend"), 4).alias("avg_spend"),
        )
        .orderBy("decile")
    )


@query(
    "orders_grouping_sets",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus) AS BIGINT)   AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           CAST(COUNT(*) AS BIGINT)         AS n_orders,
           ROUND(SUM(o_totalprice), 2)      AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY g_status, g_priority, status, priority
    """,
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (two one-dimension slices + grand
    total) with GROUPING() indicators — the third member of the
    cube/rollup family, planned as ONE Expand + aggregate pass (no
    per-set rescans). COALESCE folds the set-local NULLs so the
    indicator columns, not NULL ambiguity, mark the aggregation
    level."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_orders_gs")
    return o.sparkSession.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus) AS BIGINT)   AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
               COUNT(*)                         AS n_orders,
               ROUND(SUM(o_totalprice), 2)      AS revenue
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_priority, status, priority
        """
    )


@query(
    "events_salted_enrich",
    oracle="""
    SELECT c.c_mktsegment           AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(e.value), 2)   AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def events_salted_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe fact-dim join via explicit salting (operators/skew.py):
    the big side's keys spread across 8 salt buckets, the dim
    replicated to match, so one dominant user can never bottleneck a
    single reducer (the belt-and-braces form of what AQE skew-split
    does adaptively). Salting must be semantically invisible — the
    oracle pins the result to the PLAIN SQL join, so a salting bug
    (lost rows, duplicate dim matches) fails the value hash."""
    from metastore_spark.operators.skew import salted_join

    e = _t(spark, sf_dir, "events").select("user_id", "value")
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(e, dim, "user_id", num_salts=8)
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "lineitem_price_histogram",
    oracle="""
    WITH mm AS (
      SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
      FROM lineitem
    )
    SELECT CAST(least(floor((l_extendedprice - lo) / ((hi - lo) / 20)), 19)
                AS INT)                  AS bucket,
           CAST(COUNT(*) AS BIGINT)      AS n_rows,
           ROUND(MIN(l_extendedprice), 2) AS bucket_min,
           ROUND(MAX(l_extendedprice), 2) AS bucket_max
    FROM lineitem, mm
    GROUP BY 1
    ORDER BY 1
    """,
)
def lineitem_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bucket histogram — the profiling primitive behind
    any data-quality dashboard. min/max come from one tiny aggregate
    broadcast back over the scan (scalar-subquery pattern), bucketing
    is pure arithmetic fused into the scan, and the rollup is a
    20-group partial agg: two passes, no corpus-sized shuffle at any
    scale. The top edge folds into the last bucket (least(..., 19)) on
    both engines."""
    l = _t(spark, sf_dir, "lineitem")
    mm = l.agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    width = (F.col("hi") - F.col("lo")) / 20
    bucket = F.least(
        F.floor((F.col("l_extendedprice") - F.col("lo")) / width), F.lit(19)
    ).cast("int")
    return (
        l.crossJoin(F.broadcast(mm))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("l_extendedprice"), 2).alias("bucket_min"),
            F.round(F.max("l_extendedprice"), 2).alias("bucket_max"),
        )
        .orderBy("bucket")
    )


@query(
    "orders_column_profile",
    oracle="""
    SELECT 'o_totalprice' AS col,
           CAST(COUNT(*) AS BIGINT)                   AS n_rows,
           CAST(COUNT(o_totalprice) AS BIGINT)        AS n_nonnull,
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS n_distinct,
           ROUND(MIN(o_totalprice), 2)                AS min_v,
           ROUND(MAX(o_totalprice), 2)                AS max_v,
           ROUND(AVG(o_totalprice), 4)                AS mean_v
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           ROUND(MIN(o_custkey), 2),
           ROUND(MAX(o_custkey), 2),
           ROUND(AVG(o_custkey), 4)
    FROM orders
    """,
)
def orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (null/distinct/min/max/mean per column) — the
    ingest-time data-quality summary. All metrics for all profiled
    columns compute in ONE aggregation job over one scan (Spark plans
    the multi-distinct via expand), not one pass per column."""
    o = _t(spark, sf_dir, "orders")
    out = []
    for c in ("o_totalprice", "o_custkey"):
        out.append(
            o.agg(
                F.lit(c).alias("col"),
                F.count(F.lit(1)).alias("n_rows"),
                F.count(c).alias("n_nonnull"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                F.round(F.min(c), 2).alias("min_v"),
                F.round(F.max(c), 2).alias("max_v"),
                F.round(F.avg(c), 4).alias("mean_v"),
            )
        )
    a, b = out
    return a.unionByName(b)


@query(
    "users_setops_funnel",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 90
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'click' AND value > 90
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error' AND value > 95
    """,
)
def users_setops_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operator composition: users with a big purchase AND a big
    click but no big error — INTERSECT then EXCEPT with ANSI set
    (distinct) semantics. Spark plans these as aggregate-then-join on the
    hashed key (one shuffle per operand, partial distinct map-side);
    no full-row comparison materializes.
    """
    e = _t(spark, sf_dir, "events")

    def users(t: str, cut: float) -> DataFrame:
        return e.filter(
            (F.col("event_type") == t) & (F.col("value") > cut)
        ).select("user_id")

    return (
        users("purchase", 90)
        .intersect(users("click", 90))
        .subtract(users("error", 95))
    )


@query(
    "lineitem_stats_profile",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 4) + 0.0  AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) + 0.0 AS qty_price_covar,
           ROUND(stddev_samp(l_extendedprice), 4)             AS price_stddev,
           ROUND(var_samp(l_discount), 6)                     AS discount_var
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def lineitem_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-aggregate family (corr / covar_samp / stddev_samp /
    var_samp) per group — all mergeable moment sketches in Spark:
    partial (n, Σx, Σy, Σxy, Σx², Σy²) map-side, one tiny shuffle,
    no second pass. Both engines agree at 4-6 decimals on these
    moments, pinned by the oracle."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        (F.round(F.corr("l_quantity", "l_extendedprice"), 4) + F.lit(0.0)).alias(
            "qty_price_corr"
        ),
        (F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4) + F.lit(0.0)).alias(
            "qty_price_covar"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("l_discount"), 6).alias("discount_var"),
    )


@query(
    "orders_trend_regression",
    oracle="""
    SELECT o_orderpriority,
           ROUND(regr_slope(o_totalprice,
                 date_diff('day', DATE '1992-01-01', o_orderdate)), 4) + 0.0
             AS slope_per_day,
           ROUND(regr_intercept(o_totalprice,
                 date_diff('day', DATE '1992-01-01', o_orderdate)), 4)
             AS intercept,
           CAST(regr_count(o_totalprice,
                 date_diff('day', DATE '1992-01-01', o_orderdate)) AS BIGINT)
             AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def orders_trend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares trend (regr_slope / regr_intercept /
    regr_count): is order value drifting over time per priority class?
    Same partial-moment aggregation shape as the stats profile — a
    distributed OLS fit in one shuffle with no iteration."""
    o = _t(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
    return o.groupBy("o_orderpriority").agg(
        (F.round(F.regr_slope(F.col("o_totalprice"), day), 4) + F.lit(0.0)).alias(
            "slope_per_day"
        ),
        F.round(F.regr_intercept(F.col("o_totalprice"), day), 4).alias(
            "intercept"
        ),
        F.regr_count(F.col("o_totalprice"), day).cast("long").alias("n"),
    )


@query(
    "customers_name_fuzzy",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(levenshtein(c_name, 'Customer#000000100') AS INTEGER)
             AS edit_dist
    FROM customer
    WHERE levenshtein(c_name, 'Customer#000000100') <= 2
    """,
)
def customers_name_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy lookup: edit distance <= 2 from a probe string — the
    typo-tolerant entity-resolution primitive. Map-only (levenshtein
    fuses into the scan); a pairwise fuzzy JOIN at scale would first
    block on cheap invariants (length bands, q-gram buckets) exactly
    like the LSH dedup operators block before verifying."""
    c = _t(spark, sf_dir, "customer")
    d = F.levenshtein(F.col("c_name"), F.lit("Customer#000000100"))
    return (
        c.select("c_custkey", "c_name", d.cast("int").alias("edit_dist"))
        .filter(F.col("edit_dist") <= 2)
    )


@query(
    "events_daily_user_bitmap",
    oracle="""
    SELECT STRFTIME(date_trunc('day', ts), '%Y-%m-%d') AS day,
           bit_or(1::BIGINT << CAST(user_id % 60 AS INTEGER)) AS user_bitmap,
           CAST(COUNT(DISTINCT user_id % 60) AS BIGINT) AS n_buckets
    FROM events
    GROUP BY 1
    """,
)
def events_daily_user_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap index aggregate: one bigint per day whose bits mark
    active user buckets (user_id mod 60) — the roaring-bitmap idea in
    its single-word form. bit_or is commutative, so partials combine
    map-side and each day shuffles one long regardless of event
    volume; bitmap AND/OR across days then answers
    retention/overlap questions without touching facts again."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(
                F.col("ts"), "yyyy-MM-dd"
            ).alias("day")
        )
        .agg(
            F.bit_or(
                F.expr("shiftleft(1L, cast(user_id % 60 as int))")
            ).alias("user_bitmap"),
            F.countDistinct(F.expr("user_id % 60")).alias("n_buckets"),
        )
    )


@query(
    "events_incremental_agg",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(value::DECIMAL(18,6)), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def events_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a 'materialized' aggregate over
    the first 25 days merged with the delta aggregate of later
    arrivals — WITHOUT rescanning the base. The merged result must be
    indistinguishable from the one-pass aggregate the oracle runs,
    which is exactly the IVM contract; DECIMAL(18,6) partials make
    the merge associativity-proof (double partials could drift at the
    last bit under re-grouping).

    At scale the base aggregate is a stored table and only the delta
    scan runs per refresh; count/sum (and min/max, or any commutative
    monoid) merge this way — that is why the engine's aggregates
    favor mergeable forms (see also the HLL and percentile_approx
    sketches).
    """
    e = _t(spark, sf_dir, "events")
    cutoff_us = 1706140800000000  # 2024-01-25T00:00:00Z

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("v"),
        )

    base = partial(e.filter(ts_us("ts") < cutoff_us))
    delta = partial(e.filter(ts_us("ts") >= cutoff_us))
    merged = base.unionByName(delta).groupBy("event_type").agg(
        F.sum("n").alias("n_events"),
        F.sum("v").alias("total_value"),
    )
    return merged.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        # Round on the exact DECIMAL, then cast (oracle-portability).
        F.round(F.col("total_value"), 2).cast("double").alias("total_value"),
    )


# Unrolled 15-term nibble fold for the integrity-checksum oracle.
# The generic `_ph60`-style fold elsewhere uses
# list_sum(list_transform(range(...), lambda)) — list-aggregate typing
# is the most version-sensitive DuckDB surface (the one driver
# hash-mismatch in 11 rounds landed on this query while the same SQL
# passed duckdb 1.0.0 locally), so this oracle spells the fold as 15
# scalar terms: plain strpos/substr arithmetic with integer literals,
# which every DuckDB release pins bit-exactly.
_CHECKSUM_FOLD = " + ".join(
    f"CAST(strpos('0123456789abcdef', substr(md5(canon), {i}, 1)) - 1"
    f" AS BIGINT) * {1 << (4 * (15 - i))}"
    for i in range(1, 16)
)


@query(
    "events_integrity_checksum",
    oracle=f"""
    WITH rows_c AS (
      SELECT event_type,
             event_id || '|' || EPOCH_US(ts) || '|' || user_id || '|'
               || CAST(floor(value * 100 + 0.5) AS BIGINT) || '|' || props
               AS canon
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           bit_xor({_CHECKSUM_FOLD}) AS checksum
    FROM rows_c
    GROUP BY event_type
    """,
)
def events_integrity_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine table integrity checksum: per partition key, XOR of
    a portable 60-bit row hash over a canonical row rendering (value
    as integer cents — never a float's engine-specific string form).

    bit_xor is commutative and width-stable, so the checksum is
    independent of row order, partitioning, and engine — two systems
    holding the same logical table agree bit-for-bit, which is how a
    migration (or a replica) is audited without moving data. One
    map-side hash + one tiny shuffle of (key, xor) partials.

    Portability hardening (round 12): the cents canon is
    ``floor(value*100 + 0.5)`` — pure double arithmetic both engines
    evaluate identically — instead of ``ROUND(double)``, whose
    half-case tie-breaking (Spark BigDecimal HALF_UP on the shortest
    decimal rendering vs DuckDB's C-library round) is the other
    engine-drift suspect; and the oracle's hex fold is unrolled to
    scalar SQL (see _CHECKSUM_FOLD above).
    """
    from metastore_spark.dedup.ops import portable_hash60

    e = _t(spark, sf_dir, "events")
    canon = F.concat_ws(
        "|",
        F.col("event_id"),
        ts_us("ts"),
        F.col("user_id"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
        F.col("props"),
    )
    return (
        e.select("event_type", portable_hash60(canon).alias("h"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor("h").alias("checksum"),
        )
    )


@query(
    "events_daily_anomaly_zscore",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             STRFTIME(date_trunc('day', ts), '%Y-%m-%d') AS day,
             SUM(value) AS revenue
      FROM events GROUP BY 1, 2
    ),
    scored AS (
      SELECT event_type, day, revenue,
             AVG(revenue) OVER w    AS mu,
             STDDEV_SAMP(revenue) OVER w AS sigma,
             COUNT(*) OVER w        AS n_hist
      FROM daily
      WINDOW w AS (
        PARTITION BY event_type ORDER BY day
        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING
      )
    )
    SELECT event_type, day,
           ROUND(revenue, 2) AS revenue,
           ROUND((revenue - mu) / sigma, 4) + 0.0 AS zscore,
           ABS((revenue - mu) / sigma) > 3.0 AS is_anomaly
    FROM scored
    WHERE n_hist >= 7 AND sigma > 0
    """,
)
def events_daily_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags on the daily revenue series: each
    (event_type, day) scores against the TRAILING 7-day window
    excluding itself (self-inclusion would dampen the very spike being
    tested). The monitoring primitive for pipeline health at scale —
    the window runs over the daily AGGREGATE (one row per type×day),
    partitioned by type, never over raw events; warm-up rows (fewer
    than 7 prior days) and zero-variance windows are excluded
    deterministically on both engines."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.sum("value").alias("revenue"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    z = (F.col("revenue") - F.avg("revenue").over(w)) / F.stddev_samp(
        "revenue"
    ).over(w)
    scored = daily.select(
        "event_type",
        "day",
        F.round("revenue", 2).alias("revenue"),
        (F.round(z, 4) + F.lit(0.0)).alias("zscore"),
        (F.abs(z) > 3.0).alias("is_anomaly"),
        F.count(F.lit(1)).over(w).alias("_n"),
        F.stddev_samp("revenue").over(w).alias("_sig"),
    )
    return scored.filter(
        (F.col("_n") >= 7) & (F.col("_sig") > 0)
    ).drop("_n", "_sig")


@query(
    "docs_column_profile",
    oracle="""
    SELECT 'doc_id' AS column_name,
           CAST(COUNT(*) AS BIGINT)                       AS n_rows,
           CAST(COUNT(*) - COUNT(doc_id) AS BIGINT)       AS n_nulls,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT)         AS n_distinct,
           CAST(MIN(doc_id) AS VARCHAR)                   AS min_val,
           CAST(MAX(doc_id) AS VARCHAR)                   AS max_val
    FROM documents
    UNION ALL
    SELECT 'lang', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(lang) AS BIGINT),
           CAST(COUNT(DISTINCT lang) AS BIGINT),
           MIN(lang), MAX(lang)
    FROM documents
    UNION ALL
    SELECT 'source', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(source) AS BIGINT),
           CAST(COUNT(DISTINCT source) AS BIGINT),
           MIN(source), MAX(source)
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(n_chars) AS BIGINT),
           CAST(COUNT(DISTINCT n_chars) AS BIGINT),
           CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
    FROM documents
    """,
)
def docs_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling — the statistics a METADATA STORE serves about
    its corpora (the reference's whole domain is dataset metadata):
    per-column row/null/distinct counts and min/max, computed in ONE
    scan via grouped conditional aggregates (the long-format output is
    an unpivot of a single aggregate row — no per-column rescans; the
    oracle states the naive per-column UNION for clarity). At 100 TB
    swap exact distincts for approx_count_distinct; kept exact here so
    the oracle pins real values."""
    d = _t(spark, sf_dir, "documents")
    row = d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            x
            for c in ("doc_id", "lang", "source", "n_chars")
            for x in (
                F.count(c).alias(f"{c}_nn"),
                F.count_distinct(c).alias(f"{c}_nd"),
                F.min(c).cast("string").alias(f"{c}_min"),
                F.max(c).cast("string").alias(f"{c}_max"),
            )
        ],
    )
    stack = ", ".join(
        f"'{c}', {c}_nn, {c}_nd, {c}_min, {c}_max"
        for c in ("doc_id", "lang", "source", "n_chars")
    )
    return row.selectExpr(
        "n_rows",
        f"stack(4, {stack}) AS (column_name, _nn, n_distinct, min_val, max_val)",
    ).select(
        "column_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        (F.col("n_rows") - F.col("_nn")).cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_val",
        "max_val",
    )


@query(
    "events_journey_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (
             PARTITION BY event_type), 4) AS p_transition
    FROM ordered
    WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def events_journey_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey Markov transition matrix: consecutive event-type
    bigrams per user (lead over (ts, event_id) — a deterministic total
    order) rolled into counts and row-normalized transition
    probabilities. The funnel-discovery complement to the fixed-path
    funnel query: one shuffle on user_id for the sequence window, then
    a types x types aggregate whose normalizing window runs over at
    most |types|^2 rows."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    w_norm = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions")
            / F.sum("n_transitions").over(w_norm),
            4,
        ).alias("p_transition"),
    )


@query(
    "events_top_value_per_type",
    oracle="""
    SELECT event_id, ts_us, user_id, event_type, value, rnk
    FROM (
      SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY value DESC, event_id
             ) AS rnk
      FROM events
    ) t WHERE rnk <= 5
    """,
)
def events_top_value_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 events per type by value — via the bounded-memory
    ``grouped_topk`` operator (operators/topk.py), NOT the naive
    window: phase 1 keeps each scan partition's own top-5 per type in
    an Arrow kernel, so the exchange carries ≤ partitions × types × 5
    rows instead of the whole events table. Identical result to
    ``row_number() <= 5`` (tie-break (value DESC, event_id) is unique);
    at 100 TB the naive window shuffles 100 TB, this shuffles
    kilobytes. `top_customers_per_nation` keeps the naive-window twin
    shape for comparison."""
    from metastore_spark.operators.topk import grouped_topk

    e = _t(spark, sf_dir, "events").select(
        "event_id", ts_us("ts").alias("ts_us"), "user_id", "event_type", "value"
    )
    return grouped_topk(
        e,
        ["event_type"],
        [("value", False), ("event_id", True)],
        k=5,
        rank_col="rnk",
    )


@query(
    "docs_top_chars_per_source",
    oracle="""
    SELECT source, doc_id, n_chars, rnk
    FROM (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY n_chars DESC, doc_id
             ) AS rnk
      FROM documents
    ) t WHERE rnk <= 3
    """,
)
def docs_top_chars_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest 3 documents per source via ``grouped_topk`` — the
    per-source exemplar pick every curation dashboard needs, in the
    partial-agg shape that never shuffles the corpus."""
    from metastore_spark.operators.topk import grouped_topk

    d = _t(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    return grouped_topk(
        d,
        ["source"],
        [("n_chars", False), ("doc_id", True)],
        k=3,
        rank_col="rnk",
    )


@query(
    "customers_rfm_segments",
    oracle="""
    WITH base AS (
      SELECT c_custkey,
             MAX(o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ),
    b AS (
      SELECT cents,
             NTILE(4) OVER (ORDER BY last_order, c_custkey) AS r_bucket,
             NTILE(4) OVER (ORDER BY freq, c_custkey)       AS f_bucket,
             NTILE(4) OVER (ORDER BY cents, c_custkey)      AS m_bucket
      FROM base
    )
    SELECT r_bucket, f_bucket, m_bucket,
           CAST(COUNT(*) AS BIGINT)       AS n_customers,
           ROUND(SUM(cents) / 100.0, 2)   AS segment_value
    FROM b
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def customers_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: quartile-bucket every customer on
    Recency (last order date), Frequency (order count), and Monetary
    (lifetime spend, exact integer cents), then roll up the 4×4×4
    segment grid — the classic CRM slicing, composed from the
    distributed exact-NTILE operator.

    Each of the three bucketings is a `global_rank` pass
    (range-repartition + per-partition row_number + cumulative
    offsets — NO single-partition window, the customer_spend_deciles
    shape ×3) with a custkey tiebreak making every assignment
    deterministic; monetary ranks on order-independent integer cents
    so no two engines can disagree about near-equal spends. The
    final rollup is a ≤64-group partial agg."""
    from metastore_spark.operators.ranking import global_rank, ntile_from_rank

    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5)
        .cast("bigint")
        .alias("cents"),
    )
    # customer grows with the corpus — no forced broadcast (driver OOM
    # risk at 100×); AQE picks shuffle vs broadcast by actual size
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("freq"),
            F.sum("cents").alias("cents"),
        )
    )
    ranked = global_rank(base, ["last_order", "c_custkey"], "r_rank")
    n = ranked.count()  # materialized by global_rank — count reads the checkpoint
    ranked = ranked.withColumn(
        "r_bucket", ntile_from_rank(F.col("r_rank"), n, 4)
    )
    ranked = global_rank(ranked, ["freq", "c_custkey"], "f_rank")
    ranked = ranked.withColumn(
        "f_bucket", ntile_from_rank(F.col("f_rank"), n, 4)
    )
    ranked = global_rank(ranked, ["cents", "c_custkey"], "m_rank")
    ranked = ranked.withColumn(
        "m_bucket", ntile_from_rank(F.col("m_rank"), n, 4)
    )
    return (
        ranked.groupBy("r_bucket", "f_bucket", "m_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("cents") / 100.0, 2).alias("segment_value"),
        )
        .orderBy("r_bucket", "f_bucket", "m_bucket")
    )


@query(
    "parts_market_basket",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM baskets),
    items AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM baskets GROUP BY 1
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS cnt_ab
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    )
    SELECT part_a, part_b, cnt_ab,
           ROUND(cnt_ab * 1.0 * n.n_orders / (ia.cnt * ib.cnt), 4) AS lift
    FROM pairs
    JOIN items ia ON ia.l_partkey = part_a
    JOIN items ib ON ib.l_partkey = part_b
    CROSS JOIN n
    ORDER BY lift DESC, part_a, part_b
    LIMIT 30
    """,
)
def parts_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: part pairs that co-occur in
    orders more than independence predicts (lift = P(ab)/(P(a)P(b))),
    min support 2 baskets, top-30 by lift — the classic
    frequently-bought-together query, the 2-itemset core of
    Apriori/FP-growth. (Support is deliberately low: the part catalog
    grows with SF, so pair co-occurrence thins — an absolute support
    of 3 already selects ZERO pairs at sf1, the q11 threshold lesson
    again; production would set support as a fraction of baskets per
    category.)

    Scale shape: one shuffle to per-order part sets, then the
    2-combinations generate in-expression from each sorted basket
    (bounded by basket_size² per order — never a catalog-wide cross
    of parts, and no self-join materialization); item counts are
    vocabulary-sized and broadcast; lift arithmetic is exact integers
    until one final division, so both engines order pairs
    identically. Top-30 is a sort-limit (TakeOrderedAndProject)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # one shuffle to per-order part SETS; the 2-combinations generate
    # IN-EXPRESSION from the sorted array (x before y in sort order ==
    # the oracle's part_a < part_b join condition) — no self-join, no
    # second basket materialization; measured 1.8x the join form
    sets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    sets.persist()
    n_orders = sets.count()
    items = sets.select(
        F.explode("ps").alias("l_partkey")
    ).groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    pairs = (
        sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) ->"
                    " transform(slice(ps, i + 2, size(ps)),"
                    " y -> struct(x as part_a, y as part_b))))"
                )
            ).alias("p")
        )
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("cnt_ab"))
        .filter(F.col("cnt_ab") >= 2)
    )
    ia = items.select(
        F.col("l_partkey").alias("part_a"), F.col("cnt").alias("cnt_a")
    )
    ib = items.select(
        F.col("l_partkey").alias("part_b"), F.col("cnt").alias("cnt_b")
    )
    return (
        pairs.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .select(
            "part_a",
            "part_b",
            "cnt_ab",
            F.round(
                F.col("cnt_ab") * 1.0 * F.lit(n_orders)
                / (F.col("cnt_a") * F.col("cnt_b")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(30)
    )


def _ph60_sql(col: str) -> str:
    # single source of truth for the portable-hash SQL mirror
    from metastore_spark.queries_dedup import _ph60

    return _ph60(col)


@query(
    "events_ab_test_zscore",
    oracle=f"""
    WITH assign AS (
      SELECT DISTINCT user_id,
             {_ph60_sql("user_id::VARCHAR")} % 2 AS variant
      FROM events
    ),
    conv AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    cells AS (
      SELECT a.variant,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_converted
      FROM assign a LEFT JOIN conv c ON a.user_id = c.user_id
      GROUP BY 1
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN variant = 0 THEN n_users END)      AS n0,
        MAX(CASE WHEN variant = 0 THEN n_converted END)  AS c0,
        MAX(CASE WHEN variant = 1 THEN n_users END)      AS n1,
        MAX(CASE WHEN variant = 1 THEN n_converted END)  AS c1
      FROM cells
    )
    SELECT n0, c0, n1, c1,
           ROUND(c0 * 1.0 / n0, 4) AS rate0,
           ROUND(c1 * 1.0 / n1, 4) AS rate1,
           ROUND(
             (c1 * 1.0 / n1 - c0 * 1.0 / n0)
             / sqrt( ((c0 + c1) * 1.0 / (n0 + n1))
                     * (1.0 - (c0 + c1) * 1.0 / (n0 + n1))
                     * (1.0 / n0 + 1.0 / n1) ),
             4) AS zscore
    FROM wide
    """,
)
def events_ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation readout: users deterministically hash-assigned
    to two variants (portable_hash60 % 2 — the same stable bucketing
    a production experimentation system uses, and exactly mirrorable
    in SQL), per-variant conversion-to-purchase rates, and the
    two-proportion pooled z-statistic — the significance number an
    A/B dashboard prints. Every input to the z formula is an exact
    integer (distinct-user and converter counts), so both engines
    compute the identical statistic to 4dp.

    Scale shape: assignment is one distinct on user (partial-agg),
    conversion the same on purchase events, one broadcast-able join,
    then a 2-row → 1-row fold. Nothing scales with event volume
    except the two distinct passes."""
    from metastore_spark.dedup.ops import portable_hash60

    ev = _t(spark, sf_dir, "events")
    assign = ev.select("user_id").distinct().select(
        "user_id",
        F.pmod(portable_hash60(F.col("user_id").cast("string")), F.lit(2))
        .alias("variant"),
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("_c", F.lit(1))
    )
    cells = (
        assign.join(F.broadcast(conv), "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.coalesce(F.col("_c"), F.lit(0))).alias("n_converted"),
        )
    )
    wide = cells.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
    )
    p0 = F.col("c0") * 1.0 / F.col("n0")
    p1 = F.col("c1") * 1.0 / F.col("n1")
    pp = (F.col("c0") + F.col("c1")) * 1.0 / (F.col("n0") + F.col("n1"))
    z = (p1 - p0) / F.sqrt(
        pp * (1.0 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
    )
    return wide.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(p0, 4).alias("rate0"),
        F.round(p1, 4).alias("rate1"),
        F.round(z, 4).alias("zscore"),
    )


@query(
    "orders_cohort_ltv_curve",
    oracle="""
    WITH o AS (
      SELECT o_custkey,
             date_trunc('month', o_orderdate) AS mon,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    cohort AS (
      SELECT o_custkey, MIN(mon) AS cohort_mon FROM o GROUP BY 1
    ),
    cell AS (
      SELECT c.cohort_mon,
             CAST(datediff('month', c.cohort_mon, o.mon) AS BIGINT) AS age,
             CAST(SUM(o.cents) AS BIGINT) AS cents
      FROM o JOIN cohort c ON o.o_custkey = c.o_custkey
      GROUP BY 1, 2
    ),
    sizes AS (
      SELECT cohort_mon, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM cohort GROUP BY 1
    )
    SELECT CAST(CAST(cell.cohort_mon AS DATE) AS VARCHAR) AS cohort_month,
           age,
           CAST(SUM(cents) OVER (
                  PARTITION BY cell.cohort_mon ORDER BY age
                ) // s.n_customers AS BIGINT)
             AS cum_cents_per_customer
    FROM cell JOIN sizes s ON s.cohort_mon = cell.cohort_mon
    WHERE age <= 6
    ORDER BY cohort_month, age
    """,
)
def orders_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: customers grouped by first-order month, then
    cumulative revenue per cohort member by cohort age (months since
    acquisition, first 7 points) — the payback-period chart every
    subscription/commerce business draws next to retention. Revenue
    stays exact integer cents END TO END — the first draft's
    ROUND(x, 4) on a ~3e5-magnitude double hit a decimal-half ulp
    boundary at sf0.001 (large magnitudes make boundary collisions
    likely: ulp grows with the value); integer floor-div per
    customer can't — the cohort assignment is a MIN partial-agg, and the
    running total is a window over the |cohorts|×|ages| aggregate —
    never over raw orders. The age cutoff bounds output size at any
    SF."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_trunc("month", F.col("o_orderdate")).alias("mon"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5)
        .cast("bigint")
        .alias("cents"),
    )
    cohort = o.groupBy("o_custkey").agg(F.min("mon").alias("cohort_mon"))
    cell = (
        o.join(cohort, "o_custkey")
        .groupBy(
            "cohort_mon",
            F.months_between(F.col("mon"), F.col("cohort_mon"))
            .cast("bigint")
            .alias("age"),
        )
        .agg(F.sum("cents").alias("cents"))
    )
    sizes = cohort.groupBy("cohort_mon").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    return (
        cell.join(F.broadcast(sizes), "cohort_mon")
        .filter(F.col("age") <= 6)
        .select(
            F.col("cohort_mon").cast("date").cast("string").alias(
                "cohort_month"
            ),
            "age",
            F.expr("sum(cents) over (partition by cohort_mon"
                   " order by age rows between unbounded preceding"
                   " and current row) div n_customers")
            .cast("bigint")
            .alias("cum_cents_per_customer"),
        )
        .orderBy("cohort_month", "age")
    )


@query(
    "events_dau_wau_stickiness",
    oracle="""
    WITH e AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
      FROM events
    ),
    dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM e GROUP BY d),
    wau AS (
      SELECT (e.d + INTERVAL (t.i) DAY)::DATE AS w,
             CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS wau
      FROM e CROSS JOIN range(7) t(i)
      GROUP BY 1
    )
    SELECT CAST(dau.d AS VARCHAR) AS day, dau.dau, wau.wau,
           ROUND(dau.dau * 1.0 / wau.wau, 4) AS stickiness
    FROM dau JOIN wau ON wau.w = dau.d
    ORDER BY day
    """,
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement: daily active users, trailing-7-day actives, and
    the DAU/WAU stickiness ratio per day — the retention health
    metric every consumer dashboard leads with.

    The trailing-window distinct is computed WITHOUT a 7-way
    self-join: each (day, user) activity row fans out to the 7
    window-ends it belongs to (explode of a 7-literal sequence — a
    bounded 7× exchange on already day-deduped user rows, O(active
    pairs), never raw events), then one COUNT(DISTINCT) per window.
    Counts are exact integers; the ratio is one division rounded at
    4dp."""
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"), "user_id"
    ).distinct()
    e.persist()
    dau = e.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    wau = (
        e.select(
            F.expr("explode(sequence(0, 6))").alias("i"), "d", "user_id"
        )
        .select(F.expr("date_add(d, i)").alias("w"), "user_id")
        .groupBy("w")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, dau.d == wau.w)
        .select(
            F.col("d").cast("string").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau") * 1.0 / F.col("wau"), 4).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )
