"""Query registry: every operator from SURVEY.md §2 (plus the
LLM-pipeline extensions) bound to the driver's catalog tables, each
with a DuckDB-equivalent oracle SQL string.

Conventions that keep the oracle hash-stable across engines:
- every computed column is aliased identically on both sides
- double-typed aggregates are ROUNDed (2dp for money sums, 4dp for
  ratios/averages/similarities) — floating-point summation order
  differs between engines, rounding absorbs the last-bit drift
- timestamps are projected as epoch microseconds (unix_micros /
  epoch_us) or ISO date strings — never as raw timestamp values
- any top-k has a unique tiebreaker column in the ORDER BY
- a ROUND whose input can be a tiny NEGATIVE (deltas, z-scores,
  correlations, covariances, centroids) gets `+ 0.0` on BOTH sides:
  DuckDB's ROUND yields IEEE -0.0 where Spark yields 0.0, and the
  hash compare distinguishes their representations
"""

from __future__ import annotations

import os

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metastore_spark.catalog import load_table
from metastore_spark.operators.filters import (
    apply_filters,
    visibility_predicate,
)
from metastore_spark.operators.paging import paginate
from metastore_spark.params import parse_params
from metastore_spark.session import tune_runtime
from metastore_spark.ts import ts_us


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    # validation_only: this query exists as the exhaustive/exact twin of
    # a scale-safe variant (e.g. all-pairs GEMM vs SRP-LSH buckets) —
    # correct at any SF the oracle can check, but NOT the plan to ship
    # at 100 TB. Consumers picking operators programmatically must
    # prefer the non-tagged sibling named in `scale_path`.
    validation_only: bool = False
    scale_path: str | None = None


REGISTRY: dict[str, QueryDef] = {}


def query(
    name: str,
    oracle: str | None = None,
    validation_only: bool = False,
    scale_path: str | None = None,
):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_runtime(spark)
            # Drop PREVIOUS queries' persisted frames before building
            # this one: per-query caches are intra-query optimizations,
            # and a harness that runs dozens of registry queries in one
            # JVM (driver correctness sample, bench, oracle sweep) must
            # not accumulate them until the heap dies. Composed queries
            # are safe: the inner wrapper runs before the outer body
            # caches anything. Serving stores are parquet reopens and
            # are unaffected.
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__module__ = fn.__module__
        REGISTRY[name] = QueryDef(
            wrapped, oracle, validation_only=validation_only,
            scale_path=scale_path,
        )
        return wrapped

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _t_compute(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``_t`` repartitioned to the session's parallelism — for
    COMPUTE-BOUND queries whose first heavy stage is per-row work
    (tokenize + explode / HOF chains) over a corpus that may scan as
    very few partitions (the small local fixtures are single files).
    One tiny exchange of (id, text)-sized rows buys full-width
    compute; at 100 TB the corpus is many files and AQE coalescing
    keeps the exchange from fragmenting. Scan-bound or
    filter-pushdown queries should stay on `_t` — the repartition
    would only add a shuffle. (VERDICT r8 task 7's lesson, applied
    beyond the winnowing kernel.)"""
    return load_table(spark, sf_dir, name).repartition(
        spark.sparkContext.defaultParallelism
    )


def _scaled_width(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    column: str | None = None,
    bytes_per_part: int = 8 << 20,
    cap: int = 131072,
) -> int:
    """INPUT-SIZE-DERIVED shuffle width for explicit repartitions
    (r12 optimization round, guide §2.2/§2.5): a fixed
    ``defaultParallelism * k`` width is tuned for exactly one scale —
    too many tiny tasks on a small corpus (pure scheduler overhead
    at ~6 ms/task locally), too few fat ones at 100 TB (per-task agg
    hash maps exceed the heap — the exact OOM the explicit widths
    were added to prevent). Derive it instead from the parquet
    FOOTERS' uncompressed byte count of the driving column (a
    driver-side metadata read, no scan): one partition per
    ``bytes_per_part``, floored at the session parallelism so small
    corpora still use every core, capped at ``cap`` to bound plan
    size. Explicit widths stay exempt from AQE coalescing — that is
    their job (pinning join strategy / per-task memory) — but the
    value now tracks the data. Falls back to
    ``defaultParallelism * 8`` (the old constant) when the raw
    fixture file is absent (e.g. snapshot-served tables)."""
    import pyarrow.parquet as pq

    floor = spark.sparkContext.defaultParallelism
    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        files = (
            [path]
            if os.path.isfile(path)
            else [
                os.path.join(dp, f)
                for dp, _dirs, fs in os.walk(path)
                for f in fs
                if f.endswith(".parquet")
            ]
        )
        if not files:
            raise FileNotFoundError(path)
        total = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = {
                md.schema.column(i).name: i
                for i in range(md.num_columns)
            }
            for rg in range(md.num_row_groups):
                if column is not None and column in idx:
                    total += md.row_group(rg).column(
                        idx[column]
                    ).total_uncompressed_size
                else:
                    total += md.row_group(rg).total_byte_size
        return max(floor, min(cap, -(-total // bytes_per_part)))
    except Exception:
        return floor * 8


def _ts_us() -> F.Column:
    """events.ts is canonical TIMESTAMP_NTZ after catalog.load_table
    (see metastore_spark.ts); project epoch microseconds with pure
    wall-clock arithmetic — session-timezone-independent and equal to
    the oracle's DuckDB EPOCH_US(ts) bit-for-bit."""
    return ts_us("ts").alias("ts_us")


# ===========================================================================
# TPC-H-style analytics (scale headliners; exercise scan/filter/agg/join)
# ===========================================================================


@query(
    "q1_pricing_summary",
    oracle="""
    WITH l AS (
      SELECT l_returnflag, l_linestatus,
             CAST(l_quantity AS BIGINT)                            AS qty,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)  AS cents,
             CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)       AS d100,
             CAST(floor(l_tax * 100.0 + 0.5) AS BIGINT)            AS t100
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    )
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(qty) AS DOUBLE), 2)                    AS sum_qty,
           ROUND(SUM(cents) / 100.0, 2)                          AS sum_base_price,
           ROUND(SUM(cents * (100 - d100)) / 10000.0, 2)         AS sum_disc_price,
           ROUND(SUM(cents * (100 - d100) * (100 + t100)) / 1000000.0, 2)
                                                                 AS sum_charge,
           ROUND(CAST(SUM(qty) AS DOUBLE) / COUNT(*), 4)         AS avg_qty,
           ROUND(SUM(cents) / 100.0 / COUNT(*), 4)               AS avg_price,
           ROUND(SUM(d100) / 100.0 / COUNT(*), 4)                AS avg_disc,
           CAST(COUNT(*) AS BIGINT)                              AS count_order
    FROM l
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: single-scan groupBy with partial aggregation.

    Scale notes: the shipdate predicate reaches the parquet scan
    (PushedFilters) and column pruning keeps the read to 7 columns;
    the aggregation is map-side partial + 4-group final — the shuffle
    moves O(partitions × groups) rows regardless of input size.

    Money sums accumulate as EXACT integer cents (prices carry 2
    decimals, discount/tax are whole percents), divided back once
    post-aggregation — double summation is order-dependent, and a
    half-ulp at a .xx5 rounding boundary flips the 2dp output (it did,
    on the round-5 regenerated sf0.01 fixture). Integer sums are
    summation-order-free, so both engines agree bit-for-bit at any
    SF; per-row scaled terms stay ≤1e11 so bigint holds to ~sf30
    (decimal(38) is the same plan beyond that).
    """
    l = _t(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("bigint")
    d100 = F.floor(F.col("l_discount") * 100.0 + 0.5).cast("bigint")
    t100 = F.floor(F.col("l_tax") * 100.0 + 0.5).cast("bigint")
    qty = F.col("l_quantity").cast("bigint")
    cnt = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .select(
            "l_returnflag", "l_linestatus",
            qty.alias("qty"), cents.alias("cents"),
            d100.alias("d100"), t100.alias("t100"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("qty").cast("double"), 2).alias("sum_qty"),
            F.round(F.sum("cents") / 100.0, 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("cents") * (100 - F.col("d100"))) / 10000.0, 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("cents")
                    * (100 - F.col("d100"))
                    * (100 + F.col("t100"))
                ) / 1000000.0, 2
            ).alias("sum_charge"),
            F.round(F.sum("qty").cast("double") / cnt, 4).alias("avg_qty"),
            F.round(F.sum("cents") / 100.0 / cnt, 4).alias("avg_price"),
            F.round(F.sum("d100") / 100.0 / cnt, 4).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           STRFTIME(o_orderdate, '%Y-%m-%d')                 AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped-orders revenue top-10: selective join + top-k.

    Scale notes: customer is the small side after the segment filter →
    broadcast hint; lineitem never shuffles for the customer join. The
    final top-10 is TakeOrderedAndProject (per-partition top-k + driver
    merge), not a global sort.
    """
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    joined = l.join(
        F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_region_volume",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table star join: every dimension side broadcast.

    Scale notes: region/nation/supplier/customer are dimensions —
    broadcast them all so the only large-table work is one scan of
    lineitem (+ orders pre-filtered by date). No lineitem shuffle
    until the 5-nation aggregate, which is partial-agg tiny.
    """
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")

    dim = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    big = l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    joined = big.join(
        F.broadcast(dim),
        (big.l_suppkey == dim.s_suppkey) & (big.c_nationkey == dim.s_nationkey),
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# ===========================================================================
# Reference search semantics (SURVEY §2 O1-O10) on the events table
# ===========================================================================


@query(
    "events_visibility",
    oracle="""
    SELECT event_id, user_id, event_type,
           EPOCH_US(ts) AS ts_us, ROUND(value, 2) AS value
    FROM events
    WHERE event_type = 'view' OR user_id = 7
    """,
)
def events_visibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 row-level visibility: published ∨ owned-by-caller.

    Bound to the events table: 'view' plays the published findability
    value, user_id the owner field, caller userid=7
    (reference: metastore/models.py:58-79).
    """
    e = _t(spark, sf_dir, "events")
    pred = visibility_predicate(
        "event_type", "user_id", userid=7, published_value="view"
    )
    return e.filter(pred).select(
        "event_id",
        "user_id",
        "event_type",
        _ts_us(),
        F.round("value", 2).alias("value"),
    )


@query(
    "events_term_filters",
    oracle="""
    SELECT event_id, user_id, event_type, EPOCH_US(ts) AS ts_us
    FROM events
    WHERE event_type IN ('click', 'purchase') AND user_id = 3
    """,
)
def events_term_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 residual-param filters: AND across fields, OR within a list.

    Parsed through the JSON-typed wire contract
    (metastore/models.py:97-105): event_type has two OR'd values,
    user_id is numeric.
    """
    spec = parse_params({"event_type": ['"click"', '"purchase"'], "user_id": "3"})
    e = _t(spark, sf_dir, "events")
    return apply_filters(e, spec.filters, mode="term").select(
        "event_id", "user_id", "event_type", _ts_us()
    )


@query(
    "events_sort_page",
    oracle="""
    SELECT event_id, EPOCH_US(ts) AS ts_us, event_type, ROUND(value, 2) AS value
    FROM events
    ORDER BY ts DESC, event_id
    LIMIT 50 OFFSET 100
    """,
)
def events_sort_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7+O8 timestamp sort + limit/offset pagination.

    Compiles to per-partition top-(offset+limit) + driver merge — the
    same shard-fetch-merge shape ES uses; never a full sort.
    (reference: metastore/models.py:82-85,122-142)
    """
    e = _t(spark, sf_dir, "events")
    page = paginate(
        e, [F.col("ts").desc(), F.col("event_id").asc()], offset=100, limit=50
    )
    return page.select(
        "event_id",
        _ts_us(),
        "event_type",
        F.round("value", 2).alias("value"),
    )


@query(
    "events_envelope_summary",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS total,
           ROUND(SUM(value), 2)     AS total_value
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def events_envelope_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9+O10 envelope aggregates: corpus-wide count + sum in one job.

    The reference attaches hits.total + sum(datahub.stats.bytes) to
    every response (metastore/models.py:116-117,152-153).
    """
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return e.agg(
        F.count(F.lit(1)).alias("total"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "events_json_field",
    oracle="""
    SELECT event_id,
           CAST(REGEXP_EXTRACT(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS prop_k
    FROM events
    WHERE CAST(REGEXP_EXTRACT(props, '"k":\\s*(\\d+)', 1) AS BIGINT) >= 90
    """,
)
def events_json_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 nested-field predicate on a dynamic JSON payload column.

    The reference filters dotted paths into nested docs
    (tests/test_controllers.py:347-352); events.props is the driver's
    dynamic payload analog.
    """
    e = _t(spark, sf_dir, "events")
    prop_k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("bigint")
    return (
        e.select("event_id", prop_k.alias("prop_k"))
        .filter(F.col("prop_k") >= 90)
    )
