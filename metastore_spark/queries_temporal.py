"""Temporal analytics bindings: pivot, day-over-day windows, and the
binned range join — each DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metastore_spark.operators.rangejoin import range_join_binned
from metastore_spark.queries import query, _t
from metastore_spark.ts import lit_ts, lit_us, ts_us, us_to_ts

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "events_pivot_by_type",
    oracle=f"""
    SELECT user_id,
           {", ".join(
               f"ROUND(COALESCE(SUM(CASE WHEN event_type = '{t}' THEN value END), 0), 2) AS {t}"
               for t in _EVENT_TYPES
           )}
    FROM events
    GROUP BY user_id
    """,
)
def events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user value sums, one column per event type. Spark's
    pivot with an explicit value list compiles to the same single-pass
    conditional aggregation the oracle spells out — no second scan to
    discover pivot values."""
    e = _t(spark, sf_dir, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.sum("value"))
    )
    return out.select(
        "user_id",
        *[F.round(F.coalesce(F.col(t), F.lit(0.0)), 2).alias(t) for t in _EVENT_TYPES],
    )


@query(
    "events_daily_delta",
    oracle="""
    WITH daily AS (
      SELECT STRFTIME(date_trunc('day', ts), '%Y-%m-%d') AS day,
             SUM(value) AS revenue
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    )
    SELECT day,
           ROUND(revenue, 2) AS revenue,
           ROUND(revenue - LAG(revenue) OVER (ORDER BY day), 2) + 0.0 AS dod_delta
    FROM daily
    """,
)
def events_daily_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate → window chaining: daily purchase revenue with
    day-over-day delta. The window runs over the (tiny) aggregate —
    an unpartitioned ORDER BY over days, never over raw events."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = e.groupBy(
        F.date_format(
            F.col("ts"), "yyyy-MM-dd"
        ).alias("day")
    ).agg(F.sum("value").alias("revenue"))
    w = Window.partitionBy().orderBy("day")
    return daily.select(
        "day",
        F.round("revenue", 2).alias("revenue"),
        (
            F.round(F.col("revenue") - F.lag("revenue").over(w), 2)
            + F.lit(0.0)
        ).alias("dod_delta"),
    )


@query(
    "events_range_join_promos",
    oracle="""
    WITH promos AS (
      SELECT 'p1' AS promo_id,
             TIMESTAMP '2024-01-05 00:00:00' AS p_start, TIMESTAMP '2024-01-08 00:00:00' AS p_end
      UNION ALL SELECT 'p2', TIMESTAMP '2024-01-10 12:00:00', TIMESTAMP '2024-01-11 00:00:00'
      UNION ALL SELECT 'p3', TIMESTAMP '2024-01-20 00:00:00', TIMESTAMP '2024-01-27 00:00:00'
    )
    SELECT promo_id,
           CAST(COUNT(*) AS BIGINT)  AS n_purchases,
           ROUND(SUM(value), 2)      AS revenue
    FROM events JOIN promos
      ON ts >= p_start AND ts < p_end
    WHERE event_type = 'purchase'
    GROUP BY promo_id
    ORDER BY promo_id
    """,
)
def events_range_join_promos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via binning: purchases attributed to overlapping
    promo windows. The bin equi-join replaces the O(P×I) nested loop
    the naive range predicate would plan (see operators/rangejoin.py).
    Timestamps compare as epoch micros; bins are 1-day wide."""
    day_us = 24 * 3600 * 10**6
    promos = spark.createDataFrame(
        [
            ("p1", lit_us("2024-01-05 00:00:00"), lit_us("2024-01-08 00:00:00")),
            ("p2", lit_us("2024-01-10 12:00:00"), lit_us("2024-01-11 00:00:00")),
            ("p3", lit_us("2024-01-20 00:00:00"), lit_us("2024-01-27 00:00:00")),
        ],
        "promo_id string, p_start bigint, p_end bigint",
    )
    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .withColumn("ts", ts_us("ts"))
    )
    joined = range_join_binned(e, promos, "ts", "p_start", "p_end", day_us)
    return (
        joined.groupBy("promo_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("revenue"),
        )
        .orderBy("promo_id")
    )


@query(
    "events_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(epoch_us(ts)) AS t_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_view
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'view' AND epoch_us(e.ts) > s1.t_signup
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t_view
      GROUP BY e.user_id
    )
    SELECT step, n_users FROM (
      SELECT 1 AS ord, 'signup' AS step,
             CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
      UNION ALL
      SELECT 2, 'view_after_signup', CAST(COUNT(*) AS BIGINT) FROM s2
      UNION ALL
      SELECT 3, 'purchase_after_view', CAST(COUNT(*) AS BIGINT) FROM s3
    ) ORDER BY ord
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chronological conversion funnel signup → view → purchase: each
    step counts users whose step event strictly FOLLOWS their previous
    step's first occurrence (not mere event presence — ordering is the
    point of a funnel).

    Shape: one filtered min-aggregate per step + an equi-join of the
    (shrinking) qualified-user frame — never a sort of the event
    stream; each step's exchange carries one row per surviving user.
    No broadcast hint: per-user frames are corpus-cardinality, so AQE
    decides (broadcast when small, shuffle join at billion-user
    scale). s1/s2 are cached — each feeds both its own count branch
    and the next step's join. All timestamps compare at MICROsecond
    granularity (`ts_us`) on both engines — events.ts is canonical
    TIMESTAMP_NTZ (metastore_spark.ts) and DuckDB's epoch_us is the
    identical wall-clock arithmetic."""
    e = _t(spark, sf_dir, "events")
    us = ts_us("ts")
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(us).alias("t_signup"))
        .cache()
    )
    s2 = (
        e.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(us > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min(us).alias("t_view"))
        .cache()
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(us > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min(us).alias("t_purchase"))
    )
    counts = [
        s1.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(1).alias("ord"), F.lit("signup").alias("step"), "n_users"
        ),
        s2.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(2).alias("ord"),
            F.lit("view_after_signup").alias("step"),
            "n_users",
        ),
        s3.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(3).alias("ord"),
            F.lit("purchase_after_view").alias("step"),
            "n_users",
        ),
    ]
    out = counts[0].unionByName(counts[1]).unionByName(counts[2])
    return out.orderBy("ord").select("step", "n_users")


@query(
    "events_retention_cohorts",
    oracle="""
    WITH signup AS (
      SELECT user_id,
             date_trunc('week', MIN(ts)) AS cohort_week
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week
      FROM events
    )
    SELECT STRFTIME(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', cohort_week, act_week) // 7 AS BIGINT)
             AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM signup s JOIN activity a ON s.user_id = a.user_id
    WHERE act_week >= cohort_week
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention grid: users bucketed by first-signup
    week, counted distinct in each subsequent activity week. The
    classic product-analytics matrix — a first-touch aggregate joined
    against deduplicated (user, week) activity; exchanges carry one
    row per user resp. per (user, week), never the event stream.
    Weeks truncate from MICROsecond timestamps on both engines
    (events.ts is canonical TIMESTAMP_NTZ on both engines)."""
    e = _t(spark, sf_dir, "events")
    ts = F.col("ts")
    signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min(ts)).alias("cohort_week"))
    )
    activity = e.select(
        "user_id", F.date_trunc("week", ts).alias("act_week")
    ).distinct()
    return (
        activity.join(signup, "user_id")
        .filter(F.col("act_week") >= F.col("cohort_week"))
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(
                F.datediff(F.col("act_week"), F.col("cohort_week")) / 7
            ).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "events_rolling_7d_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '1970-01-01',
                            CAST(date_trunc('day', ts) AS DATE)) AS BIGINT)
               AS day_num,
             STRFTIME(date_trunc('day', ts), '%Y-%m-%d') AS day,
             SUM(value) AS revenue
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT day,
           ROUND(revenue, 2) AS revenue,
           ROUND(SUM(revenue) OVER (
             ORDER BY day_num
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ), 2) AS rolling_7d
    FROM daily
    ORDER BY day
    """,
)
def events_rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day revenue via a RANGE window frame keyed on the
    epoch-day number — RANGE (value-based) frames handle calendar gaps
    correctly where a ROWS frame would silently span them. The window
    runs over the daily aggregate (one row per day), never the event
    stream."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    day_ts = F.date_trunc("day", F.col("ts"))
    daily = e.groupBy(
        F.datediff(day_ts.cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("day_num"),
        F.date_format(day_ts, "yyyy-MM-dd").alias("day"),
    ).agg(F.sum("value").alias("revenue"))
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return daily.select(
        "day",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.sum("revenue").over(w), 2).alias("rolling_7d"),
    ).orderBy("day")


@query(
    "events_keyset_page",
    oracle="""
    WITH cursor AS (
      -- the keyset cursor: last row of page 2 (rows 100-149 of the
      -- ts DESC, event_id ASC order) — what a client would echo back
      SELECT epoch_us(ts) AS c_ts, event_id AS c_id
      FROM events ORDER BY ts DESC, event_id LIMIT 1 OFFSET 149
    )
    SELECT event_id, epoch_us(ts) AS ts_us, event_type,
           ROUND(value, 2) AS value
    FROM events, cursor
    WHERE epoch_us(ts) < c_ts
       OR (epoch_us(ts) = c_ts AND event_id > c_id)
    ORDER BY ts_us DESC, event_id
    LIMIT 50
    """,
)
def events_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (cursor) pagination — the deep-paging fix SCALE.md
    prescribes: instead of OFFSET n (whose per-task top-(n+limit)
    buffers grow with depth), the client echoes the last row's sort
    key and the next page is a pushdown-able FILTER + top-50. The
    cursor tuple predicate ((ts, id) strictly after the cursor in
    sort order) keeps pages exact across duplicate timestamps.
    Identical to page 3 of the OFFSET query — which is what the
    oracle computes the cursor from.

    The cursor is COLLECTED (one row — parameter-sized, like every
    scalar subquery in this repo) and inlined as literals rather than
    broadcast-joined: with a join, the page predicate references the
    broadcast side and can never reach the parquet scan
    (``PushedFilters: []``); as literals on the RAW ``ts`` column it
    pushes down, and row groups entirely after the cursor are skipped
    by min/max stats — the difference between re-scanning the corpus
    per page and touching only the page's neighborhood."""
    from metastore_spark.ts import us_to_ts

    e = _t(spark, sf_dir, "events")
    us = ts_us("ts")
    cur_rows = (
        e.select(us.alias("c_ts"), F.col("event_id").alias("c_id"))
        .orderBy(F.desc("c_ts"), F.asc("c_id"))
        .offset(149)
        .limit(1)
        .collect()
    )
    if not cur_rows:
        # corpus smaller than the cursor offset → empty page, same as
        # the pre-literal implementation's graceful degradation
        return e.select(
            "event_id", us.alias("ts_us"), "event_type",
            F.round("value", 2).alias("value"),
        ).limit(0)
    cur = cur_rows[0]
    c_ts_lit = us_to_ts(str(int(cur["c_ts"])))  # SQL-inlined integer literal
    after_cursor = (F.col("ts") < c_ts_lit) | (
        (F.col("ts") == c_ts_lit) & (F.col("event_id") > F.lit(cur["c_id"]))
    )
    return (
        e.filter(after_cursor)
        .select(
            "event_id", us.alias("ts_us"), "event_type",
            F.round("value", 2).alias("value"),
        )
        .orderBy(F.desc("ts_us"), F.asc("event_id"))
        .limit(50)
    )


@query(
    "events_gapfill_daily",
    oracle="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day, SUM(value) AS revenue
      FROM events WHERE user_id % 7 = 0
      GROUP BY 1, 2
    ),
    b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
    cal AS (
      SELECT lo + INTERVAL (r.range) DAY AS day
      FROM b CROSS JOIN range(0, 36600) r
      WHERE lo + INTERVAL (r.range) DAY <= hi
    ),
    grid AS (
      SELECT u.user_id, c.day
      FROM (SELECT DISTINCT user_id FROM daily) u CROSS JOIN cal c
    )
    SELECT g.user_id,
           STRFTIME(g.day, '%Y-%m-%d') AS day,
           ROUND(COALESCE(last_value(d.revenue IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0), 2)
             AS revenue_ff,
           d.revenue IS NULL AS is_gap
    FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    """,
)
def events_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densify + forward fill: per-user daily revenue on a
    dense calendar, gaps carried forward (0 before first observation).

    Scale shape: the raw scan reduces to a per-(user, day) aggregate
    first; the dense calendar is sequence() over a 1-row global
    min/max aggregate (broadcast), so the grid is |users| x |days| --
    the output's own size, never a blowup of the input. The
    forward-fill window partitions by user_id, so no global sort and
    state per task is one user's day series.

    Reads through the date-partitioned layout (layout.events_partitioned
    probe, flat-parquet fallback) — result identical either way, but
    the partitioned path is what CORRECTNESS exercises (SCALE.md
    'Scan & filter').
    """
    from metastore_spark import layout

    e, _ = layout.events_partitioned(spark, sf_dir)
    e = e.filter(F.col("user_id") % 7 == 0)
    daily = e.groupBy(
        "user_id",
        F.to_date(F.col("ts")).alias("day"),
    ).agg(F.sum("value").alias("revenue"))
    daily = daily.persist()
    span = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    cal = span.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    grid = daily.select("user_id").distinct().crossJoin(F.broadcast(cal))
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = grid.join(daily, ["user_id", "day"], "left")
    return joined.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(
            F.coalesce(F.last("revenue", ignorenulls=True).over(w), F.lit(0.0)), 2
        ).alias("revenue_ff"),
        F.col("revenue").isNull().alias("is_gap"),
    )


@query(
    "events_scd2_intervals",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type AS state, epoch_us(ts) AS ts_us, event_id,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS prev_state
      FROM events
    ),
    changes AS (
      SELECT user_id, state, ts_us, event_id FROM ordered
      WHERE prev_state IS NULL OR prev_state <> state
    )
    SELECT user_id, state,
           ts_us AS valid_from,
           LEAD(ts_us) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
           ) AS valid_to,
           LEAD(ts_us) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
           ) IS NULL AS is_current
    FROM changes
    """,
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 interval derivation from an append-only change log:
    collapse consecutive duplicate states per user, emit
    [valid_from, valid_to) validity intervals with an is_current flag
    on the open interval.

    Two windows, both partitioned by user_id (the natural change-log
    key), ordered by (ts, event_id) so equal-timestamp changes are
    deterministic. One shuffle on user_id serves both window passes --
    Spark reuses the child ordering for the second window, and the
    filter between them runs map-side. No global sort anywhere.
    """
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ordered = e.select(
        "user_id",
        F.col("event_type").alias("state"),
        ts_us("ts").alias("ts_us"),
        "event_id",
    ).withColumn("prev_state", F.lag("state").over(w))
    changes = ordered.filter(
        F.col("prev_state").isNull() | (F.col("prev_state") != F.col("state"))
    )
    return changes.select(
        "user_id",
        "state",
        F.col("ts_us").alias("valid_from"),
        F.lead("ts_us").over(w).alias("valid_to"),
        F.lead("ts_us").over(w).isNull().alias("is_current"),
    )


@query(
    "events_cdc_latest_state",
    oracle="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_type,
           ROUND(value, 2) AS last_value, ts_us AS last_ts_us
    FROM (
      SELECT user_id, event_id, event_type, value, EPOCH_US(ts) AS ts_us,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY EPOCH_US(ts) DESC, event_id DESC
             ) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def events_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction: latest-wins current state per key (the
    MERGE/upsert read path — replaying an append-only change log into
    a snapshot).

    Implemented with max_by over a (ts, event_id) ordering struct
    instead of the ROW_NUMBER window the oracle spells out: max_by is
    a commutative aggregate, so Spark combines partial winners
    map-side and shuffles ONE candidate row per key per partition —
    no per-key sort, no full-row shuffle. At 100 TB that's the
    difference between exchanging the log and exchanging the
    (much smaller) key space. Tiebreak on event_id keeps
    equal-timestamp updates deterministic across both plans.
    """
    e = _t(spark, sf_dir, "events")
    ordkey = F.struct(
        ts_us("ts").alias("ts_us"), F.col("event_id")
    )
    payload = F.struct(
        F.col("event_id"),
        F.col("event_type"),
        F.col("value"),
        ts_us("ts").alias("ts_us"),
    )
    latest = e.groupBy("user_id").agg(
        F.max_by(payload, ordkey).alias("s")
    )
    return latest.select(
        "user_id",
        F.col("s.event_id").alias("last_event_id"),
        F.col("s.event_type").alias("last_type"),
        F.round(F.col("s.value"), 2).alias("last_value"),
        F.col("s.ts_us").alias("last_ts_us"),
    )


@query(
    "orders_events_reconcile",
    oracle="""
    WITH od AS (
      SELECT STRFTIME(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day,
             SUM(o_totalprice::DECIMAL(18,6)) AS order_rev,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ),
    ed AS (
      SELECT STRFTIME(date_trunc('day', ts), '%Y-%m-%d') AS day,
             SUM(value::DECIMAL(18,6)) AS purchase_val,
             CAST(COUNT(*) AS BIGINT) AS n_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT COALESCE(od.day, ed.day) AS day,
           CAST(ROUND(COALESCE(od.order_rev, 0), 2) AS DOUBLE) AS order_rev,
           COALESCE(od.n_orders, 0) AS n_orders,
           CAST(ROUND(COALESCE(ed.purchase_val, 0), 2) AS DOUBLE) AS purchase_val,
           COALESCE(ed.n_purchases, 0) AS n_purchases,
           od.day IS NULL AS events_only,
           ed.day IS NULL AS orders_only
    FROM od FULL OUTER JOIN ed ON od.day = ed.day
    """,
)
def orders_events_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source reconciliation: FULL OUTER join of daily order
    revenue against daily purchase-event value, flagging days present
    on only one side — the completeness audit a multi-source pipeline
    runs before trusting either feed.

    Both sides pre-aggregate to day grain BEFORE the full outer join,
    so the join touches |days| rows, not facts. Money sums use
    DECIMAL(18,6) so the aggregate is exact (associativity-proof)
    before the final double round.
    """
    o = _t(spark, sf_dir, "orders")
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    od = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("order_rev"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    ed = e.groupBy(
        F.date_format(
            F.col("ts"), "yyyy-MM-dd"
        ).alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("purchase_val"),
        F.count(F.lit(1)).alias("n_purchases"),
    )
    od = od.select(
        F.col("day").alias("od_day"), "order_rev", "n_orders"
    )
    ed = ed.select(
        F.col("day").alias("ed_day"), "purchase_val", "n_purchases"
    )
    j = od.join(ed, od.od_day == ed.ed_day, "full_outer")
    zero = F.lit(0).cast("decimal(18,6)")
    # Round in the exact DECIMAL domain, then cast (oracle-portability:
    # double-then-round drifts across engines at ties).
    return j.select(
        F.coalesce("od_day", "ed_day").alias("day"),
        F.round(F.coalesce("order_rev", zero), 2).cast("double").alias(
            "order_rev"
        ),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.round(F.coalesce("purchase_val", zero), 2).cast("double").alias(
            "purchase_val"
        ),
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        F.col("od_day").isNull().alias("events_only"),
        F.col("ed_day").isNull().alias("orders_only"),
    )


@query(
    "events_multires_rollup",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             SUM(value::DECIMAL(18,6)) AS total_value
      FROM events GROUP BY 1
    )
    SELECT 'hour' AS level, EPOCH_US(bucket) AS bucket_start_us,
           n_events, CAST(ROUND(total_value, 2) AS DOUBLE) AS total_value
    FROM hourly
    UNION ALL
    SELECT 'day', EPOCH_US(date_trunc('day', bucket)),
           SUM(n_events), CAST(ROUND(SUM(total_value), 2) AS DOUBLE)
    FROM hourly GROUP BY 2
    UNION ALL
    SELECT 'month', EPOCH_US(date_trunc('month', bucket)),
           SUM(n_events), CAST(ROUND(SUM(total_value), 2) AS DOUBLE)
    FROM hourly GROUP BY 2
    """,
)
def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution time rollup (continuous-aggregate pattern):
    hour, day, and month grains from ONE fact scan — the day level
    aggregates the hourly partials and the month level the same, so
    the fact table is read once and coarser grains cost only
    |hourly| rows each. Counts stay bigint; value sums ride as
    DECIMAL(18,6) through the hierarchy (exact under re-association)
    and round to double only at the output edge.

    Reads through the date-partitioned layout (probe + fallback, see
    events_gapfill_daily).
    """
    from metastore_spark import layout

    e, _ = layout.events_partitioned(spark, sf_dir)
    hourly = (
        e.groupBy(
            F.date_trunc(
                "hour", F.col("ts")
            ).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total_value"),
        )
        .persist()
    )

    def _grain(df: DataFrame, level: str, trunc: str | None) -> DataFrame:
        if trunc is None:
            g = df
        else:
            g = (
                df.groupBy(F.date_trunc(trunc, F.col("bucket")).alias("b"))
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("total_value").alias("total_value"),
                )
                .withColumnRenamed("b", "bucket")
            )
        return g.select(
            F.lit(level).alias("level"),
            F.unix_micros("bucket").alias("bucket_start_us"),
            F.col("n_events").cast("long").alias("n_events"),
            # Round in the exact DECIMAL domain, THEN cast: rounding
            # after the double cast left the result at the mercy of
            # engine-specific double tie-breaking (Spark HALF_UP on
            # the shortest rendering vs DuckDB's C round) — the same
            # drift class events_integrity_checksum hit in r11.
            F.round(F.col("total_value"), 2).cast("double").alias(
                "total_value"
            ),
        )

    return (
        _grain(hourly, "hour", None)
        .unionAll(_grain(hourly, "day", "day"))
        .unionAll(_grain(hourly, "month", "month"))
    )


@query(
    "events_ohlc_daily",
    oracle="""
    SELECT event_type,
           STRFTIME(date_trunc('day', ts), '%Y-%m-%d') AS day,
           ROUND(FIRST(value ORDER BY ts, event_id), 2) AS open,
           ROUND(MAX(value), 2)  AS high,
           ROUND(MIN(value), 2)  AS low,
           ROUND(LAST(value ORDER BY ts, event_id), 2)  AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def events_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars: per (event_type, day), open/high/low/close of the
    value series — the downsampling shape time-series stores serve.

    min_by/max_by on a (ts, event_id) ordering struct give open/close
    as commutative partial aggregates — one shuffle of one candidate
    row per group per partition, no per-group sort. The oracle's
    ordered-aggregate FIRST/LAST is the window formulation of the
    same contract; the (ts, event_id) tiebreak makes both
    deterministic.
    """
    e = _t(spark, sf_dir, "events")
    ordkey = F.struct(
        ts_us("ts").alias("ts_us"), F.col("event_id")
    )
    return (
        e.groupBy(
            "event_type",
            F.date_format(
                F.col("ts"), "yyyy-MM-dd"
            ).alias("day"),
        )
        .agg(
            F.round(F.min_by("value", ordkey), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", ordkey), 2).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "events_day_range_pruned",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2)     AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts <  TIMESTAMP '2024-01-09 00:00:00'
    GROUP BY event_type
    """,
)
def events_day_range_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range rollup through the partitioned layout: the
    event_date predicate is a PARTITION filter (directory pruning —
    the scan never opens a row group outside the four requested
    days), with the exact ts bounds as the residual predicate. On the
    flat-parquet fallback the same ts predicate still row-group-prunes
    via parquet min/max stats; the result is identical, the layout
    only changes how much the scan reads. tests/test_layout.py pins
    the PartitionFilters plan shape; this query pins the values.
    """
    from metastore_spark import layout

    e, partitioned = layout.events_partitioned(spark, sf_dir)
    if partitioned:
        # partition filter first: prunes directories before any IO
        e = e.filter(
            (F.col("event_date") >= "2024-01-05")
            & (F.col("event_date") <= "2024-01-08")
        )
    lo, hi = lit_ts("2024-01-05 00:00:00"), lit_ts("2024-01-09 00:00:00")
    return (
        e.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "events_sliding_rate",
    oracle="""
    WITH e AS (
      SELECT epoch_us(ts) AS t, event_type, value FROM events
    ),
    w AS (
      SELECT (t // 900000000) * 900000000 - r.range * 900000000 AS ws,
             event_type, value
      FROM e CROSS JOIN range(4) r
    )
    SELECT ws AS window_start_us, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2)     AS total_value
    FROM w GROUP BY 1, 2
    """,
)
def events_sliding_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOPPING-window rate rollup: 1-hour windows sliding every 15
    minutes (each event lands in 4 overlapping windows) — the
    rate-monitoring / sliding-SLA window type, complementing the
    tumbling (events_stream_hourly) and session
    (events_stream_sessionize) window families. F.window's hop
    assignment is epoch-aligned integer arithmetic on the event-time
    micros, which the oracle states directly (grid(t) - j*15min,
    j=0..3). The 4x row expansion happens inside the aggregate's
    map side — the exchange carries only (windows x types) partials."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("win"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.expr(
                "timestampdiff(MICROSECOND,"
                " timestamp_ntz'1970-01-01 00:00:00', win.start)"
            ).alias("window_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "events_rolling_zscore",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events
    ),
    stats AS (
      SELECT event_id, user_id, ts_us, value,
             COUNT(*)    OVER w AS n_prev,
             AVG(value)  OVER w AS mu,
             STDDEV_SAMP(value) OVER w AS sd
      FROM e
      WINDOW w AS (
        PARTITION BY user_id ORDER BY ts_us, event_id
        ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING
      )
    )
    SELECT event_id, user_id, ts_us, value,
           ROUND((value - mu) / sd, 4) + 0.0 AS zscore
    FROM stats
    WHERE n_prev >= 5 AND sd > 0
      AND ABS(ROUND((value - mu) / sd, 4)) >= 2.5
    """,
)
def events_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling z-score anomaly detection: each event scored
    against the mean/stddev of its own user's previous <=10 events,
    flagged when |z| >= 2.5 — the standard streaming-metrics outlier
    gate, expressed as a bounded-frame window (no unbounded state).

    Scale: one shuffle keyed by user_id; the frame is ROWS-bounded so
    the window operator holds 10 rows per user, not the history. The
    threshold compares the ROUNDED z on both engines — a float-last-bit
    disagreement at the gate would otherwise flip membership. The
    `+ 0.0` canonicalizes -0.0 (repo convention for signed rounds).
    Ties in event time are broken by event_id so the frame is
    deterministic under any partitioning."""
    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", ts_us("ts").alias("ts_us"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-10, -1)
    )
    stats = e.select(
        "event_id",
        "user_id",
        "ts_us",
        "value",
        F.count(F.lit(1)).over(w).alias("n_prev"),
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sd"), 4)
    return (
        stats.filter((F.col("n_prev") >= 5) & (F.col("sd") > 0))
        .filter(F.abs(z) >= 2.5)
        .select(
            "event_id",
            "user_id",
            "ts_us",
            "value",
            (z + F.lit(0.0)).alias("zscore"),
        )
    )


@query(
    "events_zorder_box_pruned",
    oracle="""
    WITH d AS (
      SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
             ROUND(value, 2) AS value,
             epoch_us(ts) // 86400000000 AS aday
      FROM events
    ),
    b AS (SELECT MIN(aday) AS d0 FROM d)
    SELECT event_id, ts_us, user_id, event_type, value
    FROM d, b
    WHERE user_id BETWEEN 100 AND 300
      AND (aday - d0) BETWEEN 10 AND 20
    """,
)
def events_zorder_box_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional pruning via a Z-ORDERED layout — the Delta
    OPTIMIZE ZORDER idea as a first-class operator: events are stored
    partitioned by an 8-bit Morton cell interleaving the top bits of
    (user_id, day), so a rectangle predicate on BOTH dimensions
    becomes directory pruning (neither dim alone could prune a layout
    partitioned on the other). The query decomposes its box into the
    exact intersecting cell set driver-side (parameter-sized,
    layout.zcells_for_box) and pushes `zcell IN (...)` — asserted as
    PartitionFilters in tests/test_layout.py — plus the residual
    exact-range filters. Bit widths derive from corpus stats
    (layout.zorder_shifts), so build and probe agree by construction.
    At 100 TB: a per-user time-slice query touches
    |user cells| × |day cells| directories instead of the corpus."""
    import os

    from metastore_spark import layout, serve
    from metastore_spark.ts import ts_us

    e = _t(spark, sf_dir, "events")
    us = ts_us("ts")
    day_us = F.lit(86400000000)
    aday_expr = ((us - F.pmod(us, day_us)) / day_us).cast("bigint")
    # corpus stats for the bit widths — one parameter-sized agg; build
    # and probe recompute identically from the same source
    stats = e.select(
        F.min(aday_expr).alias("d0"),
        F.max(aday_expr).alias("d1"),
        F.max("user_id").alias("u1"),
    ).collect()[0]
    d0, d1, u1 = int(stats["d0"]), int(stats["d1"]), int(stats["u1"])
    u_shift, d_shift = layout.zorder_shifts(u1, d1 - d0)

    def build() -> DataFrame:
        aday = aday_expr
        return e.select(
            "event_id",
            us.alias("ts_us"),
            "user_id",
            "event_type",
            F.round("value", 2).alias("value"),
            (aday - F.lit(d0)).alias("rel_day"),
        ).withColumn(
            "zcell",
            layout.zorder_cell(
                F.col("user_id"), F.col("rel_day"), u_shift, d_shift
            ),
        )

    store = serve.materialized(
        spark,
        [os.path.join(sf_dir, "events.parquet")],
        "zbox8",
        build,
        partition_by=["zcell"],
    )
    cells = layout.zcells_for_box(100, 300, 10, 20, u_shift, d_shift)
    return (
        store.filter(F.col("zcell").isin(cells))
        .filter(F.col("user_id").between(100, 300))
        .filter(F.col("rel_day").between(10, 20))
        .select("event_id", "ts_us", "user_id", "event_type", "value")
    )


@query(
    "events_attribution_last_touch",
    oracle="""
    WITH ev AS (
      SELECT event_id, epoch_us(ts) AS us, user_id, event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events
      WHERE event_type IN ('click', 'view', 'purchase')
    ),
    seq AS (
      SELECT event_id, us, event_type, cents,
             last_value(CASE WHEN event_type <> 'purchase' THEN us END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS touch_us,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS touch_type
      FROM ev
    )
    SELECT COALESCE(CASE WHEN touch_us >= us - 604800000000
                         THEN touch_type END, 'none') AS channel,
           CAST(COUNT(*) AS BIGINT)                   AS n_purchases,
           ROUND(SUM(cents) / 100.0, 2)               AS attributed_value
    FROM seq
    WHERE event_type = 'purchase'
    GROUP BY 1
    ORDER BY 1
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: every purchase credits the user's most
    recent preceding click or view within a 7-day lookback ('none'
    when the trail is cold) — the last-touch model every growth team
    starts with, as one carry-forward window pass.

    Shape: ONE shuffle (partitionBy user_id), then a running
    ignorenulls `last` over (ts, event_id) carries the latest touch
    onto each purchase row — no self-join, no per-purchase probe.
    Revenue accumulates as exact integer cents (summation-order-
    independent — the q11 lesson); the lookback compares epoch
    micros, timezone-proof. Purchases at the exact timestamp of a
    touch attribute deterministically via the event_id tie-break.
    At 100 TB the user partition is the natural key: the window
    never crosses users, so the pass scales with the per-user
    history, not the corpus."""
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view", "purchase"))
        .select(
            "event_id",
            ts_us("ts").alias("us"),
            "user_id",
            "event_type",
            F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("cents"),
        )
    )
    from metastore_spark.operators.attribution import last_touch_channels

    return last_touch_channels(ev)


@query(
    "nation_revenue_ses_forecast",
    oracle="""
    WITH mrev AS (
      SELECT n_name, date_trunc('month', o_orderdate) AS mon,
             CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    ),
    series AS (
      SELECT n_name,
             CAST(COUNT(*) AS BIGINT) AS n_months,
             list(cents::DOUBLE ORDER BY mon) AS ys
      FROM mrev GROUP BY 1
    )
    SELECT n_name,
           n_months,
           ROUND(ys[length(ys)] / 100.0, 2) AS last_month_revenue,
           ROUND(list_reduce(ys, (acc, x) -> 0.3 * x + 0.7 * acc)
                 / 100.0, 4) AS ses_forecast
    FROM series
    ORDER BY n_name
    """,
)
def nation_revenue_ses_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series forecasting: simple exponential smoothing (α=0.3)
    of each nation's monthly order revenue; the smoothed level after
    the last observed month IS the one-step-ahead forecast — the
    model every demand-planning pipeline starts from (Holt/Winters
    add trend/season terms to the same fold).

    Cross-engine exactness: monthly revenue aggregates as integer
    cents; the smoothing recurrence s_i = α·y_i + (1−α)·s_{i−1} runs
    as a SEQUENTIAL left fold over the month-ordered series on BOTH
    engines (Spark `aggregate` seeded with y_1 over the tail, DuckDB
    `list_reduce`) — bit-identical doubles, no pow() weight whose
    last ulp could differ between libms.

    Scale shape: one shuffle to (nation, month) — partial-agg, output
    |nations|×|months| — then one shuffle to nation with a ≤months
    array per group. The fold is per-series sequential (as any
    recurrence must be); parallelism comes from the series count,
    which is the right axis at 100 TB (forecast millions of SKUs, not
    one series faster)."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_trunc("month", F.col("o_orderdate")).alias("mon"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5)
        .cast("bigint")
        .alias("cents"),
    )
    mrev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name", "mon")
        .agg(F.sum("cents").alias("cents"))
    )
    series = mrev.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_months"),
        F.expr(
            "transform(array_sort(collect_list(struct(mon, cents))),"
            " p -> cast(p.cents as double))"
        ).alias("ys"),
    )
    ses = F.aggregate(
        F.expr("slice(ys, 2, size(ys) - 1)"),
        F.element_at("ys", 1),
        lambda acc, x: F.lit(0.3) * x + F.lit(0.7) * acc,
    )
    return series.select(
        "n_name",
        "n_months",
        F.round(F.element_at("ys", F.size("ys")) / 100.0, 2).alias(
            "last_month_revenue"
        ),
        F.round(ses / 100.0, 4).alias("ses_forecast"),
    ).orderBy("n_name")


@query(
    "events_time_to_convert",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(epoch_us(ts)) AS sus
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS pus
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.sus
      GROUP BY 1
    ),
    d AS (
      SELECT (p.pus - s.sus) / 1000000.0 AS delta_s
      FROM p JOIN s USING (user_id)
    )
    SELECT CAST(COUNT(*) AS BIGINT)              AS n_converted,
           ROUND(quantile_cont(delta_s, 0.5), 4)  AS p50_seconds,
           ROUND(quantile_cont(delta_s, 0.9), 4)  AS p90_seconds,
           ROUND(quantile_cont(delta_s, 0.99), 4) AS p99_seconds
    FROM d
    """,
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel timing: for every user, first signup → first subsequent
    purchase; the latency distribution (p50/p90/p99) is the number a
    growth team actually tracks on top of the conversion count the
    plain funnel gives. Deltas are integer epoch-micros (exact
    MIN-aggregates both sides) scaled once to seconds; percentiles
    are the exact interpolated form (== DuckDB quantile_cont) in ONE
    buffer — at 100 TB swap percentile_approx, same plan. Two
    partial-agg shuffles on user_id + one 1-row rollup."""
    ev = _t(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(ts_us("ts")).alias("sus"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", ts_us("ts").alias("pus"))
        .join(s, "user_id")
        .filter(F.col("pus") >= F.col("sus"))
        .groupBy("user_id")
        .agg(F.min("pus").alias("pus"), F.first("sus").alias("sus"))
    )
    d = p.select(((F.col("pus") - F.col("sus")) / 1000000.0).alias("delta_s"))
    pct = F.expr("percentile(delta_s, array(0.5, 0.9, 0.99))")
    return d.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(pct[0], 4).alias("p50_seconds"),
        F.round(pct[1], 4).alias("p90_seconds"),
        F.round(pct[2], 4).alias("p99_seconds"),
    )


@query(
    "events_forget_user_pruned",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events
    WHERE user_id <> 137
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_forget_user_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end targeted erasure: build the Z-ordered (user, day)
    cell store, run layout.forget_user(137) — which rewrites ONLY the
    cells that user's range intersects (driver-side decomposition,
    per-cell atomic swap; untouched-dir mtimes pytest-asserted in
    tests/test_layout.py) — then aggregate the surviving store. The
    oracle is the semantic contract: the store after erasure must
    equal a full filter of the raw corpus. The store is built in a
    process-private tempdir each run (erasure mutates it, so it must
    not share the serving store other queries read)."""
    import shutil
    import tempfile

    from metastore_spark import layout
    from metastore_spark.ts import ts_us

    e = _t(spark, sf_dir, "events")
    us = ts_us("ts")
    day_us = F.lit(86400000000)
    aday = ((us - F.pmod(us, day_us)) / day_us).cast("bigint")
    stats = e.select(
        F.min(aday).alias("d0"),
        F.max(aday).alias("d1"),
        F.max("user_id").alias("u1"),
    ).collect()[0]
    d0, d1, u1 = int(stats["d0"]), int(stats["d1"]), int(stats["u1"])
    u_shift, d_shift = layout.zorder_shifts(u1, d1 - d0)
    store = tempfile.mkdtemp(prefix="forget_store_")
    try:
        e.select(
            "event_id",
            "user_id",
            "event_type",
            F.floor(F.col("value") * 100.0 + 0.5)
            .cast("bigint")
            .alias("cents"),
            (aday - F.lit(d0)).alias("rel_day"),
        ).withColumn(
            "zcell",
            layout.zorder_cell(
                F.col("user_id"), F.col("rel_day"), u_shift, d_shift
            ),
        ).write.mode("overwrite").partitionBy("zcell").parquet(store)
        layout.forget_user(
            spark, store, 137, u_shift, d_shift, rel_day_max=d1 - d0
        )
        out = (
            spark.read.parquet(store)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("cents").alias("total_cents"),
            )
            .orderBy("event_type")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(store, ignore_errors=True)


@query(
    "events_purchase_prior_state",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type AS state, epoch_us(ts) AS ts_us, event_id,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS prev_state
      FROM events
    ),
    intervals AS (
      SELECT user_id, state,
             ts_us AS valid_from,
             LEAD(ts_us) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
             ) AS valid_to
      FROM ordered
      WHERE prev_state IS NULL OR prev_state <> state
    ),
    purchases AS (
      SELECT user_id, epoch_us(ts) AS ts_us FROM events
      WHERE event_type = 'purchase'
    )
    SELECT i.state AS prior_state,
           CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM purchases p
    JOIN intervals i
      ON p.user_id = i.user_id
     AND i.valid_from <= p.ts_us - 1
     AND (i.valid_to > p.ts_us - 1 OR i.valid_to IS NULL)
    GROUP BY 1
    ORDER BY 1
    """,
)
def events_purchase_prior_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension join — the feature-store correctness
    primitive: each purchase is joined to the SCD2 state interval
    that was valid the MICROSECOND BEFORE it happened (ts−1), so the
    feature can never leak the event it predicts. Composes the SCD2
    derivation with an interval probe: equi-join on user_id with a
    residual [valid_from, valid_to) range predicate — the shuffle key
    is the user, the per-user interval list is change-log-sized, and
    exactly one interval matches each purchase. A purchase that IS
    the user's first event has no prior interval and drops on both
    engines. Output is the prior-state rollup a conversion analysis
    reads."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ordered = e.select(
        "user_id",
        F.col("event_type").alias("state"),
        ts_us("ts").alias("ts_us"),
        "event_id",
    ).withColumn("prev_state", F.lag("state").over(w))
    intervals = (
        ordered.filter(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("state"))
        )
        .select(
            "user_id",
            "state",
            F.col("ts_us").alias("valid_from"),
            F.lead("ts_us").over(w).alias("valid_to"),
        )
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", ts_us("ts").alias("p_us")
    )
    probe = F.col("p_us") - 1
    return (
        purchases.join(
            intervals,
            (purchases.user_id == intervals.user_id)
            & (F.col("valid_from") <= probe)
            & ((F.col("valid_to") > probe) | F.col("valid_to").isNull()),
        )
        .groupBy(F.col("state").alias("prior_state"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .orderBy("prior_state")
    )
