"""Governance / data-quality / drift-monitoring queries.

The operators a production data platform runs BESIDE the analytics:
declarative data-quality expectation suites (the gate a 100 TB ingest
must pass before downstream jobs see the partition), k-anonymity /
l-diversity audits (the privacy counterpart to `layout.forget_user`'s
GDPR erasure), and train/serve distribution-drift monitoring over a
fixed reference window.

Reference parity note: the reference service itself carries no
governance surface (its visibility filter, metastore/models.py:58-79,
is the closest thing — row-level security); these queries extend the
engine the way BASELINE.json's north star asks (pipeline operators a
training-data platform needs), with the same oracle discipline as
every other registry entry.

Cross-engine exactness: counts are bigint; every ratio is a single
final division of exact integers, ROUNDed identically on both sides;
the drift statistic is TOTAL VARIATION DISTANCE computed over a
common integer denominator — deliberately NOT PSI/KL, whose ln() is
libm-dependent in the last ulp (the same reason the SES fold avoids
pow()). TVD = 0.5 * sum_b |pA_b - pB_b| needs only multiplication
and subtraction of counts, so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metastore_spark.queries import _t, query


# ===========================================================================
# Declarative data-quality expectation suite
# ===========================================================================


@query(
    "lineitem_dq_expectations",
    oracle="""
    WITH row_rules AS (
      SELECT
        CAST(COUNT(*) AS BIGINT) AS checked,
        CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                      THEN 1 ELSE 0 END) AS BIGINT)  AS v_qty,
        CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                      THEN 1 ELSE 0 END) AS BIGINT)  AS v_disc,
        CAST(SUM(CASE WHEN l_tax > 0.05 THEN 1 ELSE 0 END)
             AS BIGINT)                              AS v_tax,
        CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                      THEN 1 ELSE 0 END) AS BIGINT)  AS v_flag,
        CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
             AS BIGINT)                              AS v_price,
        CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
             AS BIGINT)                              AS v_ship
      FROM lineitem
    ),
    fk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS checked,
             CAST(COUNT(*) FILTER (WHERE o.o_orderkey IS NULL)
                  AS BIGINT) AS violations
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    pk AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS checked,
             CAST(SUM(cnt - 1) AS BIGINT) AS violations
      FROM (
        SELECT COUNT(*) AS cnt FROM lineitem
        GROUP BY l_orderkey, l_linenumber
      )
    )
    SELECT rule, checked, violations, violations = 0 AS passed
    FROM (
      SELECT 'quantity_in_1_50' AS rule, checked, v_qty AS violations
        FROM row_rules
      UNION ALL
      SELECT 'discount_in_0_010', checked, v_disc FROM row_rules
      UNION ALL
      SELECT 'tax_le_005', checked, v_tax FROM row_rules
      UNION ALL
      SELECT 'returnflag_domain', checked, v_flag FROM row_rules
      UNION ALL
      SELECT 'extendedprice_positive', checked, v_price FROM row_rules
      UNION ALL
      SELECT 'shipdate_not_null', checked, v_ship FROM row_rules
      UNION ALL
      SELECT 'orderkey_fk_orders', checked, violations FROM fk
      UNION ALL
      SELECT 'pk_unique_orderkey_linenumber', checked, violations FROM pk
    )
    ORDER BY rule
    """,
)
def lineitem_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation suite over the lineitem
    ingest: range / domain / not-null rules, referential integrity
    against orders, and primary-key uniqueness — one row per rule with
    checked/violation counts and a pass bit. The gate a production
    pipeline evaluates per partition before publishing it downstream
    (Deequ/Great-Expectations shape, engine-native).

    Scale shape — three jobs regardless of rule count:
    - ALL row-level rules batch into ONE full scan as conditional
      partial aggregates (sum(case)) — adding a 50th rule adds a
      column, not a pass. The scan's exchange carries one row per
      partition.
    - Referential integrity is the one real shuffle: a left anti-ish
      join lineitem⋈orders on orderkey (both fact-scale, the bucketed
      layout in `layout.ensure_bucketed_facts` makes it zero-exchange
      where provisioned; at 100 TB a bloom prefilter cuts the probe).
    - PK uniqueness is a partial-agg groupBy on the key; violations =
      sum(cnt-1) so the exchange carries only group counts.

    The suite exercises the FAILING path with nonzero, value-hash-
    checked violation counts: the tax rule is deliberately tighter
    than the data (fixture max l_tax = 0.08), and the fixture's
    (l_orderkey, l_linenumber) genuinely is not unique — a real
    data-quality finding about the corpus, surfaced by the gate.
    """
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey")

    one = F.lit(1)
    zero = F.lit(0)

    def _viol(cond):
        return F.sum(F.when(cond, one).otherwise(zero)).cast("bigint")

    row_rules = l.agg(
        F.count(one).cast("bigint").alias("checked"),
        _viol((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias(
            "v_qty"
        ),
        _viol((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).alias(
            "v_disc"
        ),
        _viol(F.col("l_tax") > 0.05).alias("v_tax"),
        _viol(~F.col("l_returnflag").isin("A", "N", "R")).alias("v_flag"),
        _viol(F.col("l_extendedprice") <= 0).alias("v_price"),
        _viol(F.col("l_shipdate").isNull()).alias("v_ship"),
    )
    row_long = row_rules.selectExpr(
        """stack(6,
             'quantity_in_1_50', v_qty,
             'discount_in_0_010', v_disc,
             'tax_le_005', v_tax,
             'returnflag_domain', v_flag,
             'extendedprice_positive', v_price,
             'shipdate_not_null', v_ship
           ) as (rule, violations)""",
        "checked",
    ).select("rule", "checked", "violations")

    fk = (
        l.select("l_orderkey")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left")
        .agg(
            F.count(one).cast("bigint").alias("checked"),
            F.sum(F.when(F.col("o_orderkey").isNull(), one).otherwise(zero))
            .cast("bigint")
            .alias("violations"),
        )
        .select(F.lit("orderkey_fk_orders").alias("rule"), "checked", "violations")
    )

    pk = (
        l.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(one).alias("cnt"))
        .agg(
            F.sum("cnt").cast("bigint").alias("checked"),
            F.sum(F.col("cnt") - 1).cast("bigint").alias("violations"),
        )
        .select(
            F.lit("pk_unique_orderkey_linenumber").alias("rule"),
            "checked",
            "violations",
        )
    )

    return (
        row_long.unionByName(fk)
        .unionByName(pk)
        .withColumn("passed", F.col("violations") == 0)
        .orderBy("rule")
    )


# ===========================================================================
# Privacy audit: k-anonymity + l-diversity
# ===========================================================================


@query(
    "events_kanonymity_audit",
    oracle="""
    WITH qi AS (
      SELECT event_type,
             STRFTIME(ts, '%Y-%m-%d') AS day,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) // 5000 AS vbucket,
             user_id
      FROM events
    ),
    classes AS (
      SELECT event_type, day, vbucket,
             CAST(COUNT(*) AS BIGINT) AS class_rows,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS l_div
      FROM qi GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)                       AS n_classes,
           CAST(SUM(CASE WHEN class_rows < 5 THEN 1 ELSE 0 END)
                AS BIGINT)                                AS small_classes,
           CAST(SUM(CASE WHEN class_rows < 5 THEN class_rows ELSE 0 END)
                AS BIGINT)                                AS rows_at_risk,
           ROUND(SUM(CASE WHEN class_rows < 5 THEN class_rows ELSE 0 END)
                 * 1.0 / SUM(class_rows), 4)              AS risk_share,
           CAST(MIN(l_div) AS BIGINT)                     AS min_l_diversity
    FROM classes
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit of the events log under the
    quasi-identifier (event_type, day, value-bucket): per event type,
    how many QI equivalence classes exist, how many are smaller than
    k=5 (re-identifiable), how many rows sit in them, and the minimum
    l-diversity (distinct users per class — a class where every row is
    one user leaks membership even at k rows). The privacy AUDIT side
    of governance; `layout.forget_user` is the erasure side.

    Scale shape: one shuffle to the QI key (partial-agg count +
    distinct-user agg per class), then a partial-agg rollup to
    event_type — the second exchange carries one row per class. At
    100 TB the class count is bounded by the QI domain (types × days
    × 10 buckets), not the row count. The value bucket derives from
    exact integer cents (floor(v*100+0.5) div 5000), so bucket
    membership can't flap on float representation; risk_share is the
    single final division of exact bigints, rounded identically on
    both engines.
    """
    e = _t(spark, sf_dir, "events")
    qi = e.select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.expr("cast(floor(value * 100.0 + 0.5) as bigint) div 5000").alias(
            "vbucket"
        ),
        "user_id",
    )
    classes = qi.groupBy("event_type", "day", "vbucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("class_rows"),
        F.countDistinct("user_id").cast("bigint").alias("l_div"),
    )
    small = F.col("class_rows") < 5
    return (
        classes.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum(F.when(small, 1).otherwise(0))
            .cast("bigint")
            .alias("small_classes"),
            F.sum(F.when(small, F.col("class_rows")).otherwise(0))
            .cast("bigint")
            .alias("rows_at_risk"),
            F.round(
                F.sum(F.when(small, F.col("class_rows")).otherwise(0))
                * 1.0
                / F.sum("class_rows"),
                4,
            ).alias("risk_share"),
            F.min("l_div").cast("bigint").alias("min_l_diversity"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# Distribution drift: total-variation distance vs a reference window
# ===========================================================================


@query(
    "events_distribution_drift",
    oracle="""
    WITH binned AS (
      SELECT event_type,
             LEAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT) // 5000, 9)
               AS bin,
             CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                  THEN 1 ELSE 0 END AS in_ref
      FROM events
    ),
    cnts AS (
      SELECT event_type, bin,
             CAST(SUM(in_ref) AS BIGINT)     AS ca,
             CAST(SUM(1 - in_ref) AS BIGINT) AS cb
      FROM binned GROUP BY 1, 2
    ),
    diffs AS (
      SELECT c.event_type,
             SUM(ABS(c.ca * t.nb - c.cb * t.na)) AS num,
             MAX(ABS(c.ca * t.nb - c.cb * t.na)) AS mx,
             MAX(t.na) AS na, MAX(t.nb) AS nb
      FROM cnts c
      JOIN (SELECT event_type, SUM(ca) AS na, SUM(cb) AS nb
            FROM cnts GROUP BY 1) t USING (event_type)
      GROUP BY c.event_type
    )
    SELECT event_type,
           CAST(na AS BIGINT) AS n_ref,
           CAST(nb AS BIGINT) AS n_live,
           ROUND(num / (2.0 * na * nb), 6) AS tvd,
           ROUND(mx / (1.0 * na * nb), 6)  AS max_bin_shift
    FROM diffs
    ORDER BY event_type
    """,
)
def events_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/serve distribution-drift monitor: per event type, the
    total-variation distance between the value distribution in a fixed
    reference window (before 2024-01-16) and the live window (after),
    over 10 fixed value bins, plus the worst single-bin shift. The
    check a feature platform runs before retraining / alerting.

    TVD instead of PSI/KL — deliberately: TVD = ½·Σ|pA−pB| needs only
    integer multiplication on a common denominator
    (|ca·nb − cb·na| / (na·nb)), so both engines compute the SAME
    integers and divide once at the end — no ln(), whose last ulp is
    libm-dependent (the same cross-engine reasoning as the SES fold's
    pow() avoidance). Bins derive from exact integer cents, so bin
    membership can't flap on float representation.

    Scale shape: one scan with the period flag folded into the
    aggregate (no second pass over the table), one partial-agg shuffle
    to (type, bin) — the exchange carries ≤ types × 10 rows — then a
    broadcast-sized per-type rollup. Integer bound: ca·nb ≤ n²; bigint
    holds to ~3·10⁹ rows per type (decimal(38) is the same plan
    beyond).
    """
    e = _t(spark, sf_dir, "events")
    binned = e.select(
        "event_type",
        F.least(F.expr("cast(floor(value * 100.0 + 0.5) as bigint) div 5000"),
                F.lit(9)).alias("bin"),
        F.when(
            F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("in_ref"),
    )
    from pyspark.sql import Window

    cnts = binned.groupBy("event_type", "bin").agg(
        F.sum("in_ref").cast("bigint").alias("ca"),
        F.sum(1 - F.col("in_ref")).cast("bigint").alias("cb"),
    )
    # per-type totals via a window over cnts — NOT a groupBy+rejoin,
    # which would duplicate the events scan subtree (Catalyst doesn't
    # CSE unpersisted shared frames). cnts is bounded by types×10 rows
    # at any input size, so the window partition is trivially small.
    w = Window.partitionBy("event_type")
    j = cnts.withColumn("na", F.sum("ca").over(w)).withColumn(
        "nb", F.sum("cb").over(w)
    )
    diff = F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
    return (
        j.groupBy("event_type")
        .agg(
            F.max("na").cast("bigint").alias("n_ref"),
            F.max("nb").cast("bigint").alias("n_live"),
            F.round(
                F.sum(diff) / (2.0 * F.max("na") * F.max("nb")), 6
            ).alias("tvd"),
            F.round(
                F.max(diff) / (1.0 * F.max("na") * F.max("nb")), 6
            ).alias("max_bin_shift"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# Approximate query processing: deterministic-sample estimation
# ===========================================================================


def _aqp_oracle() -> str:
    from metastore_spark.queries_dedup import _ph60

    ph = _ph60("event_id::VARCHAR")
    return f"""
    WITH base AS (
      SELECT event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
             CASE WHEN {ph} % 100 < 5 THEN 1 ELSE 0 END AS in_sample
      FROM events
    ),
    agg AS (
      SELECT event_type,
             CAST(SUM(in_sample) AS BIGINT)            AS n_sampled,
             CAST(COUNT(*) AS BIGINT)                  AS n_rows,
             CAST(SUM(in_sample * cents) AS BIGINT)    AS sample_cents,
             CAST(SUM(cents) AS BIGINT)                AS exact_cents
      FROM base GROUP BY event_type
    )
    SELECT event_type, n_sampled, n_rows,
           ROUND(sample_cents * 20 / 100.0, 2) AS estimated_total,
           ROUND(exact_cents / 100.0, 2)       AS exact_total,
           ROUND(ABS(sample_cents * 20 - exact_cents) * 1.0
                 / exact_cents, 4)             AS rel_err
    FROM agg
    ORDER BY event_type
    """


@query("events_sampled_value_estimate", oracle=_aqp_oracle())
def events_sampled_value_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing by deterministic hash-sampling: a
    5% sample of events (portable 60-bit hash of event_id mod 100 —
    membership is a pure function of the row, reproducible on any
    engine and across runs) drives a Horvitz-Thompson estimate of
    per-type total value (inverse inclusion probability, ×20),
    reported BESIDE the exact total and the realized relative error.
    The pattern every interactive-SLA dashboard uses at 100 TB: scan
    the 5% sample table (pre-materialized by the same predicate),
    answer in 1/20th the IO, carry the error bar.

    Both the estimate and the truth come from ONE scan (the sample
    flag folds into conditional partial aggregates — no second pass),
    so the oracle hash-checks estimator and ground truth together.
    Exactness: integer-cents sums, inverse-probability scaling as
    integer ×20, single final divisions rounded on both sides. The
    fixture's realized rel_err lands ≈1-4% per type (n_sampled ≈ 5%
    of each type's rows; SE ≈ sqrt((1-p)/(p·n))) — hash-pinned, so
    any estimator regression is a value diff, not a flaky bound.
    """
    from metastore_spark.dedup.ops import portable_hash60

    e = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
    in_sample = F.when(
        portable_hash60(F.col("event_id").cast("string")) % 100 < 5, 1
    ).otherwise(0)
    base = e.select(
        "event_type",
        cents.alias("cents"),
        in_sample.alias("in_sample"),
    )
    agg = base.groupBy("event_type").agg(
        F.sum("in_sample").cast("bigint").alias("n_sampled"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("in_sample") * F.col("cents"))
        .cast("bigint")
        .alias("sample_cents"),
        F.sum("cents").cast("bigint").alias("exact_cents"),
    )
    return agg.select(
        "event_type",
        "n_sampled",
        "n_rows",
        F.round(F.col("sample_cents") * 20 / 100.0, 2).alias(
            "estimated_total"
        ),
        F.round(F.col("exact_cents") / 100.0, 2).alias("exact_total"),
        F.round(
            F.abs(F.col("sample_cents") * 20 - F.col("exact_cents"))
            * 1.0
            / F.col("exact_cents"),
            4,
        ).alias("rel_err"),
    ).orderBy("event_type")
