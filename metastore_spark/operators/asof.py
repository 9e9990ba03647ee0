"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key group. The workhorse of
feature backfills ("state as of the event") and slowly-changing
lookups in training pipelines.

Spark-first implementation (no per-row Python, no range explosion):

    union the two sides tagged by origin → one window over
    (key ORDER BY ts, origin) → last_value(right payload) IGNORE NULLS
    → keep left rows.

One shuffle on the key, linear in rows — the same shape as
sort-merge ASOF implementations in native engines (and unlike the
naive `left.ts >= right.ts` theta-join, which explodes to O(n·m)
per key before aggregating back down).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row + latest right payload at or
    before its timestamp (NULLs where no prior right row exists).

    ``payload_cols`` are the right-side columns to carry. Ties
    (equal timestamps) resolve to the right row (state visible at
    its own timestamp), matching DuckDB's ``ASOF JOIN ... ON l.ts >=
    r.ts`` semantics.
    """
    lcols = left.columns
    l = left.withColumn("_origin", F.lit(1)).withColumn("_ats", F.col(left_ts))
    # payload travels as ONE struct: last(..., ignorenulls) then picks
    # whole right ROWS atomically. Carrying columns separately would
    # (a) resurrect stale values past a genuinely-NULL newer payload
    # and (b) stitch fields from different right rows.
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ats"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
    ).withColumn("_origin", F.lit(0))

    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    l = l.withColumn(
        "_payload", F.lit(None).cast(r.schema["_payload"].dataType)
    )
    unioned = l.unionByName(r.select(l.columns))

    # right rows sort before left rows at equal timestamps (_origin 0<1),
    # so a left row at t sees a right row at exactly t.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ats").asc(), F.col("_origin").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned.withColumn(
        "_asof_payload", F.last(F.col("_payload"), ignorenulls=True).over(w)
    )
    return out.filter(F.col("_origin") == 1).select(
        *lcols,
        *[
            F.col(f"_asof_payload.{c}").alias(f"{c}{suffix}")
            for c in payload_cols
        ],
    )
