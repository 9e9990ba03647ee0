"""Range (interval) join — points against intervals, binned.

Spark has no native range-join optimization (Databricks' range-join
hint is proprietary); the naive formulation
``points.join(intervals, p.ts >= i.start & p.ts < i.end)`` plans as a
broadcast-nested-loop (O(P × I) comparisons) and falls over as the
interval table grows.

The scale-correct shape, implemented here: discretize time into
fixed-width bins; an interval registers in every bin it overlaps
(explode — interval count × bins-per-interval rows, small for
bounded intervals); a point registers in exactly one bin. The join
becomes an equi-join on the bin id followed by the exact range
predicate as a post-filter. One hash shuffle each side, no nested
loop. Bin width tunes the replication-vs-selectivity trade: ~the
median interval length is the usual choice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval containing it
    ([start, end) semantics). All three columns must share one
    numeric/epoch unit; ``bin_width`` is in that unit.
    """
    p = points.withColumn(
        "_bin", (F.col(point_ts) / bin_width).cast("bigint")
    )
    i = intervals.withColumn(
        "_bins",
        F.sequence(
            (F.col(start_col) / bin_width).cast("bigint"),
            # end is exclusive: a zero-length tail at an exact bin
            # boundary registers no extra bin
            ((F.col(end_col) - 1) / bin_width).cast("bigint"),
        ),
    ).withColumn("_bin", F.explode("_bins")).drop("_bins")

    joined = p.join(i, "_bin", how).filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("_bin")
