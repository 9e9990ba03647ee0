"""Bounded-memory grouped top-k — the partial-agg shape Spark lacks.

The textbook ``row_number() OVER (PARTITION BY g ORDER BY s) <= k``
shuffles EVERY row to its group's reducer before any row is discarded:
at 100 TB the exchange carries the full table, and a hot group
concentrates on one task. The scale-correct shape is the same
two-phase reduction every partial aggregate uses:

1. **map side**: each input partition keeps only its own top-k per
   group it has seen (an Arrow-batched ``mapInPandas`` kernel holding
   a k-row buffer per group — memory O(groups-per-partition × k),
   independent of partition row count);
2. **reduce side**: the survivors (≤ partitions × groups × k rows —
   candidates, of which only groups × k win) go through the ordinary
   window, which is now operating on a parameter-sized frame.

The result is identical to the naive window (ties broken by the full
``order_cols`` tuple, which callers make unique, same as the engine's
``global_rank`` contract); only the exchange volume changes. Spark
cannot express phase 1 natively — ``collect_list`` partials are
unbounded and there is no PySpark Aggregator API — which is exactly
the "custom operator via Arrow kernel" escape hatch the survey
prescribes (SURVEY.md §2.0); the kernel never crosses a partition
boundary, so no correctness depends on Spark's partitioning.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[tuple[str, bool]],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Exact top-k rows per group under ``order_cols``.

    ``order_cols`` is ``[(col, ascending), ...]``; make the tuple
    unique per row (append an id) or rank ties are partition-dependent
    — the same requirement the naive window has with ``row_number``.
    ``rank_col`` adds the 1-based rank when set.

    Order columns must be NON-NULL: pandas sorts NaN last
    unconditionally while Spark's window sorts nulls first on ASC, so
    a null key could survive phase 1 on one engine's rules and be
    ranked by the other's. The kernel raises on null keys rather than
    silently diverging.
    """
    schema = df.schema
    by = [c for c, _ in order_cols]
    asc = [a for _, a in order_cols]

    def partial_topk(batches: Iterator) -> Iterator:
        import pandas as pd

        buf: dict[tuple, "pd.DataFrame"] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            if pdf[by].isna().any().any():
                raise ValueError(
                    "grouped_topk: null in order columns "
                    f"{by} — null ordering differs between pandas and "
                    "Spark windows; filter or coalesce first"
                )
            # keep ≤ k rows per group seen so far in this partition;
            # concat-then-trim per batch keeps the buffer bounded by
            # groups-in-partition × k between batches
            for key, g in pdf.groupby(group_cols, sort=False, dropna=False):
                cur = buf.get(key)
                both = g if cur is None else pd.concat((cur, g))
                buf[key] = both.sort_values(by, ascending=asc, kind="mergesort").head(k)
        if buf:
            yield pd.concat(list(buf.values()))

    survivors = df.mapInPandas(partial_topk, schema)
    w = Window.partitionBy(*group_cols).orderBy(
        *[F.col(c).asc() if a else F.col(c).desc() for c, a in order_cols]
    )
    out = survivors.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= k
    )
    if rank_col:
        return out.withColumnRenamed("_rk", rank_col)
    return out.drop("_rk")
