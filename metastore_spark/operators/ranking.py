"""Distributed exact global ranking — no single-partition window.

``NTILE(k) OVER (ORDER BY ...)`` forces every row through one task
("Moving all data to a single partition"). The same bucket assignment
is a pure function of the exact global rank, and the exact global rank
is computable with the classic two-phase prefix sum:

1. range-repartition on the sort key (Spark samples split points — the
   same exchange a global sort uses, all partitions in parallel),
2. per-partition ``row_number`` (window partitioned by partition id —
   runs parallel, never global),
3. add each partition's cumulative row-count offset (a ≤ #partitions
   driver-side array — parameter-sized, like any scalar subquery).

At 1000 executors this is one range exchange + one map, vs. the
single-reducer sort the naive window degrades to.

The RANGE-PARTITIONED frame is eagerly checkpointed (localCheckpoint,
not persist): the offsets map is frozen at call time from one specific
range-sample, so any recompute under a re-sampled exchange would
silently corrupt ranks — and on a shared session a mere persist can be
dropped under us by another caller's clearCache. Checkpointed RDDs
live outside the cache manager, so chained calls (RFM ranks three
metrics in one query) and concurrent callers are safe by construction;
the rank column itself recomputes deterministically from the frozen
frame. The checkpoint is the same O(rows) write a shuffle stage pays;
its storage is reclaimed when the frame is dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based dense global rank under ORDER BY ``order_cols``.

    Assumes the key tuple is unique per row (callers append a unique
    tiebreaker — the same requirement deterministic NTILE has anyway),
    so row_number == rank == the unique sort position. The underlying
    range frame is checkpointed: consumers (including repeated actions
    and later re-rankings of the same frame) read frozen rank values.
    """
    n_part = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    # EAGER localCheckpoint (not persist): the counts job and every
    # later consumer must see the SAME range assignment (the range
    # exchange samples split points; any recompute could re-sample
    # differently and desync the frozen offsets map). A persisted
    # frame is not enough on a SHARED session — the query decorator's
    # clearCache (or any other caller's) can drop it between the
    # counts job and a consumer's job; checkpointed RDDs live outside
    # the cache manager, so nothing can force that recompute.
    part = (
        df.repartitionByRange(int(n_part), *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # phase 1: per-partition counts — parameter-sized driver fetch
    counts = dict(
        (r["_pid"], r["cnt"])
        for r in part.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    offsets, running = {}, 0
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]
    # phase 2: local row_number + broadcast offset; the when-chain is
    # O(#partitions) literals — constant-folded, no join, no shuffle.
    # No second checkpoint needed: the rank recomputes deterministically
    # from the checkpointed range frame.
    off: Column = F.lit(0)
    expr = None
    for pid, o in offsets.items():
        cond = F.col("_pid") == pid
        expr = F.when(cond, o) if expr is None else expr.when(cond, o)
    if expr is not None:
        off = expr.otherwise(F.lit(0))
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return part.withColumn(
        rank_col, (F.row_number().over(w) + off).cast("bigint")
    ).drop("_pid")


def ntile_from_rank(rank: Column, n_rows: int, k: int) -> Column:
    """Exact NTILE(k) bucket from a 1-based global rank — the same
    assignment the window function makes: the first ``n_rows % k``
    buckets get ``n_rows // k + 1`` rows, the rest ``n_rows // k``.
    """
    q, m = divmod(n_rows, k)
    big = m * (q + 1)  # rows living in the size-(q+1) buckets
    if q == 0:
        # fewer rows than buckets: bucket == rank
        return rank.cast("int")
    return (
        F.when(rank <= big, F.ceil(rank / (q + 1)))
        .otherwise(m + F.ceil((rank - big) / q))
        .cast("int")
    )
