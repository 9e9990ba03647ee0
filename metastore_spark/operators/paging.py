"""Sort + limit/offset pagination (reference O7/O8).

``orderBy().offset().limit()`` compiles to a global
TakeOrderedAndProject-style plan: each partition computes its local
top-(offset+limit), a single merge on the driver slices the page.
That is exactly ES's shard-fetch-merge pattern
(size+from per shard → merge), and it never performs a full sort of
the table — safe at 100 TB as long as offset+limit stays page-sized
(the reference caps it at 100+from, metastore/models.py:129-132).

Always pass a unique tiebreaker column: without one, pagination over
tied sort keys is nondeterministic on any parallel engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def paginate(
    df: DataFrame,
    sort_cols: list[Column] | None,
    offset: int = 0,
    limit: int | None = None,
) -> DataFrame:
    if sort_cols:
        df = df.orderBy(*sort_cols)
    if offset:
        df = df.offset(offset)
    if limit is not None:
        df = df.limit(limit)
    return df
