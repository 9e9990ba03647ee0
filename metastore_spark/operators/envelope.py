"""Result envelope: page of hits + corpus-wide summary aggregates.

The reference attaches to every query (a) the total matched count
(hits.total → summary.total, metastore/models.py:152) and (b) a sum
aggregation over all matched docs (summary.totalBytes,
metastore/models.py:116-117,153), regardless of pagination.

Spark-first shape: one ``agg(count, sum)`` job over the filtered frame
(partial aggregation map-side, a single exchange of one row per
partition — cheap at any scale), plus the paginated page itself.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metastore_spark.operators.paging import paginate


@dataclass
class Envelope:
    results: list[dict] = field(default_factory=list)
    total: int = 0
    total_bytes: float = 0.0
    error: str | None = None

    def to_dict(self) -> dict:
        out = {
            "results": self.results,
            "summary": {"total": self.total, "totalBytes": self.total_bytes},
        }
        if self.error is not None:
            out["error"] = self.error
        return out


def summary_agg(filtered: DataFrame, bytes_col: str | None) -> tuple[int, float]:
    """count(*) + sum(bytes) in ONE aggregation job."""
    aggs = [F.count(F.lit(1)).alias("total")]
    if bytes_col is not None and _has_field(filtered, bytes_col):
        aggs.append(F.sum(F.col(bytes_col).cast("double")).alias("total_bytes"))
    row = filtered.agg(*aggs).first()
    total = int(row["total"])
    total_bytes = float(row["total_bytes"]) if "total_bytes" in row and row["total_bytes"] is not None else 0.0
    return total, total_bytes


def _has_field(df: DataFrame, dotted: str) -> bool:
    try:
        df.select(F.col(dotted))
        return True
    except Exception:
        return False


def run_envelope(
    filtered: DataFrame,
    sort_cols: list[Column] | None,
    offset: int,
    size: int,
    bytes_col: str | None = None,
) -> Envelope:
    """Execute the canonical search shape: summary aggs + one page.

    The filtered frame feeds two jobs (summary + page); persist it so
    the filter/scoring pipeline runs once, and release the cache
    before returning — per-request memory is bounded by the request.
    """
    filtered = filtered.persist()
    try:
        total, total_bytes = summary_agg(filtered, bytes_col)
        page = paginate(filtered, sort_cols, offset, size)
        results = [r.asDict(recursive=True) for r in page.collect()]
    finally:
        filtered.unpersist()
    return Envelope(results=results, total=total, total_bytes=total_bytes)
