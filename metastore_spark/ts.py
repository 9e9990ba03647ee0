"""Canonical event-time handling for the events table.

The reference treats ``events.ts`` as an opaque sortable instant
(/root/reference/metastore/models.py:58-105); the storage layer has
shipped it in two physical forms across test-data generations:

- parquet TIMESTAMP(NANOS) → Spark reads bigint nanoseconds under
  ``spark.sql.legacy.parquet.nanosAsLong``
- parquet timestamp[us] (isAdjustedToUTC=false) → Spark reads
  TIMESTAMP_NTZ

Everything downstream assumes ONE canonical form: **TIMESTAMP_NTZ
wall-clock**. :func:`normalize_ts` adapts whatever physically arrives
into that form at load time; :func:`ts_us` / :func:`us_to_ts` convert
NTZ ↔ epoch-microseconds with pure wall-clock arithmetic
(``timestampdiff`` / ``timestampadd`` against an NTZ epoch literal),
which is **session-timezone-independent** and matches DuckDB's
``epoch_us()`` / ``make_timestamp()`` bit-for-bit — the property the
oracle hash-compare depends on. Never use ``unix_micros`` /
``timestamp_micros`` / ``date_format`` on a TIMESTAMP (instant)
column in a query path: those render through the session timezone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

# NTZ epoch literal: wall-clock zero point, no timezone involved.
EPOCH_NTZ = "timestamp_ntz'1970-01-01 00:00:00'"


def ts_us(col: str = "ts") -> Column:
    """Epoch microseconds (bigint) from a TIMESTAMP_NTZ column.

    Pure wall-clock difference — equals DuckDB ``epoch_us(col)``
    regardless of ``spark.sql.session.timeZone``.
    """
    return F.expr(f"timestampdiff(MICROSECOND, {EPOCH_NTZ}, {col})")


def us_to_ts(col) -> Column:
    """TIMESTAMP_NTZ from epoch microseconds (bigint column or name).

    Inverse of :func:`ts_us`; equals DuckDB ``make_timestamp(us)``.
    """
    expr = col if isinstance(col, str) else None
    if expr is not None:
        return F.expr(f"timestampadd(MICROSECOND, {expr}, {EPOCH_NTZ})")
    return F.expr(f"timestampadd(MICROSECOND, __us__, {EPOCH_NTZ})")  # pragma: no cover


def lit_ts(iso: str) -> Column:
    """NTZ literal from 'YYYY-MM-DD[ HH:MM:SS[.ffffff]]'."""
    return F.expr(f"timestamp_ntz'{iso}'")


def lit_us(iso: str) -> int:
    """Epoch microseconds of an ISO wall-clock instant (driver-side)."""
    from datetime import datetime, timezone

    fmt = "%Y-%m-%d %H:%M:%S" if " " in iso else "%Y-%m-%d"
    dt = datetime.strptime(iso, fmt).replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Coerce ``col`` to TIMESTAMP_NTZ whatever physical type arrived.

    - TIMESTAMP_NTZ: already canonical, returned as-is (zero plan cost).
    - bigint: legacy nanos-as-long — integer div to micros first
      (nanos exceed 2^53; never round-trip through double), then add
      to the NTZ epoch.
    - TIMESTAMP (instant): take its epoch micros (timezone-free by
      definition) and rebuild as UTC wall-clock NTZ.
    """
    if col not in df.columns:
        return df
    dt = df.schema[col].dataType
    if isinstance(dt, TimestampNTZType):
        return df
    if isinstance(dt, LongType):
        return df.withColumn(
            col,
            F.expr(f"timestampadd(MICROSECOND, {col} div 1000, {EPOCH_NTZ})"),
        )
    if isinstance(dt, TimestampType):
        return df.withColumn(
            col,
            F.expr(f"timestampadd(MICROSECOND, unix_micros({col}), {EPOCH_NTZ})"),
        )
    return df
