"""Last-touch attribution: one carry-forward window pass per user.

Factored out of the registry query so the combinator space (ties,
empty trails, expired lookbacks, purchase-only users) can be
property-tested against a pure-Python reference
(tests/test_operator_properties.py) on top of the oracle's pointwise
check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def last_touch_channels(
    ev: DataFrame,
    lookback_us: int = 7 * 86400 * 1000000,
    purchase_type: str = "purchase",
) -> DataFrame:
    """``ev``: (event_id, us, user_id, event_type, cents) →
    (channel, n_purchases, attributed_value).

    Every ``purchase_type`` row credits the same user's most recent
    PRECEDING non-purchase event within ``lookback_us`` ('none' when
    the trail is cold/expired); ties at the same microsecond break by
    event_id. One shuffle on user_id; the running ignorenulls `last`
    carries the latest touch onto each row."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_touch = F.col("event_type") != purchase_type
    seq = ev.select(
        "event_type",
        "cents",
        F.last(F.when(is_touch, F.col("us")), ignorenulls=True)
        .over(w)
        .alias("touch_us"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        "us",
    )
    channel = F.coalesce(
        F.when(
            F.col("touch_us") >= F.col("us") - F.lit(lookback_us),
            F.col("touch_type"),
        ),
        F.lit("none"),
    )
    return (
        seq.filter(F.col("event_type") == purchase_type)
        .groupBy(channel.alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("cents") / 100.0, 2).alias("attributed_value"),
        )
        .orderBy("channel")
    )
