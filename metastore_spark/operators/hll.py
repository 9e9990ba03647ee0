"""Portable explicit-register HyperLogLog (p=10, 1024 registers).

The register table (scope key, bucket, r) IS the sketch: building it
is one partial-agg shuffle over the keys, merging sketches is a
per-bucket MAX (associative, commutative, idempotent — which is what
makes the estimate independent of batching, ordering, and replay),
and the estimate is a closed-form expression over one aggregate row.
The hash is portable_hash60, bucket/rank are exact integer ops, and
the Flajolet bias constant is a single Python-computed literal shared
with the DuckDB oracle mirrors — so estimates are value-hash-exact
cross-engine, linear-counting branch included.

Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm", AofA 2007 — public
algorithm; implemented from the paper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metastore_spark.dedup.ops import portable_hash60

P = 10
M = 1 << P  # 1024 registers
# bias constant, precomputed ONCE and injected as the identical
# literal into both engines' expressions
ALPHA_M2 = (0.7213 / (1.0 + 1.079 / M)) * M * M


def day_registers(
    df: DataFrame, ts_col: str = "ts", key_col: str = "user_id"
) -> DataFrame:
    """Per-day register table (d, bucket, r) for distinct ``key_col``.

    One scan + one partial-agg shuffle whose output is
    O(days × 1024) rows — the serving artifact at any corpus size.
    """
    hsh = df.select(
        F.to_date(F.date_trunc("day", F.col(ts_col))).alias("d"),
        portable_hash60(F.col(key_col).cast("string")).alias("h"),
    )
    w = F.expr(f"h div {M}")
    rho = F.when(w == 0, F.lit(51)).otherwise(
        F.lit(51) - F.length(F.conv(w.cast("string"), 10, 2))
    )
    return (
        hsh.select("d", (F.col("h") % M).alias("bucket"), rho.alias("rho"))
        .groupBy("d", "bucket")
        .agg(F.max("rho").alias("r"))
    )


def merge_registers(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sketch union: per-(d, bucket) MAX over both register tables."""
    return (
        a.unionByName(b).groupBy("d", "bucket").agg(F.max("r").alias("r"))
    )


def estimate_col(used: Column, spow: Column) -> Column:
    """Closed-form estimate from (register count, Σ 2^-r): raw HLL
    with the small-range linear-counting correction."""
    zeros = F.lit(float(M)) - used.cast("double")
    raw = F.lit(ALPHA_M2) / (spow + zeros)
    return F.when(
        (zeros > 0) & (raw <= F.lit(2.5 * M)),
        F.lit(float(M)) * F.log(F.lit(float(M)) / zeros),
    ).otherwise(raw)


def scope_estimates(regs: DataFrame) -> DataFrame:
    """(scope, hll_estimate, used) per day plus the 'total' row from
    the register-MAX merge of all days — day→all without touching raw
    data."""
    per_day = (
        regs.groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("used"),
            F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("spow"),
        )
        .select(
            F.col("d").cast("string").alias("scope"),
            F.round(estimate_col(F.col("used"), F.col("spow")), 4).alias(
                "hll_estimate"
            ),
            F.col("used").cast("bigint").alias("used"),
        )
    )
    total = (
        regs.groupBy("bucket")
        .agg(F.max("r").alias("r"))
        .agg(
            F.count(F.lit(1)).alias("used"),
            F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("spow"),
        )
        .select(
            F.lit("total").alias("scope"),
            F.round(estimate_col(F.col("used"), F.col("spow")), 4).alias(
                "hll_estimate"
            ),
            F.col("used").cast("bigint").alias("used"),
        )
    )
    return per_day.unionAll(total)
