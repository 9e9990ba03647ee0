"""Sketch-backed operators: expression-built bloom filters and
Misra-Gries heavy-hitter candidates.

Both are *candidate generators* with deterministic superset
guarantees: a bloom filter never drops a member (no false negatives),
and Misra-Gries with enough counters never drops a key above the
frequency threshold. Production queries pair them with an exact
verify pass, so results stay exact while the expensive scan/shuffle
touches only candidates — the runtime-filter pattern Spark's own
`InjectRuntimeFilter` applies to shuffle joins, made explicit and
portable (md5-slice hashing, mirrorable in any engine).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 64 words x 32 bits = 2048-bit filter. Parameter-sized: the built
# filter ships to executors as a literal array (a broadcast variable
# in cluster terms). At real scale, size m ~ 10 bits/key for ~1% fp:
# 1e8 keys -> 1e9 bits = 125 MB, still broadcastable; beyond that,
# partition the key space and build one filter per partition.
BLOOM_WORDS = 64
BLOOM_BITS = BLOOM_WORDS * 32
BLOOM_K = 4


def _bloom_positions(key: Column) -> list[Column]:
    """K bit positions via double hashing on two independent 60-bit
    md5 slices (same portable-hash construction as dedup.ops.portable_hash60,
    so an external engine can mirror the filter bit-for-bit)."""
    h1 = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
    h2 = F.conv(
        F.substring(F.md5(F.concat(F.lit("bloom:"), key)), 1, 15), 16, 10
    ).cast("bigint")
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(BLOOM_BITS)) for i in range(BLOOM_K)
    ]


def bloom_build(df: DataFrame, key: Column) -> list[int]:
    """Aggregate the build side into BLOOM_WORDS 32-bit words.

    One narrow scan: each row contributes K (word, bitmask) pairs,
    exploded and bit_or-combined map-side first (partial aggregation),
    so the exchange is at most BLOOM_WORDS rows per input partition.
    The collect is parameter-sized (64 ints).
    """
    pairs = F.array(
        *[
            F.struct(
                (p / 32).cast("int").alias("w"),
                # 2^bit is exact in a double up to 2^52; bit <= 31 here.
                F.pow(F.lit(2.0), (p % 32).cast("int")).cast("long").alias("m"),
            )
            for p in _bloom_positions(key)
        ]
    )
    rows = (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.w").alias("w"))
        .agg(F.bit_or(F.col("p.m")).alias("m"))
        .collect()
    )
    words = [0] * BLOOM_WORDS
    for r in rows:
        words[r["w"]] = r["m"]
    return words


def bloom_might_contain(key: Column, words: list[int]) -> Column:
    """Map-side membership probe against a built filter: true for every
    member (no false negatives), rarely true for non-members. Pure
    codegen — array literal + bit tests — so it fuses into the scan
    and runs before any exchange."""
    lit_words = F.array(*[F.lit(w) for w in words])
    conds = [
        F.element_at(lit_words, (p / 32).cast("int") + 1).bitwiseAND(
            F.pow(F.lit(2.0), (p % 32).cast("int")).cast("long")
        )
        != 0
        for p in _bloom_positions(key)
    ]
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def mg_candidates(
    df: DataFrame, key_cols: list[str], frac: float
) -> DataFrame:
    """Partition-local Misra-Gries: per input partition, emit every key
    whose summary counter survives trimming to k = ceil(2/frac)
    counters.

    Superset guarantee (what makes the exact verify pass sound):
    each trim subtracts d from all >= k+1 live counters at once, so
    the total undercount of any key is <= n_p/(k+1) < frac*n_p/2; a
    key with local count >= frac*n_p therefore survives with a
    positive counter. And a key with global share >= frac must have
    local share >= frac in at least one partition (else summing
    count_p < frac*n_p over partitions contradicts the global share),
    so the union of partition candidates contains every global heavy
    hitter. Memory is O(k) per task regardless of key cardinality —
    the point of the sketch: no shuffle of the full key space.
    """
    k = int(2.0 / frac) + 1
    fields = ", ".join(f"{c} {t}" for c, t in df.select(*key_cols).dtypes)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        counters: dict[tuple, int] = {}
        for pdf in it:
            vc = pdf.groupby(key_cols, sort=False).size()
            for key_val, c in vc.items():
                tup = key_val if isinstance(key_val, tuple) else (key_val,)
                counters[tup] = counters.get(tup, 0) + int(c)
            if len(counters) > k:
                vals = np.fromiter(counters.values(), dtype=np.int64)
                # d = smallest value whose removal leaves <= k survivors
                d = int(np.partition(vals, len(vals) - k - 1)[len(vals) - k - 1])
                counters = {t: c - d for t, c in counters.items() if c > d}
        out = {
            c: [t[i] for t in counters] for i, c in enumerate(key_cols)
        }
        yield pd.DataFrame(out, columns=key_cols)

    return df.select(*key_cols).mapInPandas(gen, schema=fields)
