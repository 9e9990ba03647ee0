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

BLOOM_K = 4
# ~10 bits/key gives ~1% false positives at k=4. The built filter
# ships to executors as ONE array literal (a broadcast variable in
# cluster terms): 1e8 keys -> 1e9 bits = 125 MB, still broadcastable;
# beyond that, partition the key space and build one filter per range.
BLOOM_BITS_PER_KEY = 10


def _bloom_positions(key: Column, n_bits: int) -> list[Column]:
    """K bit positions via double hashing on two independent xxhash64
    values (JVM intrinsic — no string round-trip, ~50x cheaper than a
    cryptographic hash on the probe's per-row hot path)."""
    h1 = F.xxhash64(key)
    h2 = F.xxhash64(key, F.lit("bloom2"))
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(BLOOM_K)
    ]


def bloom_build(df: DataFrame, key: Column) -> list[int]:
    """Aggregate the build side into a list of 32-bit words, sized to
    the build-side cardinality (BLOOM_BITS_PER_KEY bits/key, power-of-
    two, >= 2048). A fixed-size filter would silently saturate as the
    build side grows — fp rate -> 1 and the probe prunes nothing while
    still paying per-row hash cost.

    One narrow scan: each row contributes K (word, bitmask) pairs,
    exploded and bit_or-combined map-side first (partial aggregation),
    so the exchange is at most n_words rows per input partition.
    """
    n_keys = df.count()
    n_bits = 2048
    while n_bits < n_keys * BLOOM_BITS_PER_KEY:
        n_bits *= 2
    pairs = F.array(
        *[
            F.struct(
                (p / 32).cast("int").alias("w"),
                # 2^bit is exact in a double up to 2^52; bit <= 31 here.
                F.pow(F.lit(2.0), (p % 32).cast("int")).cast("long").alias("m"),
            )
            for p in _bloom_positions(key, n_bits)
        ]
    )
    rows = (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.w").alias("w"))
        .agg(F.bit_or(F.col("p.m")).alias("m"))
        .collect()
    )
    words = [0] * (n_bits // 32)
    for r in rows:
        words[r["w"]] = r["m"]
    return words


def bloom_prefilter(df: DataFrame, key: Column, words: list[int]) -> DataFrame:
    """Map-side membership prefilter: keeps every row whose key is in
    the filter (no false negatives), plus ~1% false positives.

    The word table rides in as a broadcast 1-row frame rather than an
    inline array expression: a python-list "literal" lowers to
    CreateArray, which re-materializes all n words PER ROW (measured
    30x slower at 8k words); as a broadcast attribute the array is
    built once and each probe is four O(1) element_at lookups fused
    into the scan stage — no exchange of df anywhere."""
    wcol = "_bloom_words"
    while wcol in df.columns:
        wcol += "_"
    bf = df.sparkSession.createDataFrame(
        [(words,)], f"{wcol}: array<bigint>"
    )
    conds = [
        F.element_at(F.col(wcol), (p / 32).cast("int") + 1).bitwiseAND(
            F.pow(F.lit(2.0), (p % 32).cast("int")).cast("long")
        )
        != 0
        for p in _bloom_positions(key, len(words) * 32)
    ]
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return df.crossJoin(F.broadcast(bf)).filter(out).drop(wcol)


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
            # dropna=False: a null key is a key — dropping it would
            # break the superset guarantee for null-heavy inputs
            vc = pdf.groupby(key_cols, sort=False, dropna=False).size()
            for key_val, c in vc.items():
                tup = key_val if isinstance(key_val, tuple) else (key_val,)
                counters[tup] = counters.get(tup, 0) + int(c)
            if len(counters) > k:
                vals = np.fromiter(counters.values(), dtype=np.int64)
                # d = smallest value whose removal leaves <= k survivors
                d = int(np.partition(vals, len(vals) - k - 1)[len(vals) - k - 1])
                counters = {t: c - d for t, c in counters.items() if c > d}
        out = pd.DataFrame(list(counters.keys()), columns=key_cols)
        # pandas upcasts null keys to NaN; hand Arrow real NULLs
        yield out.where(pd.notna(out), None)

    return df.select(*key_cols).mapInPandas(gen, schema=fields)
