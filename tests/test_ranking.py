"""operators/ranking.py: the arithmetic NTILE must equal the window
function's assignment for every (n, k) shape, and global_rank must
produce the exact 1-based sort positions."""

import duckdb
import pytest

from pyspark.sql import functions as F

from metastore_spark.operators.ranking import global_rank, ntile_from_rank


@pytest.mark.parametrize("k", [1, 3, 10])
def test_ntile_formula_matches_sql_ntile(k):
    con = duckdb.connect()
    for n in range(1, 41):
        sql = con.execute(
            f"SELECT r, NTILE({k}) OVER (ORDER BY r) FROM range(1, {n + 1}) t(r)"
        ).fetchall()
        # evaluate the same formula in plain python (mirrors the Column expr)
        q, m = divmod(n, k)
        big = m * (q + 1)
        for r, expected in sql:
            if q == 0:
                got = r
            else:
                got = (
                    -(-r // (q + 1)) if r <= big else m + -(-(r - big) // q)
                )
            assert got == expected, (n, k, r)


def test_global_rank_is_exact_sort_position(spark):
    df = spark.range(1000).select(
        (F.col("id") * 37 % 991).alias("v"), F.col("id").alias("tid")
    )
    ranked = global_rank(df, ["v", "tid"], "rank", num_partitions=7)
    rows = sorted(
        ((r["v"], r["tid"], r["rank"]) for r in ranked.collect())
    )
    for expected, (_, _, got) in enumerate(rows, start=1):
        assert got == expected


def test_global_rank_concurrent_calls_do_not_evict_each_other(spark):
    """Two threads ranking concurrently on one session must each get
    exact ranks: every call eagerly materializes its own result, so
    no shared cache exists for one call to evict from another (the
    old module-global persisted-frame list did exactly that)."""
    import threading

    results = {}
    errors = []

    def run(tag, mod):
        try:
            df = spark.range(2000).select(
                (F.col("id") * mod % 997).alias("v"),
                F.col("id").alias("tid"),
            )
            ranked = global_rank(df, ["v", "tid"], "rank", num_partitions=5)
            rows = sorted((r["v"], r["tid"], r["rank"]) for r in ranked.collect())
            results[tag] = rows
        except Exception as e:  # surface thread failures to the assert
            errors.append((tag, e))

    threads = [
        threading.Thread(target=run, args=("a", 37)),
        threading.Thread(target=run, args=("b", 53)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    for tag in ("a", "b"):
        for expected, (_, _, got) in enumerate(results[tag], start=1):
            assert got == expected, (tag, expected, got)


def test_global_rank_chained_calls_stay_frozen(spark):
    """Re-ranking an already-ranked frame on a second metric must not
    corrupt the first rank column: before eager materialization, the
    second call's range exchange lazily recomputed the first ranks
    under a re-sampled split against frozen offsets (caught at sf1 by
    customers_rfm_segments — 68 'quartile' combos out of a possible
    64)."""
    df = spark.range(5000).select(
        (F.col("id") * 37 % 4999).alias("a"),
        (F.col("id") * 53 % 4997).alias("b"),
        F.col("id").alias("tid"),
    )
    r1 = global_rank(df, ["a", "tid"], "rank_a", num_partitions=7)
    r2 = global_rank(r1, ["b", "tid"], "rank_b", num_partitions=7)
    rows = r2.collect()
    by_a = sorted((r["a"], r["tid"], r["rank_a"]) for r in rows)
    for expected, (_, _, got) in enumerate(by_a, start=1):
        assert got == expected
    by_b = sorted((r["b"], r["tid"], r["rank_b"]) for r in rows)
    for expected, (_, _, got) in enumerate(by_b, start=1):
        assert got == expected
