"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at the given sf_dir, runs the
matching ``oracle_sql()`` in DuckDB over the same parquet files, and
compares row count, column-name set, and an order-insensitive value
multiset (floats compared exactly — our queries round on both sides,
so any drift is a real bug).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = repr(v)  # full precision — stricter than the driver
            vals.append(str(v))
        out.append("\x00".join(vals))
    return sorted(out)


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if os.environ.get("ORACLE_GET_SPARK"):
        from metastore_spark.session import get_spark

        spark = get_spark("oracle-check")
    else:
        # Default: a VANILLA session like the driver's — no builder
        # confs from this repo. Catches anything that silently
        # depends on get_spark()'s configuration (the round-2 lesson).
        from pyspark.sql import SparkSession

        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        spark = (
            SparkSession.builder.appName("oracle-check-vanilla")
            .master(f"local[{cpus}]")
            .getOrCreate()
        )
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = [c.lower() for c in sdf.columns]
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spark_rows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.execute(oracles[name])
            duck_cols = [d[0].lower() for d in rel.description]
            duck_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            continue
        problems = []
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount {len(spark_rows)} != {len(duck_rows)}")
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols {sorted(spark_cols)} != {sorted(duck_cols)}")
        if not problems:
            s = _normalize(spark_rows, spark_cols)
            d = _normalize(duck_rows, duck_cols)
            if s != d:
                diff = [(a, b) for a, b in zip(s, d) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failed.append(name)
        else:
            print(f"ok   {name}: {len(spark_rows)} rows match "
                  f"({time.time()-t0:.1f}s)")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
