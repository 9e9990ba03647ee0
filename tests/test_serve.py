"""serve.materialized: build-once semantics, content invalidation,
fallback correctness."""

import os
import time

from metastore_spark import serve


def test_materialized_builds_once_and_invalidates(spark, tmp_path):
    src = str(tmp_path / "src.parquet")
    spark.range(10).toDF("id").write.parquet(src)

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.read.parquet(src).selectExpr("id", "id * 2 AS dbl")

    root = serve._SERVE_ROOT
    serve._SERVE_ROOT = str(tmp_path / "serve")  # isolate from repo cache
    try:
        df1 = serve.materialized(spark, [src], "t1", build)
        assert df1.count() == 10 and calls["n"] == 1
        # same content → reopened, not rebuilt (fresh process-cache key
        # simulated by clearing the in-proc cache)
        serve._CACHE.clear()
        df2 = serve.materialized(spark, [src], "t1", build)
        assert df2.count() == 10 and calls["n"] == 1
        # rewritten source → new fingerprint → rebuild
        time.sleep(0.01)
        spark.range(7).toDF("id").write.mode("overwrite").parquet(src)
        serve._CACHE.clear()
        df3 = serve.materialized(spark, [src], "t1", build)
        assert df3.count() == 7 and calls["n"] == 2
        # superseded fingerprint dir RETAINED while young (a concurrent
        # reader may still be draining it — age-based retention) ...
        dirs = [
            d
            for d in os.listdir(serve._SERVE_ROOT)
            if d.startswith("t1-") and not d.endswith("_DONE")
        ]
        assert len(dirs) == 2
        # ... and pruned once older than the retention window
        old_age = serve._PRUNE_AGE_SEC
        serve._PRUNE_AGE_SEC = 0
        try:
            spark.range(3).toDF("id").write.mode("overwrite").parquet(src)
            serve._CACHE.clear()
            df4 = serve.materialized(spark, [src], "t1", build)
            assert df4.count() == 3 and calls["n"] == 3
        finally:
            serve._PRUNE_AGE_SEC = old_age
        dirs = [
            d
            for d in os.listdir(serve._SERVE_ROOT)
            if d.startswith("t1-") and not d.endswith("_DONE")
        ]
        assert len(dirs) == 1
    finally:
        serve._SERVE_ROOT = root
        serve._CACHE.clear()


def test_materialized_falls_back_without_warehouse(spark, tmp_path):
    src = str(tmp_path / "src2.parquet")
    spark.range(5).toDF("id").write.parquet(src)
    root = serve._SERVE_ROOT
    serve._SERVE_ROOT = "/proc/definitely-unwritable/serve"
    try:
        df = serve.materialized(
            spark, [src], "t2", lambda: spark.read.parquet(src)
        )
        assert df.count() == 5  # correctness never depends on the cache
    finally:
        serve._SERVE_ROOT = root
        serve._CACHE.clear()
