"""SparkSession factory with scale-oriented defaults.

The reference delegates all execution to an Elasticsearch cluster
(metastore/models.py:146); here the execution engine is Spark, so the
session carries the configuration that matters at 100 TB:

- AQE on (runtime coalescing, skew-join splitting, plan re-opt)
- Arrow for any pandas-UDF exchange (vectorized, not per-row pickle)
- UTC session timezone so timestamp semantics are stable across the
  driver, executors, and external oracles
- shuffle partitions sized to cores locally; on a real cluster AQE's
  coalescing makes the initial number a ceiling, not a constant
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = max(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), 8)


def get_spark(
    app_name: str = "metastore-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when no cluster
    is configured; on a real deployment the cluster manager supplies it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        # local mode: driver == executor JVM, and Spark's 1g default
        # heap OOMs once tens of queries accumulate cached frames /
        # broadcasts. Only effective at JVM launch (ignored if a
        # session already exists — e.g. under a host-owned driver).
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        )
        # JVM unified-logging warnings (gc,alloc GCLocker retries)
        # print to STDOUT and would corrupt stdout contracts like
        # bench.py's one-JSON-line output.
        .config("spark.driver.extraJavaOptions", "-Xlog:disable")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # 128 MiB scan splits: good balance of task count vs. per-task
        # overhead for columnar parquet at large scale. Overridable via
        # SPARK_GRAFT_SPLIT_MB for single-big-file fixtures (a ~100 MB
        # sf1 file otherwise scans as ONE partition).
        .config(
            "spark.sql.files.maxPartitionBytes",
            str(
                int(os.environ.get("SPARK_GRAFT_SPLIT_MB", "128"))
                * 1024
                * 1024
            ),
        )
        # Broadcast anything under 64 MiB — dimension tables (region,
        # nation, supplier, part at catalog scale) should never shuffle.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.showConsoleProgress", "false")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    effective_master = master or os.environ.get("SPARK_MASTER") or f"local[{cpus}]"
    if effective_master.startswith("local"):
        # Locality levels are meaningless inside one JVM (every task is
        # PROCESS_LOCAL); waiting for "better" locality only delays
        # dispatch on busy hosts (~60 ms/job measured). Real clusters
        # keep the default 3s — HDFS/shuffle locality matters there.
        builder = builder.config("spark.locality.wait", "0")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_runtime(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable defaults to an externally-created session.

    Used when the driver hands us its own SparkSession (the
    ``__spark_entry__`` contract): only runtime-mutable confs here.
    """
    for k, v in (
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        # ANSI off: x/0 → NULL and bad casts → NULL, matching the
        # permissive semantics of the reference (and the DuckDB oracle).
        ("spark.sql.ansi.enabled", "false"),
        # Best-effort ONLY: lets a legacy TIMESTAMP(NANOS) parquet
        # generation read as bigint nanos. NOTHING depends on this
        # applying — event-time handling is schema-adaptive
        # (metastore_spark.ts.normalize_ts) because a host-owned
        # session may reject the conf.
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        # Externally-created sessions default to 200 shuffle partitions;
        # size to local cores (AQE coalesces further at runtime).
        ("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS)),
        # Parity with get_spark() (r12): a host-owned session otherwise
        # runs with the 10 MB auto-broadcast default (dimension tables
        # needlessly shuffle) and row-pickled pandas exchange.
        ("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked by the host — proceed with its value
    return spark
