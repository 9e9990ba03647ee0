"""Table registry over parquet directories.

The reference dispatches on a "kind" registry of two Elasticsearch
indices (ENABLED_SEARCHES, metastore/models.py:14-35). Here a catalog
is a directory of parquet tables; loading is a lazy ``spark.read``
so Catalyst keeps full pushdown/pruning ability — no caching, no
collect, no schema mangling.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from metastore_spark.ts import normalize_ts

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan for one table.

    ``events.ts`` is normalized to TIMESTAMP_NTZ here (see
    :mod:`metastore_spark.ts`) so every downstream query sees one
    canonical event-time type regardless of the physical parquet
    encoding (timestamp[us] vs legacy bigint nanos).
    """
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All catalog tables that exist under ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            df = spark.read.parquet(path)
            if name == "events":
                df = normalize_ts(df)
            out[name] = df
    return out


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for spark.sql access."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
