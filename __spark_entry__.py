"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``metastore_spark``; this module only adapts
its query registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from metastore_spark.queries import REGISTRY

# Importing these modules populates REGISTRY via the @query decorator.
import metastore_spark.queries_text  # noqa: F401,E402
import metastore_spark.queries_dedup  # noqa: F401,E402
import metastore_spark.queries_similarity  # noqa: F401,E402
import metastore_spark.queries_search  # noqa: F401,E402
import metastore_spark.queries_streaming  # noqa: F401,E402
import metastore_spark.queries_analytics  # noqa: F401,E402
import metastore_spark.queries_asof  # noqa: F401,E402
import metastore_spark.queries_tpch_extra  # noqa: F401,E402
import metastore_spark.queries_tpch_joins  # noqa: F401,E402
import metastore_spark.queries_sessions  # noqa: F401,E402
import metastore_spark.queries_temporal  # noqa: F401,E402
import metastore_spark.queries_sampling  # noqa: F401,E402
import metastore_spark.queries_multimodal  # noqa: F401,E402
import metastore_spark.queries_curation  # noqa: F401,E402
import metastore_spark.queries_api  # noqa: F401,E402
import metastore_spark.queries_sketch  # noqa: F401,E402
import metastore_spark.queries_graph  # noqa: F401,E402
import metastore_spark.queries_governance  # noqa: F401,E402
import metastore_spark.queries_snapshots  # noqa: F401,E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query."""
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle}
