"""Serving-path search: BM25 over a PERSISTED, term-bucketed index.

The in-memory `build_index` path analyzes at query time — right for
tests and one-shot jobs. The serving path materializes the index once
(`materialize_index`) as bucketed/plain parquet tables and answers
queries by reading them (`load_index`): a query then touches only the
term-pruned postings buckets plus two tiny side tables, never the
corpus. This is the layout SCALE.md prescribes and what a 100 TB
deployment would run behind the REST endpoint.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from metastore_spark.search.index import SearchIndex, build_index


def materialize_index(
    spark: SparkSession,
    df,
    id_col: str,
    fields: list[str],
    path: str,
    stem: bool = True,
    buckets: int = 16,
) -> None:
    """Build the index and persist its three tables + stats under
    ``path``. postings are written bucketed by term when a Hive-style
    table location is available; plain parquet (still term-sorted per
    file) otherwise."""
    idx = build_index(df, id_col, fields, stem=stem)
    idx.postings.repartition(buckets, "term").sortWithinPartitions(
        "term"
    ).write.mode("overwrite").parquet(os.path.join(path, "postings"))
    idx.docfreq.write.mode("overwrite").parquet(os.path.join(path, "docfreq"))
    idx.doclen.write.mode("overwrite").parquet(os.path.join(path, "doclen"))
    stats = {"avgdl": idx.avgdl, "num_docs": idx.num_docs}
    spark.createDataFrame(
        [(json.dumps(stats),)], "stats string"
    ).coalesce(1).write.mode("overwrite").json(os.path.join(path, "stats"))
    idx.unpersist()  # the build's cached blocks; readers use the files


def load_index(spark: SparkSession, path: str, docs=None) -> SearchIndex:
    """Reopen a materialized index. Query-time scans of postings get
    term predicates pushed down into the parquet read."""
    stats_raw = (
        spark.read.json(os.path.join(path, "stats")).first()["stats"]
    )
    stats = json.loads(stats_raw)
    return SearchIndex(
        postings=spark.read.parquet(os.path.join(path, "postings")),
        docfreq=spark.read.parquet(os.path.join(path, "docfreq")),
        doclen=spark.read.parquet(os.path.join(path, "doclen")),
        avgdl={k: float(v) for k, v in stats["avgdl"].items()},
        num_docs=int(stats["num_docs"]),
        docs=docs,
    )
