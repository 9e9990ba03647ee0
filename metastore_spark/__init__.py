"""metastore_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of datahq/metastore (reference: /root/reference), built
Spark-first: every operator is a declarative DataFrame/Column
composition that Catalyst can optimize (predicate pushdown, column
pruning, broadcast joins, partial aggregation), designed to run
unchanged from local[32] to a 1000-executor cluster at ~100 TB.

Layout
------
- ``session``     : tuned SparkSession factory (AQE, Arrow, shuffle sizing)
- ``catalog``     : table registry over parquet directories
- ``params``      : typed query-parameter parsing (reference: metastore/models.py:97-105)
- ``operators``   : visibility / filter algebra / pagination / envelope aggregates
- ``search``      : english analysis, inverted-index build, BM25 multi-field scoring
- ``text``        : language-ID, quality scoring, token counting, fingerprinting
- ``dedup``       : exact, minhash-LSH, simhash, n-gram jaccard, embedding near-dup
- ``similarity``  : brute-force + LSH-bucketed cosine top-k
- ``multimodal``  : binary media columns with typed metadata (decode stubbed)
- ``streaming``   : Structured Streaming ingestion of the events table
"""

__version__ = "0.1.0"
