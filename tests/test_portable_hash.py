"""portable_hash60 is the foundation under every oracled signature
operator — prove Spark and DuckDB agree on it for a broad sample of
strings, and that hash-based assignments are layout-independent."""

import random
import string

import duckdb

from pyspark.sql import functions as F

from metastore_spark.dedup.ops import portable_hash60

_PH60_SQL = (
    "list_sum(list_transform(range(1,16), i -> "
    "(strpos('0123456789abcdef', substr(md5(s), i, 1)) - 1)::BIGINT"
    " * (1::BIGINT << (4*(15-i)))))"
)


def test_portable_hash_cross_engine_agreement(spark):
    rng = random.Random(1234)
    alphabet = string.ascii_letters + string.digits + " '.,-_😀éß"
    samples = [""] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 40)))
        for _ in range(300)
    ]
    sdf = spark.createDataFrame([(s,) for s in samples], "s string")
    got_spark = {
        r["s"]: r["h"]
        for r in sdf.select("s", portable_hash60(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TEMP TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in samples])
    got_duck = dict(con.execute(f"SELECT s, {_PH60_SQL} FROM t").fetchall())
    assert got_spark == got_duck


def test_train_val_split_is_layout_independent(spark):
    # hash-of-id assignment must not depend on partitioning or order
    from metastore_spark.catalog import load_table

    sf = "/root/testdata/sf0.001"
    d = load_table(spark, sf, "documents").select("doc_id")
    bucket = (portable_hash60(F.col("doc_id").cast("string")) % 100).alias("b")
    one = {tuple(r) for r in d.coalesce(1).select("doc_id", bucket).collect()}
    many = {
        tuple(r)
        for r in d.repartition(17, "doc_id").select("doc_id", bucket).collect()
    }
    assert one == many
