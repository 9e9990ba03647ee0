"""Source reader tests: JSON docs (typed + raw + corrupt quarantine),
CSV, salted join equivalence."""

import pytest
from pyspark.sql import functions as F

from metastore_spark.operators.skew import salted_count, salted_join
from metastore_spark.sources.documents import (
    json_field,
    read_csv_docs,
    read_json_docs,
)


def test_json_docs_typed_and_raw(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"id": 1, "title": "alpha", "extra": {"nested": "x"}}\n'
        '{"id": 2, "title": "beta", "extra": {"nested": "y"}}\n'
        "this is not json\n"
    )
    df = read_json_docs(
        spark, str(p), schema="id bigint, title string, extra struct<nested:string>"
    ).cache()  # Spark requires caching before corrupt-column-only queries
    good = df.filter(F.col("_corrupt").isNull())
    assert good.count() == 2
    assert df.filter(F.col("_corrupt").isNotNull()).count() == 1

    # late-bound access to a field through the raw JSON column
    out = json_field(good, "_raw", "$.extra.nested", "nested_val")
    assert {r["nested_val"] for r in out.collect()} == {"x", "y"}


def test_csv_docs(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text("id,title,score\n1,alpha,0.5\n2,beta,0.9\nbad,row,NaNope\n")
    df = read_csv_docs(spark, str(p), "id bigint, title string, score double")
    rows = df.collect()
    assert len(rows) == 3  # malformed row kept, bad cells nulled
    ok = [r for r in rows if r["id"] is not None]
    assert {r["title"] for r in ok} == {"alpha", "beta"}


def test_salted_join_equals_plain(spark):
    big = spark.range(2000).select(
        (F.when(F.col("id") < 1500, 1).otherwise(F.col("id") % 10)).alias("k"),
        F.col("id").alias("v"),
    )  # key 1 is hot (75% of rows)
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(10)], "k bigint, name string"
    )
    plain = big.join(small, "k").select("v", "name")
    salted = salted_join(big, small.withColumn("k", F.col("k")), "k").select(
        "v", "name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_count_equals_plain(spark):
    df = spark.range(5000).select((F.col("id") % 3).alias("k"))
    want = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["k"]: r["n"] for r in salted_count(df, "k").collect()}
    assert got == want


def test_orc_roundtrip_matches_parquet(spark, tmp_path):
    """ORC write/read must preserve the documents table exactly —
    schema and values — so a query is source-format-independent."""
    from metastore_spark.sources.documents import read_orc_docs, write_orc_docs

    pq = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "docs_orc")
    write_orc_docs(pq, path)
    orc = read_orc_docs(spark, path)
    assert orc.schema == pq.schema
    assert orc.count() == pq.count()
    a = {tuple(r) for r in orc.collect()}
    b = {tuple(r) for r in pq.collect()}
    assert a == b


def test_orc_pushdown(spark, tmp_path):
    from metastore_spark.sources.documents import read_orc_docs, write_orc_docs

    pq = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "docs_orc_pd")
    write_orc_docs(pq, path)
    from pyspark.sql import functions as F

    q = read_orc_docs(spark, path).filter(F.col("lang") == "en").select("doc_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: []" not in plan  # the lang filter reached the scan
    assert "ReadSchema" in plan
