"""Registry queries that exercise the FULL API layer — params →
SearchEngine.search → envelope — rather than binding operators
directly. These catch envelope/wiring regressions (pagination applied
after summary, score popped from results, visibility composed with
filters) that per-operator queries can't.

The envelope is driver-side JSON by contract (the reference returns it
over HTTP); re-uploading it as a one-page DataFrame is the API-boundary
materialization the engine already owns (operators/envelope.py), not a
data-plane collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metastore_spark.api import KindConfig, SearchEngine
from metastore_spark.queries import query, _t
from metastore_spark.ts import ts_us, us_to_ts

_PAGE_SCHEMA_EVENTS = (
    "event_id bigint, user_id bigint, event_type string, ts_us bigint, "
    "value double, total bigint, total_bytes double"
)


@query(
    "api_events_envelope",
    oracle="""
    WITH base AS (
      SELECT event_id, user_id, event_type, EPOCH_US(ts) AS ts_us,
             ROUND(value, 2) AS value
      FROM events
    ),
    filt AS (
      SELECT * FROM base
      WHERE (event_type = 'view' OR user_id = 7)      -- visibility (RLS)
        AND event_type IN ('view', 'purchase')        -- term filter, OR-within
        AND user_id IN (3, 7)                         -- AND-across fields
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS total,
             ROUND(SUM(value), 2)     AS total_bytes
      FROM filt
    ),
    page AS (
      SELECT event_id, user_id, event_type, ts_us, value
      FROM filt ORDER BY ts_us DESC, event_id LIMIT 25 OFFSET 10
    )
    SELECT page.*, s.total, s.total_bytes FROM page, s
    """,
)
def api_events_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1-O10 through the controller contract in ONE call:
    params→QuerySpec (JSON-typed values, size clamp, from/sort),
    visibility ∧ term filters, timestamp sort desc + id tiebreak,
    offset/limit page, and the corpus-wide summary (total +
    totalBytes) — exactly the envelope the reference returns per
    request (metastore/controllers.py:6-17). The page rows carry the
    summary as constant columns so one value-hash pins results AND
    summary together."""
    e = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        ts_us("ts").alias("ts_us"),
        F.round("value", 2).alias("value"),
    )
    engine = SearchEngine(
        spark,
        kinds={
            "events": KindConfig(
                table="events",
                id_field="event_id",
                findability_field="event_type",
                owner_field="user_id",
                timestamp_field="ts_us",
                filter_mode="term",
                bytes_field="value",
                published_value="view",
            )
        },
        dfs={"events": e},
    )
    env = engine.search(
        "events",
        userid=7,
        params={
            "size": "25",
            "from": "10",
            "sort": '"desc"',
            "event_type": ['"view"', '"purchase"'],
            "user_id": ["3", "7"],
        },
    )
    assert "error" not in env, env.get("error")
    rows = [
        (
            r["event_id"], r["user_id"], r["event_type"], r["ts_us"],
            r["value"], env["summary"]["total"], env["summary"]["totalBytes"],
        )
        for r in env["results"]
    ]
    out = spark.createDataFrame(rows, _PAGE_SCHEMA_EVENTS)
    return out.withColumn("total_bytes", F.round("total_bytes", 2))


_PAGE_SCHEMA_DS = (
    "id bigint, title string, findability string, owner string, "
    "bytes double, total bigint, total_bytes double"
)


@query(
    "api_dataset_envelope",
    oracle="""
    WITH ds AS (
      SELECT doc_id AS id,
             lang || '-' || CAST(doc_id AS VARCHAR) AS title,
             CASE WHEN doc_id % 3 = 0 THEN 'published'
                  WHEN doc_id % 3 = 1 THEN 'unpublished'
                  ELSE 'private' END AS findability,
             CASE WHEN doc_id % 7 = 0 THEN 'core' ELSE source END AS ownerid,
             source AS owner,
             CAST(n_chars AS DOUBLE) AS bytes
      FROM documents
    ),
    filt AS (
      SELECT * FROM ds
      WHERE (findability = 'published' OR ownerid = 'src3')  -- RLS
        AND lower(owner) IN ('src3', 'src5')                 -- analyzed match
    ),
    sc AS (
      SELECT *, CASE WHEN ownerid = 'core' AND findability = 'published'
                     THEN 4.5 ELSE 0.0 END AS score
      FROM filt
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS total,
             ROUND(SUM(bytes), 2)     AS total_bytes
      FROM filt
    ),
    page AS (
      SELECT id, title, findability, owner, bytes
      FROM sc ORDER BY score DESC, id LIMIT 20 OFFSET 5
    )
    SELECT page.*, s.total, s.total_bytes FROM page, s
    """,
)
def api_dataset_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset kind on TRUE NESTED DATA, end-to-end through the
    API: documents are wrapped into the reference's datahub shape
    (nested datahub.findability / ownerid / owner / stats.bytes,
    reference/tests/test_controllers.py:13-61), then one search runs
    visibility on a struct path, an analyzed match filter on
    datahub.owner, the core-owner boost ordering (4.5 requires
    published AND core), offset/size paging, and summary.totalBytes
    summed THROUGH datahub.stats.bytes — O2/O4/O5/O6/O8/O9/O10 on
    nested structs in one value-hashed envelope. The oracle mirrors
    the derivation flat (the analyzed match on a single-token field
    reduces to lowercase equality)."""
    d = _t(spark, sf_dir, "documents")
    mod3 = F.col("doc_id") % 3
    ds = d.select(
        F.col("doc_id").alias("id"),
        F.concat_ws("-", "lang", "doc_id").alias("title"),
        F.struct(
            F.when(mod3 == 0, "published")
            .when(mod3 == 1, "unpublished")
            .otherwise("private")
            .alias("findability"),
            F.when(F.col("doc_id") % 7 == 0, "core")
            .otherwise(F.col("source"))
            .alias("ownerid"),
            F.col("source").alias("owner"),
            F.struct(F.col("n_chars").cast("double").alias("bytes")).alias(
                "stats"
            ),
        ).alias("datahub"),
        F.struct(F.col("text").alias("readme")).alias("datapackage"),
    )
    engine = SearchEngine(
        spark,
        kinds={
            "dataset": KindConfig(
                table="datahub",
                id_field="id",
                findability_field="datahub.findability",
                owner_field="datahub.ownerid",
                # reference boosts (metastore/models.py:20-25); no q in
                # this request, so they only enable the static
                # core-boost ordering branch — no index is built
                q_fields={
                    "title": 5.0,
                    "datahub.owner": 2.0,
                    "datahub.ownerid": 1.0,
                    "datapackage.readme": 2.0,
                },
                filter_mode="match",
                bytes_field="datahub.stats.bytes",
                boost_owner_field="datahub.ownerid",
            )
        },
        dfs={"dataset": ds},
    )
    env = engine.search(
        "dataset",
        userid="src3",
        params={
            "size": "20",
            "from": "5",
            "datahub.owner": ['"src3"', '"src5"'],
        },
    )
    assert "error" not in env, env.get("error")
    rows = [
        (
            r["id"], r["title"], r["datahub"]["findability"],
            r["datahub"]["owner"], r["datahub"]["stats"]["bytes"],
            env["summary"]["total"], env["summary"]["totalBytes"],
        )
        for r in env["results"]
    ]
    out = spark.createDataFrame(rows, _PAGE_SCHEMA_DS)
    return out.withColumn("total_bytes", F.round("total_bytes", 2))


@query(
    "api_error_envelope",
    oracle="""
    SELECT true AS unknown_field_error,
           true AS bad_json_error,
           true AS unknown_kind_error,
           CAST(0 AS BIGINT) AS results_returned
    """,
)
def api_error_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O13 error containment at the driver tier: three malformed
    requests (unknown filter field, unquoted JSON value, unknown kind)
    must each produce the ERROR ENVELOPE — empty results plus an error
    string, never an exception (reference metastore/models.py:165-174).
    The oracle pins the contract as constants: any raised exception or
    silently-empty success flips a column or errors the query."""
    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "user_id")
    engine = SearchEngine(
        spark,
        kinds={
            "events": KindConfig(
                table="events",
                id_field="event_id",
                findability_field="event_type",
                owner_field="user_id",
                filter_mode="term",
                published_value="view",
            )
        },
        dfs={"events": e},
    )
    unknown_field = engine.search("events", None, {"no_such_col": '"x"'})
    bad_json = engine.search("events", None, {"event_type": "unquoted"})
    unknown_kind = engine.search("nope", None, {})
    rows = [
        (
            "error" in unknown_field and not unknown_field["results"],
            "error" in bad_json and not bad_json["results"],
            "error" in unknown_kind and not unknown_kind["results"],
            len(unknown_field["results"])
            + len(bad_json["results"])
            + len(unknown_kind["results"]),
        )
    ]
    return spark.createDataFrame(
        rows,
        "unknown_field_error boolean, bad_json_error boolean, "
        "unknown_kind_error boolean, results_returned bigint",
    )


@query(
    "docs_jsonl_source_roundtrip",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def docs_jsonl_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-format coverage, oracled end-to-end: the documents
    corpus is exported to JSON-lines (Spark's own writer — correct
    escaping for embedded quotes/newlines), a deliberately corrupt
    line is appended, and the table is re-ingested through
    ``sources.read_json_docs`` (explicit schema, PERMISSIVE mode,
    corrupt-record quarantine). The per-source rollup of the
    re-ingested rows must equal the parquet source of truth — which
    both proves the JSONL round-trip loses nothing AND that the
    corrupt row landed in the quarantine column instead of polluting
    an aggregate. The reference ingests exactly this shape of
    schema-flexible JSON (its README declines to define document
    structure); at scale the reader is line-splittable and
    inference-free, so ingest parallelizes like any parquet scan."""
    import os
    import shutil
    import tempfile

    from metastore_spark.sources.documents import read_json_docs

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    out = tempfile.mkdtemp(prefix="jsonl_src_")
    try:
        d.coalesce(4).write.mode("overwrite").json(out)
        # a separate file, NOT an append: Spark's writer leaves .crc
        # sidecars and an in-place append trips the checksum reader
        with open(os.path.join(out, "part-zz-corrupt.json"), "w") as fh:
            fh.write('{"doc_id": broken not-json\n')
        back = read_json_docs(
            spark,
            out,
            schema="doc_id bigint, text string, lang string,"
            " source string, n_chars bigint",
        )
        res = (
            back.filter(F.col("_corrupt").isNull())
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
            )
            .orderBy("source")
        )
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "api_events_envelope_snapshot",
    oracle="""
    WITH victim AS (
      SELECT MIN(user_id) AS u FROM events WHERE event_type = 'click'
    ),
    base AS (
      SELECT event_id, user_id, event_type, EPOCH_US(ts) AS ts_us,
             ROUND(value, 2) AS value
      FROM events, victim
      WHERE user_id IS DISTINCT FROM u                -- GDPR-erased head
    ),
    filt AS (
      SELECT * FROM base
      WHERE (event_type = 'view' OR user_id = 7)      -- visibility (RLS)
        AND event_type IN ('view', 'purchase')        -- term filter, OR-within
        AND user_id IN (3, 7)                         -- AND-across fields
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS total,
             ROUND(SUM(value), 2)     AS total_bytes
      FROM filt
    ),
    page AS (
      SELECT event_id, user_id, event_type, ts_us, value
      FROM filt ORDER BY ts_us DESC, event_id LIMIT 25 OFFSET 10
    )
    SELECT page.*, s.total, s.total_bytes FROM page, s
    """,
)
def api_events_envelope_snapshot(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The reference's events envelope (O1-O10: visibility, term
    filters, ts sort, page, total/totalBytes summary) SERVED FROM THE
    SNAPSHOT TABLE FORMAT: the SearchEngine's events frame is the
    serving store's head — the post-GDPR-erasure snapshot that
    streaming ingest + compaction + a COW delete committed
    (queries_snapshots._serving_store). Same request as
    api_events_envelope; the oracle recomputes the head state (victim
    excluded, NULL-safe) from the raw corpus and the identical
    envelope on top.

    This is the substrate claim made concrete: the reference's one
    mutating table answers its production API from snapshot commits —
    a reader mid-erasure sees the old version or the new one, never a
    half-rewritten directory, and pinned replays of past envelopes
    stay reproducible."""
    from metastore_spark.queries_snapshots import _serving_store
    from metastore_spark.sources import snapshots as snap

    root, _victim = _serving_store(spark, sf_dir)
    e = snap.read_snapshot(spark, root).select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        F.round("value", 2).alias("value"),
    )
    engine = SearchEngine(
        spark,
        kinds={
            "events": KindConfig(
                table="events",
                id_field="event_id",
                findability_field="event_type",
                owner_field="user_id",
                timestamp_field="ts_us",
                filter_mode="term",
                bytes_field="value",
                published_value="view",
            )
        },
        dfs={"events": e},
    )
    env = engine.search(
        "events",
        userid=7,
        params={
            "size": "25",
            "from": "10",
            "sort": '"desc"',
            "event_type": ['"view"', '"purchase"'],
            "user_id": ["3", "7"],
        },
    )
    assert "error" not in env, env.get("error")
    rows = [
        (
            r["event_id"], r["user_id"], r["event_type"], r["ts_us"],
            r["value"], env["summary"]["total"], env["summary"]["totalBytes"],
        )
        for r in env["results"]
    ]
    out = spark.createDataFrame(rows, _PAGE_SCHEMA_EVENTS)
    return out.withColumn("total_bytes", F.round("total_bytes", 2))
