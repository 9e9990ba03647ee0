"""Port of the reference's test corpus generators
(tests/test_controllers.py:70-292 → FIXTURES.md) as Spark DataFrames.
"""

from __future__ import annotations

import datetime

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _datahub(owner="datahub", ownerid="datahub", findability="published",
             bytes_=10, name="innername", flowid=None):
    return {
        "name": name,
        "owner": owner,
        "ownerid": ownerid,
        "findability": findability,
        "flowid": flowid,
        "stats": {"rowcount": 5, "bytes": bytes_},
    }


_DATAHUB_T = StructType(
    [
        StructField("name", StringType()),
        StructField("owner", StringType()),
        StructField("ownerid", StringType()),
        StructField("findability", StringType()),
        StructField("flowid", StringType()),
        StructField(
            "stats",
            StructType(
                [
                    StructField("rowcount", LongType()),
                    StructField("bytes", LongType()),
                ]
            ),
        ),
    ]
)

_DATAPACKAGE_T = StructType(
    [
        StructField("readme", StringType()),
        StructField("not_readme", StringType()),
    ]
)


def dataset_schema(name_type=StringType(), title_type=StringType()) -> StructType:
    return StructType(
        [
            StructField("id", StringType()),
            StructField("name", name_type),
            StructField("title", title_type),
            StructField("description", StringType()),
            StructField("license", StringType()),
            StructField("loaded", BooleanType()),
            StructField("datahub", _DATAHUB_T),
            StructField("datapackage", _DATAPACKAGE_T),
        ]
    )


def make_datasets(spark: SparkSession, docs: list[dict],
                  name_type=StringType(), title_type=StringType()):
    schema = dataset_schema(name_type, title_type)
    filled = []
    for d in docs:
        filled.append(
            {
                "id": d.get("id"),
                "name": d.get("name"),
                "title": d.get("title"),
                "description": d.get("description"),
                "license": d.get("license"),
                "loaded": d.get("loaded"),
                "datahub": d.get("datahub") or _datahub(),
                "datapackage": d.get("datapackage")
                or {"readme": None, "not_readme": None},
            }
        )
    return spark.createDataFrame(filled, schema)


def some_records(spark: SparkSession, n: int):
    """tests/test_controllers.py:135-151: typed filters, nested path,
    totals. name=True (boolean!), title=i (numeric!)."""
    docs = [
        {
            "id": str(i),
            "name": True,
            "title": i,
            "license": f"str{i}",
            "datahub": _datahub(),
        }
        for i in range(n)
    ]
    return make_datasets(
        spark, docs, name_type=BooleanType(), title_type=IntegerType()
    )


WORDS = [
    "alpha", "braavo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet",
]


def real_looking_records(spark: SparkSession, n: int):
    """tests/test_controllers.py:70-73,170-185."""
    docs = [
        {
            "id": str(i),
            "name": f"dataset-{i}",
            "title": f"This dataset is number {WORDS[i % 10]}",
            "datahub": _datahub(owner=f"The owner of {WORDS[(i + 1) % 10]}"),
        }
        for i in range(n)
    ]
    return make_datasets(spark, docs)


def private_records(spark: SparkSession, with_readme: bool = False):
    """tests/test_controllers.py:187-230: owner × findability × content
    cross product. Anonymous sees 4; owner1 sees 6."""
    docs = []
    for owner in ("owner1", "owner2"):
        for findability in ("published", "private"):
            for content in ("cat", "dog"):
                d = {
                    "id": f"{owner}-{findability}-{content}",
                    "name": f"{owner}-{findability}-{content}",
                    "title": f"the {content} dataset of {owner}",
                    "datahub": _datahub(
                        owner=owner, ownerid=owner, findability=findability
                    ),
                }
                if with_readme:
                    d["datapackage"] = {
                        "readme": f"Full of {content}s data",
                        "not_readme": "badword",
                    }
                docs.append(d)
    return make_datasets(spark, docs)


def multiple_user_records(spark: SparkSession):
    """tests/test_controllers.py:232-252: core boost corpus —
    owners × findability, identical readmes."""
    docs = []
    for owner in ("core", "anonymous", "friend", "other"):
        for findability in ("published", "unlisted", "private"):
            docs.append(
                {
                    "id": f"{owner}-{findability}-dataset",
                    "name": f"{owner}-dataset" if findability == "published"
                    else f"{owner}-{findability}-dataset",
                    "title": "dataset",
                    "datahub": _datahub(
                        owner=owner, ownerid=owner, findability=findability
                    ),
                    "datapackage": {"readme": "readme", "not_readme": None},
                }
            )
    return make_datasets(spark, docs)


def stopword_records(spark: SparkSession):
    """tests/test_controllers.py:254-272."""
    titles = ["the Mauna Loa", "Mauna Loa", "The United States"]
    docs = [
        {"id": str(i), "name": f"d{i}", "title": t, "datahub": _datahub()}
        for i, t in enumerate(titles)
    ]
    return make_datasets(spark, docs)


EVENT_SCHEMA = StructType(
    [
        StructField("_event_id", StringType()),
        StructField("timestamp", TimestampType()),
        StructField("event_entity", StringType()),
        StructField("event_action", StringType()),
        StructField("owner", StringType()),
        StructField("ownerid", StringType()),
        StructField("dataset", StringType()),
        StructField("status", StringType()),
        StructField("messsage", StringType()),  # sic — reference spelling
        StructField("findability", StringType()),
        StructField("payload", MapType(StringType(), StringType())),
    ]
)


def some_event_records(spark: SparkSession, n: int):
    """tests/test_controllers.py:101-116: modular-arithmetic variety."""
    rows = []
    for i in range(n):
        rows.append(
            {
                "_event_id": f"e{i:04d}",
                "timestamp": datetime.datetime(2000 + i, 1, 1),
                "event_entity": "flow" if i % 3 else "login",
                "event_action": "finished" if i % 4 else "deleted",
                "owner": "datahub",
                "ownerid": "datahubid",
                "dataset": f"dataset{i}",
                "status": "OK",
                "messsage": "",
                "findability": "published" if i % 2 else "unlisted",
                "payload": {"flow-id": "datahub/dataset"},
            }
        )
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def event_records_with_datasets(spark: SparkSession, names: list[str]):
    """tests/test_controllers.py:118-133: exact keyword matching."""
    rows = [
        {
            "_event_id": f"e{i:04d}",
            "timestamp": datetime.datetime(2000, 1, 1),
            "event_entity": "flow",
            "event_action": "finished",
            "owner": "datahub",
            "ownerid": "datahubid",
            "dataset": name,
            "status": "OK",
            "messsage": "",
            "findability": "published",
            "payload": {},
        }
        for i, name in enumerate(names)
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def empty_datasets(spark: SparkSession):
    return make_datasets(spark, [])


def empty_events(spark: SparkSession):
    return spark.createDataFrame([], EVENT_SCHEMA)
