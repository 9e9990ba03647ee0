from metastore_spark.operators.filters import (
    filters_predicate,
    match_predicate,
    term_predicate,
    visibility_predicate,
)
from metastore_spark.operators.paging import paginate
from metastore_spark.operators.envelope import Envelope, run_envelope

__all__ = [
    "filters_predicate",
    "match_predicate",
    "term_predicate",
    "visibility_predicate",
    "paginate",
    "Envelope",
    "run_envelope",
]
