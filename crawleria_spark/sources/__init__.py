from crawleria_spark.sources.fetch import (
    FETCH_RESULT_FIELDS,
    SPAN_SCHEMA,
    fetch_stage,
    synthetic_fetcher,
    with_spans_column,
)

__all__ = [
    "SPAN_SCHEMA",
    "FETCH_RESULT_FIELDS",
    "fetch_stage",
    "synthetic_fetcher",
    "with_spans_column",
]
