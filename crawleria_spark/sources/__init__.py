from crawleria_spark.sources.fetch import SPAN_SCHEMA, FETCH_RESULT_FIELDS, fetch_stage, synthetic_fetcher

__all__ = ["SPAN_SCHEMA", "FETCH_RESULT_FIELDS", "fetch_stage", "synthetic_fetcher"]
