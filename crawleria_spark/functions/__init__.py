from crawleria_spark.functions.urls import (
    clean_filename,
    canonicalize,
    host_of,
    doc_id_expr,
    doc_id_udf,
    host_expr,
    url_canon_expr,
    url_canon_udf,
    url_host_udf,
    url_hash_col,
)

__all__ = [
    "clean_filename",
    "canonicalize",
    "host_of",
    "doc_id_expr",
    "doc_id_udf",
    "host_expr",
    "url_canon_expr",
    "url_canon_udf",
    "url_host_udf",
    "url_hash_col",
]
