from crawleria_spark.streaming.pipeline import (
    hourly_metrics_stream,
    read_fetch_log_stream,
    sessionize_hosts_stream,
    stream_crawl_documents,
    stream_crawl_fetch_log,
)

__all__ = [
    "read_fetch_log_stream",
    "hourly_metrics_stream",
    "sessionize_hosts_stream",
    "stream_crawl_documents",
    "stream_crawl_fetch_log",
]
