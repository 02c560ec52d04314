from crawleria_spark.streaming.pipeline import (
    hourly_metrics_stream,
    read_fetch_log_stream,
    sessionize_hosts_stream,
)

__all__ = [
    "read_fetch_log_stream",
    "hourly_metrics_stream",
    "sessionize_hosts_stream",
]
