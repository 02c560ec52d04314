"""Structured-Streaming variants of the crawl telemetry pipeline.

The crawl loop itself is batch rounds (SURVEY.md §1.2: the reference's
loop maps to iterative checkpointed DataFrame jobs, not a stream). What
IS naturally streaming is the telemetry the crawl emits: the fetch_log
appended each round is a file stream, and downstream consumers want
watermarked windowed rollups (fetch rates, error rates per host) without
re-reading history. These mirror the batch twins in __spark_entry__
(q_events_hourly / q_metrics_rollup) — same logic, `readStream` instead
of `read`, exactly-once via checkpointLocation + file-source tracking.

Stateful custom logic (per-host crawl sessionization) uses
``applyInPandasWithState`` — the engine's pattern for operators Spark
lacks natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_fetch_log_stream(
    spark: SparkSession, log_dir: str, schema: T.StructType, ts_col: str = "fetched_at"
) -> DataFrame:
    """File-source stream over fetch-log parquet appends. Each round's
    committed directory is discovered exactly once (file-source log)."""
    return spark.readStream.schema(schema).parquet(log_dir)


def stream_crawl_fetch_log(spark: SparkSession, catalog_root: str) -> DataFrame:
    """Stream the CrawlEngine's fetch_log as rounds commit.

    Tails `<root>/published/fetch_log/*` — symlinks the snapshot catalog
    creates strictly AFTER each manifest rename — so the stream observes
    the catalog's all-or-nothing visibility contract: a parquet directory
    from a commit that crashed before publishing (or is still being
    written) is never linked and never ingested. Each committed round's
    directory is discovered exactly once (file-source tracking)."""
    from crawleria_spark.plans.engine import FETCH_LOG_SCHEMA

    return (
        spark.readStream.schema(FETCH_LOG_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .parquet(f"{catalog_root}/published/fetch_log/*")
    )


def stream_crawl_documents(spark: SparkSession, catalog_root: str) -> DataFrame:
    """Stream the CrawlEngine's span documents as rounds commit — the
    incremental-ingest hook for downstream training-data consumers
    (dedup/quality/packing stages pull each round's new documents
    without re-reading history).

    Same publication contract as ``stream_crawl_fetch_log``: tails
    `<root>/published/documents/*`, symlinked strictly AFTER the
    manifest rename, so a partially-committed round is never visible
    and each committed round's delta directory is discovered exactly
    once (file-source tracking)."""
    from crawleria_spark.plans.engine import DOCUMENTS_SCHEMA

    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .parquet(f"{catalog_root}/published/documents/*")
    )


def hourly_metrics_stream(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Watermarked tumbling-window rollup: late rows beyond the watermark
    are dropped, state is bounded (the scale requirement for an unbounded
    crawl log)."""
    # parquet round-trips timestamps as NTZ; watermarks need TimestampType
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value") * 100)).cast("long").alias("value_cents"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            key_col,
            "n",
            "value_cents",
        )
    )


_SESSION_STATE_SCHEMA = "n_fetches long, last_ts timestamp"
_SESSION_OUT_SCHEMA = (
    "user_id long, session_fetches long, session_start timestamp, session_end timestamp"
)


def sessionize_hosts_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Custom stateful operator: per-host fetch sessions closed after an
    inactivity gap (applyInPandasWithState with event-time timeout) —
    the politeness-budget analogue of a crawl scheduler's host cooldown."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_minutes * 60 * 1000

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            (n, start_ms, end_ms) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_fetches": [n],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                }
            )
            return
        n, start_ms, end_ms = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            ts_ms = (pdf[ts_col].astype("int64") // 1_000_000).to_numpy()
            n += len(pdf)
            lo, hi = int(ts_ms.min()), int(ts_ms.max())
            start_ms = lo if start_ms is None else min(start_ms, lo)
            end_ms = hi if end_ms is None else max(end_ms, hi)
        state.update((n, start_ms, end_ms))
        state.setTimeoutTimestamp(end_ms + gap_ms)
        yield pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "session_fetches": pd.Series([], dtype="int64"),
                "session_start": pd.Series([], dtype="datetime64[ns]"),
                "session_end": pd.Series([], dtype="datetime64[ns]"),
            }
        )

    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, f"{gap_minutes} minutes")
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType="n_fetches long, start_ms long, end_ms long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
