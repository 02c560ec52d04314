"""Structured-Streaming pipeline: watermarked windowed rollups and the
stateful host-sessionization operator, driven with availableNow triggers
over file streams (batch parity asserted against the static twin)."""

import pytest
from pyspark.sql import functions as F

from crawleria_spark.streaming import hourly_metrics_stream, sessionize_hosts_stream


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = str(tmp_path_factory.mktemp("events_stream"))
    src.write.mode("overwrite").parquet(d)
    return d


def _run_stream(df, tmp_path, mode="append"):
    out_name = f"mem_{abs(hash(str(tmp_path))) % 10**8}"
    q = (
        df.writeStream.format("memory")
        .queryName(out_name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return out_name


def test_hourly_metrics_stream(spark, events_dir, tmp_path):
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    rolled = hourly_metrics_stream(stream)
    name = _run_stream(rolled, tmp_path)
    got = {
        (r["window_start"].isoformat(), r["event_type"]): (r["n"], r["value_cents"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    # batch twin
    want_df = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value") * 100)).cast("long").alias("value_cents"),
        )
        .select(F.col("win.start").alias("ws"), "event_type", "n", "value_cents")
    )
    want = {
        (r["ws"].isoformat(), r["event_type"]): (r["n"], r["value_cents"])
        for r in want_df.collect()
    }
    # availableNow + watermark: windows older than the final watermark are
    # emitted; the trailing window(s) may be withheld. Emitted ⊆ batch and
    # the bulk of windows must be present.
    assert got and set(got) <= set(want)
    assert all(want[k] == v for k, v in got.items())
    assert len(got) >= len(want) - 4


def test_sessionize_hosts_stream(spark, events_dir, tmp_path):
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    sessions = sessionize_hosts_stream(stream, gap_minutes=30)
    name = _run_stream(sessions, tmp_path)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    # sessions only close via timeout; with a single availableNow batch the
    # state may still be open — the operator must at least run clean and
    # any emitted session must be well-formed
    for r in rows:
        assert r["session_fetches"] > 0
        assert r["session_start"] <= r["session_end"]


def test_stream_crawl_fetch_log(spark, tmp_path):
    """Tail the engine's fetch_log as rounds commit: rows appear after
    each committed round, exactly once."""
    from crawleria_spark.config import CrawlConfig
    from crawleria_spark.plans.engine import CrawlEngine
    from crawleria_spark.plans.snapshot import SnapshotCatalog
    from crawleria_spark.sources.fetch import synthetic_fetcher
    from crawleria_spark.streaming import stream_crawl_fetch_log
    from crawleria_spark.synthetic.world import WorldConfig, seed_urls

    world = WorldConfig(seed=9, n_hosts=4, pages_per_host=10)
    root = str(tmp_path / "cat")
    eng = CrawlEngine(
        spark, SnapshotCatalog(spark, root),
        CrawlConfig(max_depth=1, max_pages=12), synthetic_fetcher(world),
    )
    eng.init(seed_urls(world, n=2))
    eng.run_round()

    def drain():
        q = (
            stream_crawl_fetch_log(spark, root)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(str(tmp_path / "out")).count()

    n1 = drain()
    assert n1 == eng.catalog.read("fetch_log").count() > 0
    eng.run_round()  # commit another round → new directory appears
    n2 = drain()
    assert n2 == eng.catalog.read("fetch_log").count() > n1


def test_stream_never_sees_unpublished_commit(spark, tmp_path):
    """All-or-nothing visibility for streams: a parquet delta directory
    written WITHOUT a manifest publish (crash between _write_dir and the
    rename) is never ingested; gc prunes dangling published links."""
    import os

    from crawleria_spark.plans.engine import FETCH_LOG_SCHEMA
    from crawleria_spark.plans.snapshot import SnapshotCatalog
    from crawleria_spark.streaming import stream_crawl_fetch_log

    root = str(tmp_path / "cat")
    cat = SnapshotCatalog(spark, root)
    row = [("https://h/x", "h", 0, 0, 0, "ok", None)]
    df = spark.createDataFrame(row, FETCH_LOG_SCHEMA)
    cat.commit(append={"fetch_log": df})                 # committed round
    cat._write_dir("fetch_log", df, version=999)         # orphan: no manifest

    q = (
        stream_crawl_fetch_log(spark, root)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 1  # not 2

    # gc after a superseding commit prunes any dangling published links
    cat.commit(append={"fetch_log": df})
    pub = cat.published_path("fetch_log")
    n_links = len(os.listdir(pub))
    cat.gc(keep_last=1)
    remaining = os.listdir(pub)
    assert all(os.path.exists(os.path.join(pub, l)) for l in remaining)
    assert len(remaining) <= n_links


def test_publish_is_idempotent_from_manifest(spark, tmp_path):
    """Crash window: a crash AFTER the manifest rename but BEFORE the
    symlink loop must not leave a committed append dir unpublished
    forever — the next commit (of any table) re-links every missing dir
    recorded in the manifest's `published` map (ADVICE r2)."""
    import os

    from crawleria_spark.plans.engine import FETCH_LOG_SCHEMA
    from crawleria_spark.plans.snapshot import SnapshotCatalog

    root = str(tmp_path / "cat")
    cat = SnapshotCatalog(spark, root)
    row = [("https://h/x", "h", 0, 0, 0, "ok", None)]
    df = spark.createDataFrame(row, FETCH_LOG_SCHEMA)
    cat.commit(append={"fetch_log": df})
    pub = cat.published_path("fetch_log")
    # simulate the crash: manifest committed, symlink lost
    (link,) = os.listdir(pub)
    os.remove(os.path.join(pub, link))
    # a later commit of a DIFFERENT table heals the missing link
    cat.commit(append={"metrics": spark.createDataFrame(
        [(0, -1, 1, 0, 1, 0, 0, 1)],
        "round int, partition int, n_dequeued long, n_deduped long, "
        "n_fetched long, n_errors long, n_discovered long, wall_ms long",
    )})
    links = os.listdir(pub)
    assert link in links and len(links) == 1
    # and a compact/replace of the append table does NOT re-publish its
    # rewrite dir (the stream already ingested the original deltas)
    cat.compact("fetch_log")
    cat.commit(append={"fetch_log": df})
    compacted_dir = os.path.basename(cat.latest_manifest()["tables"]["fetch_log"][0])
    assert compacted_dir not in os.listdir(pub)


def test_stream_crawl_documents_across_rounds(spark, tmp_path):
    """Tail the documents table across two committed rounds: each
    round's span documents appear exactly once, with the full nested
    span schema intact — the incremental-ingest hook for downstream
    training-data consumers."""
    from pyspark.sql import functions as F

    from crawleria_spark.config import CrawlConfig
    from crawleria_spark.plans.engine import CrawlEngine
    from crawleria_spark.plans.snapshot import SnapshotCatalog
    from crawleria_spark.sources.fetch import synthetic_fetcher
    from crawleria_spark.streaming import stream_crawl_documents
    from crawleria_spark.synthetic.world import WorldConfig, seed_urls

    world = WorldConfig(seed=13, n_hosts=4, pages_per_host=10)
    root = str(tmp_path / "cat")
    eng = CrawlEngine(
        spark, SnapshotCatalog(spark, root),
        CrawlConfig(max_depth=2, max_pages=16), synthetic_fetcher(world),
    )
    eng.init(seed_urls(world, n=2))
    eng.run_round()

    def drain():
        q = (
            stream_crawl_documents(spark, root)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(str(tmp_path / "out"))

    got1 = drain()
    committed1 = eng.catalog.read("documents")
    assert got1.count() == committed1.count() > 0
    eng.run_round()  # round 2 commits a new delta directory
    got2 = drain()
    committed2 = eng.catalog.read("documents")
    assert got2.count() == committed2.count() > got1.count()
    # exactly-once + schema integrity: same doc_ids, spans readable
    assert sorted(r["doc_id"] for r in got2.collect()) == sorted(
        r["doc_id"] for r in committed2.collect()
    )
    n_spans_stream = got2.select(F.explode("spans")).count()
    n_spans_batch = committed2.select(F.explode("spans")).count()
    assert n_spans_stream == n_spans_batch > 0
