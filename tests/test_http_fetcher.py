"""Real HTTP fetcher (sources/http.py): round-trip parity with the
synthetic round spec over an in-process HTTP server, cookie delivery,
and error-row tolerance on 5xx / timeouts. No external network."""

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from crawleria_spark.config import CrawlConfig
from crawleria_spark.plans.engine import CrawlEngine
from crawleria_spark.plans.snapshot import SnapshotCatalog
from crawleria_spark.sources.fetch import synthetic_fetcher
from crawleria_spark.sources.http import (
    html_to_payload,
    http_fetcher,
    render_payload_html,
)
from crawleria_spark.synthetic.world import (
    WorldConfig,
    page_for_url,
    robots_rules,
    seed_urls,
)

# dup_variant_prob=0: URL fragments don't survive a real HTTP request
# (the client strips them), and the synthetic world derives pages from
# the RAW url string — fragment variants are covered by the synthetic
# parity suite; this suite covers the transport.
WORLD = WorldConfig(
    seed=7, n_hosts=5, pages_per_host=30, mean_links=5,
    error_rate=0.05, dup_variant_prob=0.0, long_path_prob=0.0,
)
CONFIG = CrawlConfig(
    max_depth=2, max_pages=30, max_concurrent_per_host=4,
    cookies=(("h1.example.org", "session=abc123"),),
)


class _WorldHandler(BaseHTTPRequestHandler):
    """Serves the synthetic world over real HTTP: reconstructs the raw
    URL from Host header + path, renders the payload as HTML. World
    error pages become 500s; /hang sleeps past the client timeout."""

    cookies_seen: dict[str, set] = {}

    def do_GET(self):  # noqa: N802 (http.server API)
        host = self.headers.get("Host", "")
        _WorldHandler.cookies_seen.setdefault(host, set()).add(
            self.headers.get("Cookie")
        )
        if self.path == "/hang":
            time.sleep(3)
            self.send_response(200)
            self.end_headers()
            return
        url = f"https://{host}{self.path}"
        payload = page_for_url(url, WORLD)
        if payload["status"] == "error":
            self.send_response(500)
            self.end_headers()
            return
        body = render_payload_html(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence
        pass


@pytest.fixture(scope="module")
def world_server():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _WorldHandler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_html_payload_round_trip():
    """render → parse reproduces spans and links exactly, for every
    span kind the world emits."""
    for i in range(40):
        url = f"https://h2.example.org/p/{i}"
        payload = page_for_url(url, WORLD)
        if payload["status"] != "ok":
            continue
        back = html_to_payload(render_payload_html(payload), base_url=url)
        assert back["spans"] == payload["spans"], url
        assert back["links"] == payload["links"], url


def test_direct_fetch_and_errors(world_server):
    fetch = http_fetcher(CONFIG, timeout_s=0.8, proxy_to=world_server)
    # find one ok and one error page in the world
    ok_url = err_url = None
    for i in range(60):
        u = f"https://h3.example.org/p/{i}"
        if page_for_url(u, WORLD)["status"] == "ok":
            ok_url = ok_url or u
        else:
            err_url = err_url or u
    payload = fetch(ok_url)
    assert payload == page_for_url(ok_url, WORLD)
    with pytest.raises(Exception):  # 500 → raise (fetch_stage retries)
        fetch(err_url)
    with pytest.raises(Exception):  # timeout → raise
        fetch("https://h3.example.org/hang")


def _crawl_state(spark, root, fetcher):
    eng = CrawlEngine(
        spark,
        SnapshotCatalog(spark, root),
        CONFIG,
        fetcher,
        robots_rows=robots_rules(WORLD),
    )
    eng.crawl(seed_urls(WORLD, n=3), max_rounds=10)
    log = sorted(
        (r["url_canon"], r["round"], r["host"], r["politeness_slot"],
         r["seq_in_host"], r["status"])
        for r in eng.catalog.read("fetch_log").collect()
    )
    docs = sorted(
        (r["doc_id"], r["url_canon"],
         tuple((s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]))
        for r in eng.catalog.read("documents").collect()
    )
    seen = sorted(r["url_canon"] for r in eng.catalog.read("seen").collect())
    return log, docs, seen


def test_engine_parity_http_vs_synthetic(spark, tmp_path, world_server):
    """The full crawl round spec is fetcher-agnostic: same fetch_log
    (urls, rounds, slots, statuses), documents (span-exact), and seen
    set whether pages arrive from the synthetic function or over real
    HTTP. Error pages surface as error rows either way (the error TEXT
    differs by transport and is excluded)."""
    http_state = _crawl_state(
        spark, str(tmp_path / "http"),
        http_fetcher(CONFIG, timeout_s=10.0, proxy_to=world_server),
    )
    synth_state = _crawl_state(
        spark, str(tmp_path / "synth"), synthetic_fetcher(WORLD)
    )
    assert http_state == synth_state
    # cookie delivered to the configured host (and only there)
    seen = _WorldHandler.cookies_seen
    assert "session=abc123" in seen.get("h1.example.org", set())
    for host, cookies in seen.items():
        if host != "h1.example.org":
            assert cookies == {None}, host
