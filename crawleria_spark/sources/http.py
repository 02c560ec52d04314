"""Real HTTP fetcher behind the engine's injectable fetcher interface.

Production twin of the reference's network scrape (``crawl_url`` via the
Firecrawl API, src/crawler/crawler.py:73-135): stdlib urllib (no extra
deps on executors), returning the same payload shape as the synthetic
fetcher — ``{status, error, spans, links}`` — so the whole crawl round
spec (dedup, robots, politeness, budget, discovery ordinals) is
identical regardless of which fetcher is injected.

Pieces the reference implements that map here:

- auth/session setup (``setup_authentication`` + cookie load,
  src/crawler/crawler.py:45-71): ``CrawlConfig.cookies_for(host)`` is
  sent as the ``Cookie`` header; ``user_agent`` as ``User-Agent``.
- retry w/ backoff (``safe_request``, src/utils.py:98-118): the fetcher
  RAISES on transport/HTTP errors and lets ``fetch_stage`` apply the
  in-UDF retry + error-row-tolerance policy (one policy for every
  fetcher, not one per fetcher).
- content extraction (Firecrawl returns markdown/html/links): a
  deterministic stdlib ``html.parser`` pass emits interleaved spans
  ``(kind, text, media_ref, offset)`` over the reference's element
  vocabulary (heading/paragraph/link/button/table/form/image) and the
  on-page link list in document order — the order the crawl round spec
  assigns discovery ordinals by.

Scale shape: the fetcher runs inside ``fetch_stage``'s ``mapInPandas``,
one row at a time within an Arrow batch — network-bound work on
executors, zero driver involvement; per-host politeness ordering is
already pinned by the politeness_slot column (and honored in wall-clock
mode by fetch_stage).

``proxy_to`` routes every request to a fixed address while preserving
the URL's host in the ``Host`` header — the test hook that lets an
in-process HTTP server impersonate the whole synthetic web (it is also
how a production forward-proxy / fetch-fleet deployment would plug in).
"""

from __future__ import annotations

import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable
from html.parser import HTMLParser

# tags whose subtree becomes ONE span of the corresponding kind
_BLOCK_KINDS = {
    "h1": "heading", "h2": "heading", "h3": "heading",
    "h4": "heading", "h5": "heading", "h6": "heading",
    "title": "heading",
    "p": "paragraph",
    "button": "button",
    "table": "table",
    "form": "form",
}


class _SpanParser(HTMLParser):
    """HTML → interleaved spans + on-page link list (document order).

    Deterministic simplifications (documented, test-pinned): block tags
    of interest do not nest into separate spans (inner text flattens
    into the enclosing span); <a> and <img> are inline — an <a> inside a
    paragraph emits its own link span at the current position AND
    contributes its anchor text to the paragraph.
    """

    def __init__(self, base_url: str):
        super().__init__(convert_charrefs=True)
        self.base = base_url
        self.spans: list[dict] = []
        self.links: list[str] = []
        self._stack: list[tuple[str, list[str]]] = []  # (kind, text parts)
        self._link_text: list[str] | None = None
        self._link_href: str | None = None

    def _emit(self, kind: str, text: str, media_ref: str | None) -> None:
        self.spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref,
             "offset": len(self.spans)}
        )

    def handle_starttag(self, tag, attrs):
        if tag in _BLOCK_KINDS:
            self._stack.append((_BLOCK_KINDS[tag], []))
        elif tag == "a":
            href = dict(attrs).get("href")
            self._link_href = (
                urllib.parse.urljoin(self.base, href) if href else None
            )
            self._link_text = []
        elif tag == "img":
            a = dict(attrs)
            src = a.get("src")
            ref = urllib.parse.urljoin(self.base, src) if src else None
            # absent alt stays None (distinct from alt="")
            self._emit("image", a.get("alt"), ref)

    def handle_endtag(self, tag):
        if tag in _BLOCK_KINDS and self._stack:
            kind, parts = self._stack.pop()
            text = " ".join(" ".join(parts).split())
            if self._stack:  # nested block: flatten into the parent
                self._stack[-1][1].append(text)
            else:
                self._emit(kind, text, None)
        elif tag == "a" and self._link_text is not None:
            text = " ".join(" ".join(self._link_text).split())
            # href-less <a> is still a link-KIND span (media_ref None)
            # but contributes nothing to the crawl's link list
            self._emit("link", text, self._link_href)
            if self._link_href:
                self.links.append(self._link_href)
            if self._stack:  # anchor text also flows into the block
                self._stack[-1][1].append(text)
            self._link_text = None
            self._link_href = None

    def handle_data(self, data):
        if self._link_text is not None:
            self._link_text.append(data)
        elif self._stack:
            self._stack[-1][1].append(data)


def html_to_payload(html: str, base_url: str) -> dict:
    """Parse HTML into the fetcher payload shape (pure, deterministic)."""
    parser = _SpanParser(base_url)
    parser.feed(html)
    parser.close()
    return {"status": "ok", "error": None,
            "spans": parser.spans, "links": parser.links}


def http_fetcher(
    config,
    timeout_s: float = 10.0,
    proxy_to: str | None = None,
) -> Callable[[str], dict]:
    """url -> payload over real HTTP.

    Raises on transport errors / HTTP >= 400 — ``fetch_stage`` owns the
    retry/backoff and converts final failures into error rows. Non-HTML
    ``text/*`` responses become a single paragraph span; other content
    types a single image span referencing the URL (the binary itself is
    the media pipeline's job, reference processor.py).
    """

    def fetch(url: str) -> dict:
        parts = urllib.parse.urlsplit(url)
        target = url
        headers = {"User-Agent": config.user_agent}
        if proxy_to is not None:
            target = urllib.parse.urlunsplit(
                ("http", proxy_to, parts.path, parts.query, "")
            )
            headers["Host"] = parts.netloc
        cookie = config.cookies_for(parts.hostname or "")
        if cookie:
            headers["Cookie"] = cookie
        req = urllib.request.Request(target, headers=headers)
        # urllib raises HTTPError for >=400 and URLError on timeouts —
        # exactly the "raise and let the stage retry" contract.
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            ctype = resp.headers.get("Content-Type", "")
            body = resp.read()
        if "html" in ctype:
            return html_to_payload(
                body.decode("utf-8", errors="replace"), base_url=url
            )
        if ctype.startswith("text/"):
            text = " ".join(body.decode("utf-8", errors="replace").split())
            return {
                "status": "ok", "error": None, "links": [],
                "spans": [{"kind": "paragraph", "text": text,
                           "media_ref": None, "offset": 0}],
            }
        return {
            "status": "ok", "error": None, "links": [],
            "spans": [{"kind": "image", "text": "",
                       "media_ref": url, "offset": 0}],
        }

    fetch.deterministic = False  # network faults are transient: retry
    return fetch


def render_payload_html(payload: dict, title: str | None = None) -> str:
    """Inverse of html_to_payload for span payloads (used by the test
    server to serve the synthetic world over real HTTP; also a handy
    export). Round-trip property: html_to_payload(render_payload_html(p))
    reproduces p's spans and links exactly."""
    from html import escape

    tag_for = {"heading": "h2", "paragraph": "p", "button": "button",
               "table": "table", "form": "form"}
    out = ["<html><head>"]
    if title:
        out.append(f"<title>{escape(title)}</title>")
    out.append("</head><body>")
    for s in payload.get("spans", []):
        kind, ref = s["kind"], s.get("media_ref")
        raw_text = s.get("text")
        text = escape(raw_text or "")
        if kind == "link":
            href = f' href="{escape(ref, quote=True)}"' if ref else ""
            out.append(f"<a{href}>{text}</a>")
        elif kind == "image":
            src = f' src="{escape(ref, quote=True)}"' if ref else ""
            # absent alt ⇔ text None (alt="" would parse back as "")
            alt = f' alt="{escape(raw_text, quote=True)}"' if raw_text is not None else ""
            out.append(f"<img{src}{alt}>")
        else:
            out.append(f"<{tag_for[kind]}>{text}</{tag_for[kind]}>")
    out.append("</body></html>")
    return "".join(out)
