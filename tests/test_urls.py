"""Two-implementation parity: vectorized pandas URL functions vs the
scalar urllib twins (and vs the reference get_clean_filename semantics,
src/utils.py:38-60)."""

import pandas as pd
import pytest

from crawleria_spark.functions.urls import (
    canonicalize,
    canonicalize_series,
    clean_filename,
    clean_filename_series,
    host_of,
    host_series,
)

ADVERSARIAL = [
    "https://example.com",
    "https://example.com/",
    "https://example.com/a/b/c",
    "https://example.com/a/b/c/",
    "http://example.com:80/x",
    "https://example.com:443/x",
    "https://example.com:8443/x",
    "HTTPS://EXAMPLE.COM/Path/Stays",
    "https://example.com/p?q=1&r=2",
    "https://example.com/p#frag",
    "https://example.com/p?q=1#frag",
    "https://sub.domain.example.co.uk/deep/path",
    "https://example.com/" + "/".join(f"seg{i}" for i in range(30)),  # >100 chars → md5
    "https://example.com/_leading_underscore_",
    "https://example.com//double//slash//",
    "https://example.com/unicode/ünïcødé/路径",
    "ftp://files.example.com/pub/file.txt",
    "https://h1.example.org/p/42",
    "https://hub.example.com/private/p/7",
]


def test_clean_filename_parity():
    got = clean_filename_series(pd.Series(ADVERSARIAL)).tolist()
    want = [clean_filename(u) for u in ADVERSARIAL]
    assert got == want


def test_clean_filename_reference_semantics():
    # empty path → "home" (src/utils.py:53)
    assert clean_filename("https://example.com") == "example.com_home"
    assert clean_filename("https://example.com/") == "example.com_home"
    # '/'→'_', strip '_' (src/utils.py:51)
    assert clean_filename("https://example.com/a/b") == "example.com_a_b"
    # >100 chars → domain_md5[:10] (src/utils.py:56-58)
    long_url = "https://example.com/" + "x/" * 60
    out = clean_filename(long_url)
    assert out.startswith("example.com_") and len(out) == len("example.com_") + 10


def test_canonicalize_parity():
    got = canonicalize_series(pd.Series(ADVERSARIAL)).tolist()
    want = [canonicalize(u) for u in ADVERSARIAL]
    assert got == want


def test_canonicalize_semantics():
    assert canonicalize("HTTPS://EXAMPLE.COM/Path") == "https://example.com/Path"
    assert canonicalize("https://example.com") == "https://example.com/"
    assert canonicalize("https://example.com/a/") == "https://example.com/a"
    assert canonicalize("http://example.com:80/x") == "http://example.com/x"
    assert canonicalize("https://example.com:443/x") == "https://example.com/x"
    assert canonicalize("https://example.com:8443/x") == "https://example.com:8443/x"
    assert canonicalize("https://example.com/p#frag") == "https://example.com/p"
    assert canonicalize("https://example.com/p?q=1#f") == "https://example.com/p?q=1"
    # duplicate variants collapse
    variants = [
        "https://h1.example.org/p/3",
        "https://h1.example.org/p/3/",
        "https://h1.example.org/p/3#frag2",
        "https://H1.EXAMPLE.ORG/p/3",
    ]
    assert len({canonicalize(v) for v in variants}) == 1


def test_host_parity():
    got = host_series(pd.Series(ADVERSARIAL)).tolist()
    want = [host_of(u) for u in ADVERSARIAL]
    assert got == want


@pytest.mark.usefixtures("spark")
def test_spark_udfs(spark):
    from pyspark.sql import functions as F

    from crawleria_spark.functions.urls import doc_id_udf, url_canon_udf, url_hash_col

    df = spark.createDataFrame([(u,) for u in ADVERSARIAL], "url string")
    out = df.select(
        "url",
        doc_id_udf("url").alias("doc_id"),
        url_canon_udf("url").alias("url_canon"),
    ).withColumn("url_hash", url_hash_col("url_canon"))
    rows = {r["url"]: r for r in out.collect()}
    for u in ADVERSARIAL:
        assert rows[u]["doc_id"] == clean_filename(u)
        assert rows[u]["url_canon"] == canonicalize(u)
        assert isinstance(rows[u]["url_hash"], int)


# ---------------------------------------------------------------------------
# property-based parity (hypothesis): vectorized == urllib twin on random URLs
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_scheme = st.sampled_from(["http", "https", "ftp"])
_host = st.from_regex(r"[a-zA-Z0-9][a-zA-Z0-9.\-]{0,30}", fullmatch=True)
_port = st.sampled_from(["", ":80", ":443", ":8080"])
_pathseg = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABC0123456789._~ü路-", min_size=0, max_size=12
)
_path = st.lists(_pathseg, min_size=0, max_size=12).map(lambda segs: "/".join(segs))
_query = st.sampled_from(["", "?a=1", "?a=1&b=x", "?_=%20"])
_frag = st.sampled_from(["", "#f", "#frag/with/slash"])


@st.composite
def urls(draw):
    return (
        f"{draw(_scheme)}://{draw(_host)}{draw(_port)}/{draw(_path)}"
        f"{draw(_query)}{draw(_frag)}"
    )


@given(st.lists(urls(), min_size=1, max_size=40))
@settings(max_examples=150, deadline=None)
def test_property_vectorized_matches_urllib(url_list):
    s = pd.Series(url_list)
    assert clean_filename_series(s).tolist() == [clean_filename(u) for u in url_list]
    assert canonicalize_series(s).tolist() == [canonicalize(u) for u in url_list]
    assert host_series(s).tolist() == [host_of(u) for u in url_list]


def test_jvm_exprs_parity(spark):
    """JVM Column twins (url_canon_expr / doc_id_expr / host_expr) are
    byte-identical to the scalar urllib implementations — the crawl's
    discovery path and the headline doc_id query run these inside
    whole-stage codegen, so divergence would silently fork the seen set."""
    from pyspark.sql import functions as F

    from crawleria_spark.functions.urls import doc_id_expr, host_expr, url_canon_expr

    # ADVERSARIAL plus world-shaped URLs (variants, long paths)
    from crawleria_spark.synthetic.world import WorldConfig, page_for_url

    w = WorldConfig(seed=11, n_hosts=6, pages_per_host=40, dup_variant_prob=0.3,
                    long_path_prob=0.2, error_rate=0.0)
    urls = list(ADVERSARIAL)
    for i in range(60):
        urls.extend(page_for_url(f"https://h{i % 6}.example.org/p/{i}", w)["links"])
    urls = sorted(set(urls))
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url",
        url_canon_expr("url").alias("canon"),
        doc_id_expr("url").alias("doc_id"),
        host_expr("url").alias("host"),
    ).collect()
    for r in rows:
        assert r["canon"] == canonicalize(r["url"]), r["url"]
        assert r["doc_id"] == clean_filename(r["url"]), r["url"]
        assert r["host"] == host_of(r["url"]), r["url"]
