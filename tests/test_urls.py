"""URL canonicalization / registrable domain / revisit dedup
(functions/urls.py) — hand-computed goldens and plan-shape checks."""

import datetime

import pytest
from pyspark.sql import functions as F

from light_splade_spark.functions import urls


@pytest.fixture(scope="module")
def spark():
    from light_splade_spark.session import get_spark
    return get_spark(app_name="test-urls", master="local[4]",
                     extra_conf={"spark.sql.shuffle.partitions": "8"})


def _canon(spark, raw: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in raw], "u STRING")
    return [r["c"] for r in
            df.select(urls.canonical_url("u").alias("c")).collect()]


def test_canonical_url_golden(spark):
    cases = [
        # scheme+host lowercased, default port stripped, fragment dropped
        ("HTTP://WWW.Example.COM:80/Path#frag", "http://www.example.com/Path"),
        ("https://a.b:443/x", "https://a.b/x"),
        # non-default port kept
        ("http://a.b:8080/x", "http://a.b:8080/x"),
        # tracking params dropped (utm_* + named ids), rest sorted
        ("http://a.b/p?utm_source=f&b=2&a=1&gclid=g", "http://a.b/p?a=1&b=2"),
        ("http://a.b/p?b=2&a=1", "http://a.b/p?a=1&b=2"),
        # all params tracking -> no '?'
        ("http://a.b/p?utm_medium=m&fbclid=z", "http://a.b/p"),
        # bare 'ref' is content-selecting on common sites — preserved
        ("http://a.b/f?ref=main&ref_src=tw", "http://a.b/f?ref=main"),
        # bare-root slash dropped; deeper trailing slash preserved
        ("http://a.b/", "http://a.b"),
        ("http://a.b/p/", "http://a.b/p/"),
        # path case preserved (RFC 3986: path is case-significant)
        ("http://a.b/CaseSensitive", "http://a.b/CaseSensitive"),
        # non-URL strings pass through trimmed
        ("  not a url  ", "not a url"),
    ]
    got = _canon(spark, [c[0] for c in cases])
    for (raw, want), g in zip(cases, got):
        assert g == want, (raw, g, want)


def test_registrable_domain(spark):
    cases = [
        ("http://www.news.example.co.uk:8080/x", "example.co.uk"),
        ("https://a.b.example.com/y", "example.com"),
        ("sub.pages.com.au", "pages.com.au"),
        ("localhost", "localhost"),
        ("WWW.Example.ORG", "example.org"),
        # scheme-less inputs get the same authority cut
        ("sub.example.com/page", "example.com"),
        ("example.com:8080/x", "example.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u STRING")
    got = [r["d"] for r in
           df.select(urls.registrable_domain("u").alias("d")).collect()]
    for (raw, want), g in zip(cases, got):
        assert g == want, (raw, g, want)


def test_url_dedup_keeps_latest(spark):
    ts = datetime.datetime
    rows = [
        (1, "HTTP://A.B/p?b=2&a=1", ts(2024, 1, 1)),
        (2, "http://a.b/p?a=1&b=2&utm_source=x", ts(2024, 3, 1)),
        (3, "http://a.b:80/p?a=1&b=2#f", ts(2024, 2, 1)),
        (4, "http://other.c/q", ts(2024, 1, 1)),
        # tie on ts -> larger doc_id survives
        (5, "http://tie.d/", ts(2024, 5, 1)),
        (6, "http://tie.d", ts(2024, 5, 1)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, url STRING, warc_ts TIMESTAMP")
    out = urls.url_dedup(df, "url", "warc_ts", id_col="doc_id")
    got = {r["canon_url"]: r["doc_id"] for r in out.collect()}
    assert got == {
        "http://a.b/p?a=1&b=2": 2,   # latest of the 3-variant family
        "http://other.c/q": 4,
        "http://tie.d": 6,           # ts tie -> max doc_id
    }
    # map-side until the single window shuffle; no Python anywhere
    # (inspect the AQE FINAL plan only — the Initial Plan section repeats
    # the Exchange node)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Python" not in final
    assert final.count("Exchange") == 1, final


def test_url_dedup_null_and_unparseable_pass_through(spark):
    """NULL and scheme-less urls are not revisit candidates: every such
    row survives untouched (canon_url NULL) instead of collapsing into
    one skew group with a single survivor."""
    ts = datetime.datetime
    rows = [
        (1, None, ts(2024, 1, 1)),
        (2, None, ts(2024, 1, 2)),
        (3, "not a url", ts(2024, 1, 1)),
        (4, "not a url", ts(2024, 1, 2)),
        (5, "http://a.b/x", ts(2024, 1, 1)),
        (6, "http://a.b/x", ts(2024, 1, 2)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, url STRING, warc_ts TIMESTAMP")
    out = urls.url_dedup(df, "url", "warc_ts", id_col="doc_id").collect()
    got = {r["doc_id"]: r["canon_url"] for r in out}
    assert set(got) == {1, 2, 3, 4, 6}      # only the real revisit deduped
    assert got[6] == "http://a.b/x"
    assert all(got[d] is None for d in (1, 2, 3, 4))
