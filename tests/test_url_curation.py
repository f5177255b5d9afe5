"""Pins for URL normalization / registrable-domain logic
(operators/web.py::with_url_columns): each rule at its boundary."""

from __future__ import annotations

import pytest

from distributed_video_analytics_flink_spark.operators.web import with_url_columns

CASES = [
    # (raw, host, domain, norm)
    ("http://www.News.Example.co.uk:80/a/?utm_source=tw",
     "news.example.co.uk", "example.co.uk", "http://news.example.co.uk/a"),
    ("http://news.example.co.uk/a#section",
     "news.example.co.uk", "example.co.uk", "http://news.example.co.uk/a"),
    ("https://Example.COM:443/", "example.com", "example.com", "https://example.com/"),
    ("https://example.com:8443/x", "example.com:8443", "example.com:8443",
     "https://example.com:8443/x"),  # non-default port survives
    ("http://example.com", "example.com", "example.com", "http://example.com/"),
    ("http://example.com/p?utm_a=1&id=2&gclid=z&b=3",
     "example.com", "example.com", "http://example.com/p?id=2&b=3"),
    ("http://example.com/p?utm_a=1", "example.com", "example.com",
     "http://example.com/p"),
    ("http://sub.deep.example.org/q", "sub.deep.example.org", "example.org",
     "http://sub.deep.example.org/q"),
    ("http://example.co.uk/", "example.co.uk", "example.co.uk",
     "http://example.co.uk/"),
    ("http://example.com/a///", "example.com", "example.com",
     "http://example.com/a"),
    # r14 review: totality edges — single-label hosts must not throw
    # under ANSI element_at, and a slashes-only path is the root
    ("http://localhost/x", "localhost", "localhost", "http://localhost/x"),
    ("http://intranet:80/x", "intranet", "intranet", "http://intranet/x"),
    ("http://a//", "a", "a", "http://a/"),
    ("http://example.com//", "example.com", "example.com",
     "http://example.com/"),
]


@pytest.mark.parametrize("raw,host,domain,norm", CASES)
def test_url_normalization_rules(spark, raw, host, domain, norm):
    df = with_url_columns(spark.createDataFrame([(raw,)], "target_uri string"))
    r = df.select("host", "domain", "norm_url").collect()[0]
    assert (r.host, r.domain, r.norm_url) == (host, domain, norm)
