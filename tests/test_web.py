"""URL canonicalization (functions/web.py): each RFC 3986 §6 /
crawl-dedup rule, NULL propagation, schemeless inputs, host extraction."""

from pyspark.sql import functions as F

from datax_spark.functions.web import canonicalize_url, url_host


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(
        canonicalize_url("url").alias("c")).collect()]


def test_canonicalize_rules(spark):
    cases = {
        # case + www + default port + trailing slash + fragment
        "  HTTP://WWW.Site.COM:80/Page/#frag  ": "http://site.com/Page",
        "https://Host.com:443/a": "https://host.com/a",
        # non-default port kept; path case kept
        "http://host.com:8080/A/B": "http://host.com:8080/A/B",
        # query sorted, empties + tracking dropped
        "http://h.com/p?b=2&utm_source=x&a=1&&gclid=9&fbclid=1":
            "http://h.com/p?a=1&b=2",
        # bare '/' path collapses; '?' with nothing surviving drops
        "http://h.com/?utm_campaign=z": "http://h.com",
        # schemeless: text shape kept, query still normalized
        "h.com/p?b=1&a=2": "h.com/p?a=2&b=1",
        # other schemes: port untouched
        "ftp://H.com:80/f": "ftp://h.com:80/f",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values()), list(zip(cases, got))


def test_canonicalize_null_and_idempotent(spark):
    df = spark.createDataFrame([(None,), ("HTTP://A.com/x/?b=1&a=2#f",)],
                               "url string")
    out = df.select(canonicalize_url("url").alias("c"))
    vals = [r.c for r in out.collect()]
    assert vals[0] is None
    # canonicalizing a canonical URL is a fixpoint
    again = df.select(
        canonicalize_url(canonicalize_url("url")).alias("c")).collect()
    assert [r.c for r in again] == vals


def test_url_host(spark):
    df = spark.createDataFrame(
        [("HTTP://WWW.Sub.Site.com:8080/p?q=1",),
         ("https://plain.org/x",), ("noscheme.net/pp",)], "url string")
    hosts = [r.h for r in df.select(url_host("url").alias("h")).collect()]
    assert hosts == ["sub.site.com", "plain.org", "noscheme.net"]
