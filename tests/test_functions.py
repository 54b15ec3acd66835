"""JVM column expressions must agree row-for-row with the Python kernel."""

from pyspark.sql import functions as F

from acrawler_spark import kernel as K
from acrawler_spark.functions.url import canonicalize_col, fingerprint_col, host_col
from acrawler_spark.functions.udfs import make_parse_page_udf

URLS = [
    "https://httpbin.org/cookies/set?name=crawler&age=18",
    "https://httpbin.org/cookies/set?age=18&name=crawler",
    "https://httpbin.org/cookies/set?age=18&name=crawler#fragment",
    "http://site0.test/p/0",
    "http://site0.test/p/4?b=2&a=1",
    "http://site0.test/p/4?a=1&b=2",
    "http://host.test",
    "http://host.test/#",
    "http://host.test/p/1#frag",
    "http://a.test/p?z=1&y=2&x=3",
]


def test_canonicalize_and_fingerprint_parity(spark):
    df = spark.createDataFrame([(u,) for u in URLS], ["url"])
    rows = (
        df.select(
            "url",
            canonicalize_col(F.col("url")).alias("canon"),
            fingerprint_col(canonicalize_col(F.col("url"))).alias("fp"),
            host_col(F.col("url")).alias("host"),
        )
        .collect()
    )
    for r in rows:
        assert r.canon == K.canonicalize_url(r.url), r.url
        assert r.fp == K.fingerprint(r.url), r.url
        assert r.host == K.url_host(r.url), r.url


def test_golden_fingerprint_jvm(spark):
    df = spark.createDataFrame([(K.GOLDEN_URL,)], ["url"])
    fp = df.select(fingerprint_col(canonicalize_col(F.col("url"))).alias("fp")).first().fp
    assert fp == K.GOLDEN_FINGERPRINT


def test_parse_page_udf(spark):
    html = (
        '<html><body><a href="/p/2">a</a><a href="p/3#x">b</a>'
        "<img src='i.png'><a href=\"javascript:void(0)\">j</a></body></html>"
    ).encode()
    df = spark.createDataFrame(
        [(html, "utf-8", "http://s.test/p/1")], ["html", "encoding", "url"]
    )
    udf = make_parse_page_udf(links_to_abs=True)
    row = df.select(udf("html", "encoding", "url").alias("p")).first().p
    assert row.text == K.extracted_text(html, "utf-8", "http://s.test/p/1")
    assert row.links == [
        "http://s.test/p/2",
        "http://s.test/p/p/3#x",
        "javascript:void(0)",
    ]
    # broken utf-8 falls back to errors='ignore'
    bad = b'<a href="/x">y\xff z</a>'
    df2 = spark.createDataFrame([(bad, "utf-8", "http://s.test/")], ["html", "encoding", "url"])
    row2 = df2.select(udf("html", "encoding", "url").alias("p")).first().p
    assert row2.text == K.extracted_text(bad, "utf-8", "http://s.test/")
    assert "�" not in row2.text
