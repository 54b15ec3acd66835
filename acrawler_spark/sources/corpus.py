"""Synthetic Common-Crawl-style corpus (BASELINE.json input_hint schema).

Two generators:

* ``build_fixture_pages`` — a small deterministic linked page graph (pure
  Python, FIXTURES.md §1) used by the crawl-semantics tests: K hosts ×
  depth-D trees, query-string variants, fragments, javascript:/mailto:
  noise, duplicate links, cross-host links, dead links, latin-1 and
  broken-byte pages. The ``text`` column is the byte-identical oracle
  (reference decode + make_text_links_absolute, http.py:291-304 +
  utils.py:125-153, computed by the kernel at generation time).

* ``corpus_from_documents`` — a scale-out corpus derived deterministically
  from the driver's ``documents.parquet`` with Spark built-ins only (no
  UDFs), used by bench/entry so corpus size tracks the sf directory.

Corpus schema: url STRING (canonical form — the fetch-join key), warc_ts
TIMESTAMP, html BINARY, text STRING, lang STRING, encoding STRING.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from acrawler_spark import kernel

# Logical epoch base (FIXTURES.md): round r => T0 + r seconds.
FIXTURE_T0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
FIXTURE_T0_EPOCH = FIXTURE_T0.timestamp()  # 1767225600.0

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("encoding", T.StringType(), True),
    ]
)

_LANGS = ["en", "zh", "de"]


def _page_url(host_i: int, page_i: int) -> str:
    base = f"http://site{host_i}.test/p/{page_i}"
    if page_i % 5 == 4:
        return base + "?a=1&b=2"  # canonical form of the query page
    return base


def _child_href(parent_i: int, child_i: int) -> str:
    """Link form a parent uses for a child — exercises canonicalization."""
    if child_i % 5 == 4:
        # query page: odd parents emit the unsorted variant
        q = "?b=2&a=1" if parent_i % 2 == 1 else "?a=1&b=2"
        return f"/p/{child_i}{q}"
    if child_i % 4 == 1:
        return f"/p/{child_i}#frag"  # fragment stripped by canonicalization
    return f"/p/{child_i}"


def _page_html(host_i: int, page_i: int, n_pages: int, fanout: int, n_hosts: int) -> str:
    links = []
    first_child = page_i * fanout + 1
    for child in range(first_child, min(first_child + fanout, n_pages)):
        href = _child_href(page_i, child)
        links.append(f'<a href="{href}">child {child}</a>')
        if child % 3 == 0:
            links.append(f'<a href="{href}">dup {child}</a>')  # duplicate link
    if 1 <= page_i <= fanout and fanout + 1 < n_pages:
        # all depth-1 siblings also link the first grandchild: within-round dedup
        links.append(f'<a href="/p/{fanout + 1}">shared</a>')
    if fanout < page_i <= fanout + fanout * fanout:
        # depth-2 pages link the next host's seed: cross-host dedup
        links.append(f'<a href="http://site{(host_i + 1) % n_hosts}.test/p/0">cross</a>')
    if page_i % 7 == 3:
        links.append(f'<a href="/dead/{page_i}">dead</a>')  # 404 -> retry path
    body_links = "\n".join(links)
    lang = _LANGS[(host_i + page_i) % len(_LANGS)]
    accents = "café résumé" if page_i % 11 == 5 else "plain"
    return (
        f"<html><head><title>Site {host_i} Doc {page_i}</title></head><body>\n"
        f'<h1 class="title">Doc {page_i}</h1>\n'
        f'<p class="content" lang="{lang}">Synthetic page {page_i} of host {host_i}. {accents}</p>\n'
        f'<span class="price">$ {page_i % 9}.5k</span>\n'
        f'<span class="reviews">{page_i * 3 + 1} reviews</span>\n'
        f'<span class="date">published 2019-11-{(page_i % 27) + 1:02d}</span>\n'
        f"{body_links}\n"
        '<a href="#top">top</a>\n'
        '<a href="javascript:void(0)">js</a>\n'
        '<a href="mailto:a@b.test">mail</a>\n'
        "</body></html>"
    )


def build_fixture_pages(
    n_hosts: int = 4, depth: int = 3, fanout: int = 3
) -> list[dict]:
    """Deterministic page-graph rows (FIXTURES.md §1). No wall clock, no RNG."""
    n_pages = sum(fanout**d for d in range(depth + 1))
    rows = []
    for h in range(n_hosts):
        for i in range(n_pages):
            url = _page_url(h, i)
            html_str = _page_html(h, i, n_pages, fanout, n_hosts)
            if i % 11 == 5:
                encoding = "latin-1"
                html = html_str.encode("latin-1")
            elif i % 13 == 6:
                encoding = "utf-8"
                # invalid utf-8 byte mid-document: decode falls back to
                # errors='ignore' (reference http.py:294-297)
                html = html_str.encode("utf-8").replace(b"Synthetic", b"Syn\xffthetic")
            else:
                encoding = "utf-8"
                html = html_str.encode("utf-8")
            rows.append(
                {
                    "url": url,
                    "warc_ts": FIXTURE_T0 + timedelta(seconds=h * n_pages + i),
                    "html": html,
                    "text": kernel.extracted_text(html, encoding, url, links_to_abs=True),
                    "lang": _LANGS[(h + i) % len(_LANGS)],
                    "encoding": encoding,
                }
            )
    return rows


def fixture_corpus_df(
    spark: SparkSession, n_hosts: int = 4, depth: int = 3, fanout: int = 3
) -> DataFrame:
    return spark.createDataFrame(build_fixture_pages(n_hosts, depth, fanout), CORPUS_SCHEMA)


def seed_urls(n_hosts: int = 4) -> list[str]:
    return [f"http://site{h}.test/p/0" for h in range(n_hosts)]


def corpus_from_documents(
    spark: SparkSession, sf_dir: str, n_hosts: int = 32, fanout: int = 4,
    multiplier: int = 1, body_repeat: int = 1,
) -> DataFrame:
    """Derive a crawlable corpus from documents.parquet with built-ins only.

    Page graph: a forest over page ids 0..N*multiplier-1 — children of page
    i are i*fanout+1..i*fanout+fanout; roots are ids < n_hosts. Each page's
    host is its subtree root (computed by iterating parent = (i-1)/fanout),
    so a tree lives wholly on one host and relative child hrefs resolve to
    real corpus urls. Tree sizes differ -> realistic per-host skew. Page
    text comes from documents (page_id % N), so content scales with the sf
    dir while ``multiplier`` scales page count for compute-dominated
    benches. The derivation is one broadcast join + narrow projection (no
    UDF), so bench time measures the engine, not the generator.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    n_pages = n * multiplier
    ids = spark.range(n_pages).select(F.col("id").alias("doc_id"))
    body = docs.select(F.col("doc_id").alias("src_id"), "text", "lang")
    if body_repeat > 1:
        # realistic Common-Crawl page sizes (tens of KB): repeat the source
        # text so per-URL decode/absolutize/extract work is representative
        body = body.withColumn(
            "text", F.array_join(F.array_repeat(F.col("text"), body_repeat), " ")
        )
    d = ids.join(
        F.broadcast(body),
        (F.col("doc_id") % n) == F.col("src_id"),
    ).drop("src_id")
    # host = subtree root: iterate parent=(i-1)/fanout until < n_hosts
    import math

    h = F.col("doc_id")
    for _ in range(max(1, math.ceil(math.log(max(n_pages, 2), fanout))) + 1):
        h = F.when(h >= n_hosts, F.floor((h - 1) / fanout)).otherwise(h)
    d = d.withColumn("h", h.cast("long"))
    url = F.concat(F.lit("http://site"), F.col("h"), F.lit(".test/p/"), F.col("doc_id"))
    child_ids = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.lit(fanout)),
            lambda j: F.col("doc_id") * fanout + j,
        ),
        # ids < n_hosts are other trees' roots (seeded directly, not linked)
        lambda c: (c < F.lit(n_pages)) & (c >= F.lit(n_hosts)),
    )
    # children live on the same host => relative hrefs exercise absolutize
    links_html = F.aggregate(
        child_ids,
        F.lit(""),
        lambda acc, c: F.concat(acc, F.lit('<a href="/p/'), c, F.lit('">c</a>\n')),
    )
    html_str = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id"),
        F.lit('</title></head><body>\n<p class="content">'),
        F.col("text"),
        F.lit("</p>\n"),
        links_html,
        F.lit("</body></html>"),
    )
    # expected extracted text: children hrefs become absolute on this host
    links_abs = F.aggregate(
        child_ids,
        F.lit(""),
        lambda acc, c: F.concat(
            acc,
            F.lit('<a href="http://site'),
            F.col("h"),
            F.lit(".test/p/"),
            c,
            F.lit('">c</a>\n'),
        ),
    )
    text_abs = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id"),
        F.lit('</title></head><body>\n<p class="content">'),
        F.col("text"),
        F.lit("</p>\n"),
        links_abs,
        F.lit("</body></html>"),
    )
    return d.select(
        url.alias("url"),
        (F.lit(FIXTURE_T0) + F.make_interval(secs=F.col("doc_id").cast("double"))).alias(
            "warc_ts"
        ),
        F.encode(html_str, "utf-8").alias("html"),
        text_abs.alias("text"),
        F.col("lang"),
        F.lit("utf-8").alias("encoding"),
    )
