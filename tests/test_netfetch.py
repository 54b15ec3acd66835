"""Network-fetch transport (sources/netfetch.py) against a live local
HTTP server — the production seam SCALING.md declares, driven for real:
per-partition urllib client, HTTPError-with-body vs transport-error rows,
per-host delay honored inside a partition."""

import http.server
import threading
import time

import pytest
from pyspark.sql import functions as F

PAGE1 = b"<html><body><a href='/p2'>two</a> hello</body></html>"
GONE = b"<html><body>it is gone</body></html>"


class _Handler(http.server.BaseHTTPRequestHandler):
    # HTTP/1.1: keep-alive honored (we always send Content-Length), so the
    # connection-reuse client can actually hold sockets open against this
    # fixture; the urllib path still closes per request.
    protocol_version = "HTTP/1.1"
    hits = []  # (path, monotonic time) — shared, server runs in this process
    site = {}  # path -> body, for the transport-equivalence crawl
    conns = 0  # TCP connections accepted (one handler instance each)

    def setup(self):
        _Handler.conns += 1
        super().setup()

    def do_GET(self):
        _Handler.hits.append((self.path, time.monotonic()))
        if self.path.startswith("/loop"):
            # two-node redirect cycle: /loopA <-> /loopB
            other = "/loopB" if self.path == "/loopA" else "/loopA"
            self.send_response(302)
            self.send_header("Location", other)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        if self.path in _Handler.site:
            body = _Handler.site[self.path]
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
        elif self.path.startswith("/p"):
            body = PAGE1
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
        elif self.path == "/gone":
            body = GONE
            self.send_response(404)
            self.send_header("Content-Type", "text/html; charset=iso-8859-1")
        else:
            body = b"teapot"
            self.send_response(418)
            self.send_header("Content-Type", "text/plain")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _selected(spark, urls):
    rows = [(u, u, f"fp{i}", u.split("/")[2], "GET", i) for i, u in enumerate(urls)]
    return spark.createDataFrame(
        rows,
        "url string, url_canon string, fingerprint string, host string, "
        "method string, rank long",
    )


COLS = ["url", "url_canon", "fingerprint", "host", "method"]


def test_fetch_statuses_bodies_encodings(spark, server):
    from acrawler_spark.sources.netfetch import build_fetch_http

    urls = [
        f"{server}/p1",
        f"{server}/gone",
        f"{server}/other",
        "http://127.0.0.1:9/refused",  # port 9 (discard) — nothing listens
    ]
    out = build_fetch_http(_selected(spark, urls), COLS, timeout_s=5.0)
    rows = {r["url"]: r for r in out.collect()}
    assert len(rows) == 4  # exactly one output row per selected row

    ok = rows[f"{server}/p1"]
    assert (ok["status"], ok["c_url"], bytes(ok["html"]), ok["encoding"]) == (
        200, f"{server}/p1", PAGE1, "utf-8",
    )
    # HTTPError with a body is a real response, not a transport miss
    gone = rows[f"{server}/gone"]
    assert (gone["status"], gone["c_url"], bytes(gone["html"]), gone["encoding"]) == (
        404, f"{server}/gone", GONE, "iso-8859-1",
    )
    assert rows[f"{server}/other"]["status"] == 418
    # transport error -> the build_misses row shape: null c_url, null body
    miss = rows["http://127.0.0.1:9/refused"]
    assert (miss["status"], miss["c_url"], miss["html"]) == (404, None, None)


def test_per_host_delay_honored(spark, server):
    from acrawler_spark.sources.netfetch import build_fetch_http

    _Handler.hits.clear()
    urls = [f"{server}/p{i}" for i in range(4)]  # one host -> one partition
    build_fetch_http(
        _selected(spark, urls), COLS, timeout_s=5.0, delay_s=0.35
    ).collect()
    times = sorted(t for _, t in _Handler.hits)
    assert len(times) == 4
    gaps = [b - a for a, b in zip(times, times[1:])]
    assert min(gaps) >= 0.25  # 0.35 requested; slack for clock granularity


def test_keep_alive_reuses_connections(spark, server):
    """Connection-reuse upgrade (r4 verdict #7): several same-host fetches
    ride ONE TCP connection with keep_alive on; the opener path opens one
    per request. Same rows either way."""
    from acrawler_spark.sources.netfetch import build_fetch_http

    urls = [f"{server}/p{i}" for i in range(6)]  # one host -> one partition

    _Handler.conns = 0
    ka = build_fetch_http(
        _selected(spark, urls), COLS, timeout_s=5.0, keep_alive=True
    ).collect()
    conns_ka = _Handler.conns

    _Handler.conns = 0
    plain = build_fetch_http(
        _selected(spark, urls), COLS, timeout_s=5.0, keep_alive=False
    ).collect()
    conns_plain = _Handler.conns

    assert conns_ka == 1
    assert conns_plain == len(urls)
    # byte-identical rows across both clients
    key = lambda r: r["url"]  # noqa: E731
    for a, b in zip(sorted(ka, key=key), sorted(plain, key=key)):
        assert (a["url"], a["c_url"], a["status"], a["encoding"],
                bytes(a["html"])) == (
            b["url"], b["c_url"], b["status"], b["encoding"], bytes(b["html"])
        )


def test_output_shape_matches_corpus_transport(spark, server):
    from acrawler_spark.sources.netfetch import build_fetch_http

    out = build_fetch_http(_selected(spark, [f"{server}/p9"]), COLS)
    assert out.columns == COLS + ["rank", "c_url", "html", "encoding", "lang", "status"]
    row = out.collect()[0]
    assert row["lang"] is None and row["rank"] == 0


def test_http_transport_equals_corpus_transport(spark, server, tmp_path):
    """The flagship contract: the SAME site crawled over live HTTP and as
    a corpus table yields byte-identical stores (seen set, page text,
    items) — the transport is swappable under an unchanged engine."""
    from acrawler_spark.api import Crawl

    paths = {
        "/s/0": b"<html><body><a href='/s/1'>a</a><a href='/s/2'>b</a>"
                b"<h1>root</h1></body></html>",
        "/s/1": b"<html><body><a href='/s/2'>c</a><h1>one</h1></body></html>",
        "/s/2": b"<html><body><h1>two</h1></body></html>",
    }
    _Handler.site = paths
    site = {f"{server}{p}": b for p, b in paths.items()}

    corpus = spark.createDataFrame(
        [(u, b, "utf-8", "en") for u, b in site.items()],
        "url string, html binary, encoding string, lang string",
    )

    def crawl(transport_http, workdir):
        c = (
            Crawl(seeds=[f"{server}/s/0"])
            .follow(r"127\.0\.0\.1")
            .spawn("page", title=("h1::text",))
        )
        if transport_http:
            c = c.http_transport(timeout_s=5.0)
            return c.run(spark, None, str(workdir))
        return c.run(spark, corpus, str(workdir))

    s_corpus = crawl(False, tmp_path / "corpus")
    s_http = crawl(True, tmp_path / "http")

    def snap(store):
        seen = sorted(r["fingerprint"] for r in store.read_appended("seen").collect())
        pages = sorted(
            (r["url"], r["status"], r["text"])
            for r in store.read_appended("pages").select("url", "status", "text").collect()
        )
        items = sorted(
            (r["url"], r["title"])
            for r in store.read_appended("items")
            .filter(F.col("family") == "page")
            .select("url", F.col("content")["title"].alias("title"))
            .collect()
        )
        return seen, pages, items

    assert snap(s_http) == snap(s_corpus)


def test_redirect_loop_surfaces_last_hop_status(spark, server):
    """A redirect cycle exhausts the hop ceiling and surfaces the LAST
    hop's actual 3xx status with a null body (parity with the urllib
    branch, where the loop raises HTTPError carrying the final 3xx code)
    — never a fabricated status no status_allowed list contains."""
    from acrawler_spark.sources.netfetch import build_fetch_http

    urls = [f"{server}/loopA", f"{server}/p1"]
    out = build_fetch_http(
        _selected(spark, urls), COLS, timeout_s=5.0, keep_alive=True
    )
    rows = {r["url"]: r for r in out.collect()}
    loop = rows[f"{server}/loopA"]
    assert loop["status"] == 302
    assert loop["html"] is None
    assert loop["c_url"] == f"{server}/loopA"
    # the pooled connection survives the loop: the next URL on the same
    # host still fetches fine
    assert rows[f"{server}/p1"]["status"] == 200
