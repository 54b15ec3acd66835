"""Production network fetch: a per-partition HTTP client over mapInPandas.

Closes the seam SCALING.md declares for the sandbox ("fetch becomes
mapInPandas with a per-executor HTTP client pool; the corpus join is the
sandbox stand-in"): the round's selected frontier is repartitioned by host
and each partition fetches its rows with a stdlib urllib opener — host
affinity gives the batch analog of the reference's per-host rate limiting
(reference counter.py:70-109 bounds in-flight requests per host; here a
host's rows live in one partition and are fetched serially with
``delay_s`` honored between same-host requests, reference
crawler.py:177-189 config_from_setting -> DOWNLOAD_DELAY).

The output shape is column-identical to ``build_fetch_join`` (the corpus
transport), so ``CrawlEngine._stage_pages`` — middleware, ok/status
semantics (reference http.py:270-281), retry/recrawl branches, counters —
is transport-agnostic:

* a real HTTP response (ANY status code, including HTTPError bodies)
  -> ``c_url`` = the fetched url, ``status`` = the response code,
  ``html`` = the (bounded) body — a 503 with ``status_allowed=[503]``
  is ok, exactly like a corpus hit carrying a non-200 status;
* a transport error (DNS, refused, timeout) -> ``c_url`` NULL,
  ``status`` 404, ``html`` NULL — the same row ``build_misses`` emits
  for a corpus miss ("a fetch exception, not a status — never ok",
  reference http.py:270-281: ``self.exceptions`` path).

Politeness remains upstream (the round's salted Window budgets bound how
many rows per host enter a round at all); the in-partition delay bounds
the request RATE within the round, which is what the reference's Counter
actually rate-limits between ``require`` and ``release``.

Connection reuse (default on): each partition keeps one keep-alive
``http.client`` connection per (scheme, netloc) — host-affine partitions
make the pool tiny and hit-heavy. Pool failure modes, and how each is
handled:

* stale socket (server closed an idle keep-alive between requests) —
  the request is retried ONCE on a fresh connection (GETs are
  idempotent); a second failure is a transport-error row.
* truncated body (page larger than ``max_bytes``) — the unread tail
  would poison the next response on that socket, so the connection is
  closed instead of reused.
* server speaks HTTP/1.0 or sends ``Connection: close`` — http.client
  marks the response ``will_close``; the connection is dropped from the
  pool and the next request reconnects (graceful degradation to the
  one-connection-per-request regime).
* redirects are followed client-side (urllib's opener did this
  implicitly), up to 10 hops, draining each redirect body so the
  socket stays reusable; ``c_url`` remains the REQUESTED url, exactly
  like the opener path.

``keep_alive=False`` restores the per-request urllib opener. Bodies are
read through ``max_bytes`` either way so one tarpit page cannot blow an
Arrow batch (the same bound the corpus parse path enforces in bytes).
"""

import time

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGE_FIELDS = [
    T.StructField("c_url", T.StringType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("encoding", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("status", T.IntegerType(), True),
]


def _keepalive_fetcher(timeout_s: float, max_bytes: int, user_agent: str):
    """Per-partition keep-alive fetcher: (url) -> (body, charset, status),
    raising OSError on a transport failure. One pooled connection per
    (scheme, netloc); see the module docstring for the pool's failure
    modes."""
    import http.client
    from urllib.parse import urljoin, urlsplit

    conns: dict = {}

    def _conn(scheme: str, netloc: str):
        c = conns.get((scheme, netloc))
        if c is None:
            cls = (
                http.client.HTTPSConnection
                if scheme == "https"
                else http.client.HTTPConnection
            )
            c = cls(netloc, timeout=timeout_s)
            conns[(scheme, netloc)] = c
        return c

    def _drop(scheme: str, netloc: str) -> None:
        c = conns.pop((scheme, netloc), None)
        if c is not None:
            try:
                c.close()
            except OSError:
                pass

    def _request(scheme: str, netloc: str, target: str):
        conn = _conn(scheme, netloc)
        conn.request(
            "GET", target,
            headers={"User-Agent": user_agent, "Connection": "keep-alive"},
        )
        return conn.getresponse()

    def fetch(url: str):
        cur = url
        last_status = None
        for _hop in range(10):  # urllib's redirect ceiling
            p = urlsplit(cur)
            scheme, netloc = p.scheme, p.netloc
            target = (p.path or "/") + (f"?{p.query}" if p.query else "")
            try:
                resp = _request(scheme, netloc, target)
            except (http.client.HTTPException, OSError):
                # stale keep-alive socket — one retry on a fresh conn
                _drop(scheme, netloc)
                resp = _request(scheme, netloc, target)
            if resp.status in (301, 302, 303, 307, 308):
                loc = resp.getheader("Location")
                # drain at most max_bytes so the socket stays reusable — a
                # redirect carrying a bigger (or slow-drip chunked) body is
                # the tarpit the bound exists for: drop the connection
                # instead of draining it (ADVICE r5: the unbounded read()
                # here contradicted the module's max_bytes guarantee)
                resp.read(max_bytes)
                if (not resp.isclosed() and resp.read(1)) or resp.will_close:
                    _drop(scheme, netloc)
                if not loc:
                    return None, None, int(resp.status)
                last_status = int(resp.status)
                cur = urljoin(cur, loc)
                continue
            body = resp.read(max_bytes)
            charset = resp.headers.get_content_charset() or "utf-8"
            if not resp.isclosed() and resp.read(1):
                # truncated at max_bytes: the unread tail poisons reuse
                _drop(scheme, netloc)
            elif resp.will_close:
                _drop(scheme, netloc)
            return body, charset, int(resp.status)
        # redirect loop exhausted: surface the LAST hop's actual 3xx status,
        # matching the urllib branch (HTTPError carries the final 3xx code)
        # — not a fabricated 310 that no status_allowed list ever contains
        return None, None, last_status

    return fetch


def build_fetch_http(
    selected_ranked: DataFrame,
    frontier_cols: list,
    *,
    timeout_s: float = 10.0,
    delay_s: float = 0.0,
    max_bytes: int = 4 * 1024 * 1024,
    user_agent: str = "acrawler-spark/0.1",
    n_partitions: int = None,
    keep_alive: bool = True,
) -> DataFrame:
    """The round's fetch over live HTTP, same output shape as
    ``build_fetch_join`` (``frontier_cols`` + rank + c_url/html/encoding/
    lang/status). Every selected row yields exactly one output row, so the
    engine's all-hits fast path applies (the miss job never runs: misses
    are inline transport-error rows)."""
    sel_cols = [*frontier_cols, "rank"]
    src = selected_ranked.select(*sel_cols)
    n_parts = n_partitions or selected_ranked.sparkSession.sparkContext.defaultParallelism
    part_key: Column = F.col("host") if "host" in frontier_cols else F.xxhash64("url_canon")
    src = src.repartition(n_parts, part_key)
    out_schema = T.StructType(list(src.schema.fields) + PAGE_FIELDS)

    def fetch_partition(batches):
        import http.client
        import socket
        import urllib.error
        import urllib.request
        from urllib.parse import urlsplit

        opener = None if keep_alive else urllib.request.build_opener()
        ka = (
            _keepalive_fetcher(timeout_s, max_bytes, user_agent)
            if keep_alive
            else None
        )
        last_hit: dict = {}  # host -> monotonic time of its last request

        def fetch_one(url):
            """-> (c_url, html, encoding, status)."""
            host = urlsplit(url).netloc
            if delay_s > 0.0:
                wait = last_hit.get(host, -1e18) + delay_s - time.monotonic()
                if wait > 0:
                    time.sleep(wait)
            last_hit[host] = time.monotonic()
            if keep_alive:
                try:
                    body, charset, status = ka(url)
                except (http.client.HTTPException, socket.timeout, OSError,
                        ValueError):
                    # transport error: the build_misses row (404, null body)
                    return None, None, None, 404
                # parity with the opener path: error statuses coalesce an
                # empty body to NULL (urllib's HTTPError branch), success
                # statuses keep it verbatim
                if status >= 400:
                    body = body or None
                return url, body, charset, status
            req = urllib.request.Request(url, headers={"User-Agent": user_agent})
            try:
                with opener.open(req, timeout=timeout_s) as resp:
                    body = resp.read(max_bytes)
                    charset = resp.headers.get_content_charset() or "utf-8"
                    return url, body, charset, int(resp.status)
            except urllib.error.HTTPError as e:
                # a real response with an error code — body and all; the
                # body read can itself die mid-stream (tarpit, reset), which
                # must degrade to an empty-body response row, not a task error
                try:
                    body = e.read(max_bytes)
                except OSError:
                    body = None
                charset = e.headers.get_content_charset() or "utf-8"
                return url, (body or None), charset, int(e.code)
            except (urllib.error.URLError, socket.timeout, OSError, ValueError):
                # transport error: the build_misses row (404, null body)
                return None, None, None, 404

        for pdf in batches:
            fetched = [fetch_one(u) for u in pdf["url_canon"]]
            pdf = pdf.copy()
            pdf["c_url"] = [f[0] for f in fetched]
            pdf["html"] = [f[1] for f in fetched]
            pdf["encoding"] = [f[2] for f in fetched]
            pdf["lang"] = None
            pdf["status"] = [f[3] for f in fetched]
            yield pdf

    return src.mapInPandas(fetch_partition, schema=out_schema)
