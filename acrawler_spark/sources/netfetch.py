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

Scale notes: one connection-reuse upgrade (requests.Session / aiohttp
pool) slots into ``_open`` without touching the plan; the repartition is
the only shuffle and its width is the executor count, not the corpus;
bodies are read through ``max_bytes`` so one tarpit page cannot blow an
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


def build_fetch_http(
    selected_ranked: DataFrame,
    frontier_cols: list,
    *,
    timeout_s: float = 10.0,
    delay_s: float = 0.0,
    max_bytes: int = 4 * 1024 * 1024,
    user_agent: str = "acrawler-spark/0.1",
    n_partitions: int = None,
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
        import socket
        import urllib.error
        import urllib.request
        from urllib.parse import urlsplit

        opener = urllib.request.build_opener()
        last_hit: dict = {}  # host -> monotonic time of its last request

        def fetch_one(url):
            """-> (c_url, html, encoding, status)."""
            host = urlsplit(url).netloc
            if delay_s > 0.0:
                wait = last_hit.get(host, -1e18) + delay_s - time.monotonic()
                if wait > 0:
                    time.sleep(wait)
            last_hit[host] = time.monotonic()
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
