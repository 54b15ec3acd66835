"""Arrow-batched pandas UDFs — the only Python in the engine's hot path.

One UDF does decode + absolutize + link extraction in a single pass over
each Arrow batch of pages (the html bytes cross the JVM->Python boundary
exactly once). Everything else (canonicalize, fingerprint, ranking,
budgets) stays JVM-side (functions/url.py).

Semantics delegated to the kernel: decode fallback http.py:291-298,
absolutize utils.py:125-153, link extraction parser.py:84-98.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from acrawler_spark import kernel

PARSE_RESULT_TYPE = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
    ]
)


def make_parse_page_udf(links_to_abs: bool = True, follow_patterns: list[str] | None = None):
    """Returns a pandas UDF (html binary, encoding str, url str) ->
    struct(text, links). ``text`` is the byte-identical reference
    ``Response.text``; ``links`` are urljoin'd hrefs in document order,
    filtered by ``follow_patterns`` (regex search, parser.py:86-98)."""
    patterns = list(follow_patterns or [])

    @F.pandas_udf(PARSE_RESULT_TYPE)
    def parse_page(html: pd.Series, encoding: pd.Series, url: pd.Series) -> pd.DataFrame:
        texts: list[str | None] = []
        links: list[list[str] | None] = []
        for body, enc, u in zip(html.values, encoding.values, url.values):
            if body is None:
                texts.append(None)
                links.append(None)
                continue
            body = bytes(body)
            raw = kernel.decode_body(body, enc or "utf-8")
            text = kernel.make_text_links_absolute(raw, u) if links_to_abs else raw
            texts.append(text)
            links.append(kernel.follow_links(raw, u, patterns))
        return pd.DataFrame({"text": texts, "links": links})

    return parse_page
