"""URL column expressions — pure JVM built-ins, whole-stage-codegen'd.

These mirror ``acrawler_spark.kernel`` exactly (tested row-for-row against
it) but never leave the JVM, so canonicalize+fingerprint of 10^10 URLs is a
codegen'd projection, not a Python round-trip.

Reference semantics: canonicalization http.py:120-126 (sorted whole ``k=v``
query tokens, fragment stripped, yarl's empty-path -> "/"); fingerprint
http.py:138-145 (sha1(canonical_utf8 || method_utf8)); score task.py:92-93.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from acrawler_spark.kernel import SCORE_PRIORITY_WEIGHT


def canonicalize_col(url: Column) -> Column:
    base = F.substring_index(url, "#", 1)  # strip fragment
    pre = F.substring_index(base, "?", 1)
    # yarl: URL with empty path renders as host + "/"
    pre = F.regexp_replace(pre, r"^(https?://[^/?#]+)$", r"$1/")
    has_q = F.instr(base, "?") > 0
    qstr = F.substr(base, F.instr(base, "?") + 1)
    sorted_q = F.array_join(F.sort_array(F.split(qstr, "&")), "&")
    return F.when(has_q, F.concat(pre, F.lit("?"), sorted_q)).otherwise(pre)


def fingerprint_col(url_canon: Column, method: Column | str = "GET") -> Column:
    """sha1(canonical_utf8 || method_utf8) — byte-concat == string-concat
    for UTF-8, so this is exactly the reference digest (http.py:142-145)."""
    m = F.lit(method) if isinstance(method, str) else method
    return F.sha1(F.encode(F.concat(url_canon, m), "utf-8"))


def host_col(url: Column) -> Column:
    """Politeness partition key (reference counter.py:79,89: url.host)."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def score_col(priority: Column, exetime: Column) -> Column:
    """priority*1e10 - exetime as DECIMAL(38,6) — float64 loses sub-second
    precision at this magnitude (SURVEY §7), so the scalar is decimal and
    the engine's *sort* uses the composite key, never this scalar."""
    return (
        priority.cast("decimal(38,6)") * F.lit(SCORE_PRIORITY_WEIGHT).cast("decimal(38,6)")
        - exetime.cast("decimal(38,6)")
    ).alias("score")


def rank_sort_keys(df_prefix: str = "") -> list[Column]:
    """The engine's total frontier order: equivalent to score DESC with a
    deterministic tie-break (task.py:29-30,92-93 + SURVEY §7 precision note):
    priority DESC, exetime ASC, fingerprint ASC."""
    p = (df_prefix + ".") if df_prefix else ""
    return [
        F.col(p + "priority").desc(),
        F.col(p + "exetime").asc(),
        F.col(p + "fingerprint").asc(),
    ]
