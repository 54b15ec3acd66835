"""robots.txt admission filter — north-rule addition (NOT in the reference:
verified no 'robots' handling anywhere in /root/reference; SURVEY §7).

Model: a small per-host rules table (host, disallow array<string> of path
prefixes, crawl_delay double), broadcast-joined to the frontier as one more
admission predicate before politeness ranking. Disallowed rows are dropped
to a ``robots_blocked`` table (they are NOT retried — a disallow is
permanent for the crawl), and crawl_delay folds into the per-host budget
the same way DOWNLOAD_DELAY does (engine.effective_host_budget).

Rules parsing accepts the simple robots.txt subset (User-agent: * blocks)
so fixtures can feed raw robots bodies; at production scale the parsed
rules table is itself a crawl output (fetch /robots.txt per host) stored
alongside the seen set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RULES_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow", T.ArrayType(T.StringType()), False),
        T.StructField("crawl_delay", T.DoubleType(), True),
    ]
)


def parse_robots_txt(body: str) -> tuple[list[str], float | None]:
    """Minimal robots.txt parser: User-agent: * sections, Disallow and
    Crawl-delay directives. Returns (disallow_prefixes, crawl_delay)."""
    disallow: list[str] = []
    delay: float | None = None
    applies = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            applies = val == "*"
        elif applies and key == "disallow" and val:
            disallow.append(val)
        elif applies and key == "crawl-delay":
            try:
                delay = float(val)
            except ValueError:
                pass
    return disallow, delay


def rules_df(spark: SparkSession, rules: dict[str, dict]) -> DataFrame:
    """rules: {host: {"disallow": [...], "crawl_delay": s}} -> rules table."""
    rows = [
        (h, list(r.get("disallow", [])), r.get("crawl_delay"))
        for h, r in sorted(rules.items())
    ]
    return spark.createDataFrame(rows, RULES_SCHEMA)


def apply_robots(
    frontier: DataFrame, rules: DataFrame | None
) -> tuple[DataFrame, DataFrame]:
    """Split frontier rows into (allowed, blocked) under the rules table.

    A row is blocked when its url path starts with any disallow prefix of
    its host. The rules side is broadcast (it is per-host metadata, tiny
    relative to the frontier); the check itself is a JVM ``exists`` over
    the prefix array — no shuffle on the frontier."""
    if rules is None:
        return frontier, frontier.limit(0)
    cols = frontier.columns
    path = F.regexp_replace(F.col("url_canon"), r"^https?://[^/]+", "")
    joined = frontier.withColumn("_path", path).join(
        F.broadcast(rules.select(F.col("host").alias("_rhost"), "disallow")),
        F.col("host") == F.col("_rhost"),
        "left",
    )
    blocked_cond = F.col("disallow").isNotNull() & F.exists(
        F.col("disallow"), lambda p: F.col("_path").startswith(p)
    )
    allowed = joined.filter(~F.coalesce(blocked_cond, F.lit(False))).select(*cols)
    blocked = joined.filter(F.coalesce(blocked_cond, F.lit(False))).select(*cols)
    return allowed, blocked
