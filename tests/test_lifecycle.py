"""Lifecycle + middleware semantics vs the hermetic oracle:

* user-level defer (ReScheduleError, exceptions.py:23-43): handler-flagged
  rows re-enter the frontier at now+defer, uncounted, tries kept
* skip (SkipTaskError, exceptions.py:1-20): counted success, no outputs
* family-scoped handlers (middleware.py:74-88): fire only on matching rows
* per-request status_allowed (http.py:101,270-281) and method (http.py:100)
"""

from pyspark.sql import functions as F

from acrawler_spark.plans.engine import CrawlConfig, CrawlEngine
from acrawler_spark.sources.corpus import (
    CORPUS_SCHEMA,
    build_fixture_pages,
    fixture_corpus_df,
    seed_urls,
)
from acrawler_spark.sources.store import CheckpointStore

from tests.oracle import OracleCrawl
from tests.test_engine_e2e import assert_match

FOLLOW = [r"site\d+\.test"]


def run_pair(spark, tmp_path, *, n_hosts=2, depth=2, fanout=3,
             handlers=None, oracle_kw=None, **cfg_kw):
    pages = build_fixture_pages(n_hosts=n_hosts, depth=depth, fanout=fanout)
    corpus = fixture_corpus_df(spark, n_hosts=n_hosts, depth=depth, fanout=fanout)
    seeds = seed_urls(n_hosts)
    cfg = CrawlConfig(seeds=seeds, follow_patterns=FOLLOW, bloom_bits=1 << 14,
                      handlers=handlers or {}, **cfg_kw)
    store = CheckpointStore(str(tmp_path / "state"), spark)
    history = CrawlEngine(spark, cfg, store).run(corpus)
    oracle = OracleCrawl(
        pages, seeds, FOLLOW,
        max_tries=cfg.max_tries,
        uniform_budget=cfg.effective_host_budget(),
        special_budgets=cfg.special_host_budgets,
        round_cap=cfg.round_cap,
        t0=cfg.t0,
        round_seconds=cfg.round_seconds,
        seed_recrawl=cfg.seed_recrawl,
        max_depth=cfg.max_depth,
        **(oracle_kw or {}),
    )
    expected = oracle.run(max_rounds=cfg.max_rounds)
    return store, history, expected


def test_defer_matches_oracle(spark, tmp_path):
    """ReScheduleError(defer=3): first attempt of /p/1 pages is deferred 3
    logical seconds; the row re-executes later, uncounted meanwhile."""

    def defer_handler(df, ctx):
        return df.withColumn(
            "_defer_s",
            F.when(F.col("url_canon").rlike(r"/p/1$") & (F.col("tries") == 0), F.lit(3.0)),
        )

    def defer_rule(url_canon, tries):
        import re
        return 3.0 if re.search(r"/p/1$", url_canon) and tries == 0 else 0.0

    store, history, expected = run_pair(
        spark, tmp_path,
        handlers={"before_parse": [(100, defer_handler)]},
        oracle_kw={"defer_rule": defer_rule},
    )
    assert_match(spark, store, history, expected)
    # the deferred page really executed twice as many rounds apart
    log = store.read_appended("fetch_log").filter(
        F.col("url_canon") == "http://site0.test/p/1"
    ).collect()
    # scheduled twice: the deferred attempt (not ok) and, 3 rounds later,
    # the real fetch (ok)
    assert len(log) == 2
    assert sorted(r["ok"] for r in log) == [False, True]
    rounds = sorted(r["round"] for r in log)
    assert rounds[1] - rounds[0] == 3
    assert any(h["deferred"] > 0 for h in history)


def test_skip_matches_oracle(spark, tmp_path):
    """SkipTaskError: /p/2 pages are skipped — counted success, no items,
    no followed links from them."""

    def skip_handler(df, ctx):
        return df.withColumn("_skip", F.col("url_canon").rlike(r"/p/2$"))

    def skip_rule(url_canon):
        import re
        return bool(re.search(r"/p/2$", url_canon))

    store, history, expected = run_pair(
        spark, tmp_path,
        handlers={"before_parse": [(100, skip_handler)]},
        oracle_kw={"skip_rule": skip_rule},
    )
    assert_match(spark, store, history, expected)
    items = {r["url"] for r in store.read_appended("items").collect()}
    assert "http://site0.test/p/2" not in items
    log = store.read_appended("fetch_log").filter(
        F.col("url_canon") == "http://site0.test/p/2"
    ).collect()
    assert len(log) == 1 and log[0]["ok"]  # counted success (crawler.py:85-86)


def test_family_scoped_handler(spark, tmp_path):
    """A handler with a family only touches rows of that family
    (middleware.py:74-88); other families pass through untouched."""
    seeds = [
        {"url": "http://site0.test/p/0", "family": "A"},
        {"url": "http://site1.test/p/0", "family": "B"},
    ]
    corpus = fixture_corpus_df(spark, n_hosts=2, depth=1, fanout=2)

    def skip_all(df, ctx):
        return df.withColumn("_skip", F.lit(True))

    cfg = CrawlConfig(
        seeds=seeds, follow_patterns=[],  # no following: families stay on seeds
        handlers={"before_parse": [(100, skip_all, "B")]},
    )
    store = CheckpointStore(str(tmp_path / "state"), spark)
    CrawlEngine(spark, cfg, store).run(corpus)
    items = {r["url"]: r["family"] for r in store.read_appended("items").collect()}
    # family A parsed normally; family B was skipped by its scoped handler
    assert "http://site0.test/p/0" in items and items["http://site0.test/p/0"] == "A"
    assert "http://site1.test/p/0" not in items
    log = {r["url_canon"]: r["ok"] for r in store.read_appended("fetch_log").collect()}
    assert log["http://site1.test/p/0"]  # skipped == success, not retried


def test_per_request_status_allowed_and_method(spark, tmp_path):
    """status_allowed is per-Request (http.py:101): the same 503 resource is
    ok for a request that allows 503 and a retry-then-fail for one that
    doesn't. method is part of the fetch identity (http.py:100,142): a POST
    to a GET-only corpus misses."""
    def page(url, status=None):
        html = f"<html><body><p>{url}</p></body></html>".encode()
        row = {"url": url, "warc_ts": None, "html": html,
               "text": html.decode(), "lang": "en", "encoding": "utf-8"}
        if status is not None:
            row["status"] = status
        return row

    pages = [
        page("http://site0.test/ok"),
        page("http://site0.test/flaky", status=503),
        page("http://site1.test/flaky", status=503),
    ]
    import pyspark.sql.types as T

    schema = T.StructType(
        list(CORPUS_SCHEMA.fields) + [T.StructField("status", T.IntegerType())]
    )
    corpus = spark.createDataFrame(
        [{**p, "status": p.get("status", 200)} for p in pages], schema
    )
    seeds = [
        {"url": "http://site0.test/ok"},                                   # 200 -> ok
        {"url": "http://site0.test/flaky", "status_allowed": [503]},       # 503 allowed -> ok
        {"url": "http://site1.test/flaky"},                                # 503 -> retry/fail
        {"url": "http://site0.test/ok", "method": "POST"},                 # POST -> miss
    ]
    cfg = CrawlConfig(seeds=seeds, follow_patterns=[], max_tries=2)
    store = CheckpointStore(str(tmp_path / "state"), spark)
    history = CrawlEngine(spark, cfg, store).run(corpus)

    oracle = OracleCrawl(pages, seeds, [], max_tries=2, t0=cfg.t0)
    expected = oracle.run(max_rounds=cfg.max_rounds)
    assert_match(spark, store, history, expected)

    items = {r["url"]: r["extracted_text"] for r in store.read_appended("items").collect()}
    assert "http://site0.test/flaky" in items      # allowed 503 parsed
    assert "http://site1.test/flaky" not in items  # disallowed 503 dropped
    failed = {r["url_canon"] for r in store.read_appended("failed").collect()}
    assert failed == {"http://site1.test/flaky", "http://site0.test/ok"}
