"""Round-5 additions: web-mode ancestor-group completion (until_group),
production-key exact-substring dedup, production-parameter ANN configs."""

from pyspark.sql import functions as F

from acrawler_spark.api import Crawl
from acrawler_spark.sources.corpus import fixture_corpus_df
from acrawler_spark.sources.store import CheckpointStore


def test_until_group_waits_only_for_its_group(spark, tmp_path):
    """add_then_wait semantics (reference crawler.py:332-339, web.py:30-45):
    the tagged group crawls to completion and returns its items while an
    unrelated (future-delayed) seed group stays pending in the store."""
    corpus = fixture_corpus_df(spark, n_hosts=2, depth=2, fanout=2)
    c = (
        Crawl(seeds=[{"url": "http://site1.test/p/1", "delay_s": 3600.0}])
        .follow(r"site0\.test")
    )
    items = c.until_group(
        spark, corpus, str(tmp_path / "s"), ["http://site0.test/p/0"],
        ancestor="web@q1",
    )
    got = items.collect()
    # the whole site0 subtree (depth 2, fanout 2 => 7 pages) came back
    assert len(got) == 7
    assert all("site0.test" in r.url for r in got)

    store = CheckpointStore(str(tmp_path / "s"), spark)
    fr = store.read_frontier()
    # the other group's seed is still pending (due in the future)...
    assert fr.filter(F.col("url") == "http://site1.test/p/1").count() == 1
    # ...and the completed group has no unfinished rows left
    assert fr.filter(F.col("ancestor") == "web@q1").count() == 0
    # nothing outside the group was ever fetched
    log = store.read_appended("fetch_log")
    assert log.filter(F.col("host") == "site1.test").count() == 0
    # every fetched row carries the group tag (children inherit ancestor)
    pages = store.read_appended("pages")
    assert pages.filter(F.col("ancestor") != "web@q1").count() == 0


def test_until_group_default_tag_and_seed_fields(spark, tmp_path):
    """Default tag is deterministic; delay_s/ancestor/dont_filter seed
    fields round-trip through the frontier schema."""
    from acrawler_spark.kernel import fingerprint
    from acrawler_spark.operators.frontier import seeds_frontier

    fr = seeds_frontier(
        spark,
        [
            {"url": "http://a.test/x", "ancestor": "web@g", "dont_filter": True},
            {"url": "http://a.test/y", "delay_s": 12.5},
            "http://a.test/z",
        ],
        t0=100.0,
    )
    rows = {r.url: r for r in fr.collect()}
    assert rows["http://a.test/x"].ancestor == "web@g"
    assert rows["http://a.test/x"].dont_filter is True
    assert rows["http://a.test/y"].exetime == 112.5
    assert rows["http://a.test/y"].dont_filter is False
    # untagged seeds keep the reference default: own fingerprint
    assert rows["http://a.test/z"].ancestor == fingerprint(
        "http://a.test/z"
    )

    corpus = fixture_corpus_df(spark, n_hosts=1, depth=1, fanout=2)
    items = Crawl(seeds=[]).follow(r"site0\.test").until_group(
        spark, corpus, str(tmp_path / "s2"), ["http://site0.test/p/0"]
    )
    assert items.count() == 3  # root + 2 children


def test_substr_hashkey_matches_string_key(spark):
    """The xxhash64 production key must not change the output — the pass
    is key-representation-independent (textops.q_dedup_exact_substring)."""
    from acrawler_spark.textops import q_dedup_exact_substring

    sf = "/root/testdata/sf0.001"
    a = {r.doc_id: r for r in q_dedup_exact_substring(spark, sf).collect()}
    b = {
        r.doc_id: r
        for r in q_dedup_exact_substring(spark, sf, key="hash").collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        assert (a[k].n_windows, a[k].n_dup_windows, a[k].dup_ratio) == (
            b[k].n_windows, b[k].n_dup_windows, b[k].dup_ratio
        )
