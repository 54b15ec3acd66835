"""Seen-table compaction: many deltas collapse to one base + tail deltas,
reads stay identical, resume still exact."""

from acrawler_spark.plans.engine import CrawlConfig, CrawlEngine
from acrawler_spark.sources.corpus import fixture_corpus_df, seed_urls
from acrawler_spark.sources.store import CheckpointStore

FOLLOW = [r"site\d+\.test"]


def test_compaction_preserves_seen(spark, tmp_path):
    corpus = fixture_corpus_df(spark, n_hosts=2, depth=2, fanout=3)
    cfg = CrawlConfig(
        seeds=seed_urls(2), follow_patterns=FOLLOW, bloom_bits=1 << 14,
        seen_compact_deltas=2,  # force compaction mid-crawl
    )
    store = CheckpointStore(str(tmp_path / "s"), spark)
    CrawlEngine(spark, cfg, store).run(corpus)
    m = store.read_manifest()
    assert m.get("compacted", {}).get("seen", -1) >= 0  # compaction happened
    # reference run without compaction
    store2 = CheckpointStore(str(tmp_path / "s2"), spark)
    cfg2 = CrawlConfig(seeds=seed_urls(2), follow_patterns=FOLLOW, bloom_bits=1 << 14)
    CrawlEngine(spark, cfg2, store2).run(corpus)
    seen1 = {r["fingerprint"] for r in store.read_appended("seen").collect()}
    seen2 = {r["fingerprint"] for r in store2.read_appended("seen").collect()}
    assert seen1 == seen2
    # post-compaction delta count is bounded
    assert store.delta_count("seen") <= 2
