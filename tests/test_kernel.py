"""Kernel semantics pinned to the reference's own golden values.

Reference assertions: tests/test_request.py:8-31 (fingerprint + canonical
equalities), utils.py:125-153 (absolutize), http.py:291-298 (decode).
"""

from acrawler_spark import kernel as K


def test_golden_fingerprint():
    # reference tests/test_request.py:8-10
    assert K.fingerprint(K.GOLDEN_URL) == K.GOLDEN_FINGERPRINT


def test_canonicalization_equalities():
    # reference tests/test_request.py:13-23: query order irrelevant,
    # fragment stripped
    a = K.fingerprint("https://httpbin.org/cookies/set?name=crawler&age=18")
    b = K.fingerprint("https://httpbin.org/cookies/set?age=18&name=crawler")
    c = K.fingerprint("https://httpbin.org/cookies/set?age=18&name=crawler#fragment")
    assert a == b == c


def test_distinct_urls_distinct_fps():
    # reference tests/test_request.py:26-31
    fps = {
        K.fingerprint("https://httpbin.org/cookies/set?name=crawler&age=18"),
        K.fingerprint("https://httpbin.org/cookies/set?name=crawler"),
        K.fingerprint("https://httpbin.org/cookies/set"),
        K.fingerprint("https://httpbin.org/cookies"),
    }
    assert len(fps) == 4


def test_method_in_fingerprint():
    assert K.fingerprint("http://a.test/x", "GET") != K.fingerprint("http://a.test/x", "POST")


def test_host_only_url_gets_slash():
    # yarl: str(URL("http://host.test")) == "http://host.test/"
    assert K.canonicalize_url("http://host.test") == "http://host.test/"
    assert K.fingerprint("http://host.test") == K.fingerprint("http://host.test/")


def test_score_ordering():
    # task.py:92-93: priority dominates; within priority, earlier exetime wins
    assert K.score(3, 100.0) > K.score(1, 1.0)
    assert K.score(1, 1.0) > K.score(1, 2.0)


def test_decode_fallback():
    # http.py:291-298: invalid bytes fall back to errors='ignore'
    assert K.decode_body(b"caf\xc3\xa9", "utf-8") == "café"
    assert K.decode_body(b"caf\xff\xe9", "utf-8") == "caf"  # bad bytes dropped


def test_absolutize_matches_reference_semantics():
    base = "http://site0.test/p/1"
    html = (
        '<a href="/p/2">x</a>'
        '<a href="p/3">y</a>'
        "<img src='img.png'>"
        '<a href="#top">t</a>'
        '<a href="javascript:void(0)">j</a>'
        '<a href="mailto:a@b.c">m</a>'
        '<a href="http://other.test/q">abs</a>'
    )
    out = K.make_text_links_absolute(html, base)
    assert '<a href="http://site0.test/p/2">' in out
    assert '<a href="http://site0.test/p/p/3">' in out  # urljoin vs relative base
    assert "<img src='http://site0.test/p/img.png'>" in out
    # skip rules (utils.py:128-136): '#', javascript:, mailto: untouched
    assert '<a href="#top">' in out
    assert '<a href="javascript:void(0)">' in out
    assert '<a href="mailto:a@b.c">' in out
    assert '<a href="http://other.test/q">' in out


def test_absolutize_idempotent_on_absolute():
    html = '<a href="http://x.test/a">z</a>'
    assert K.make_text_links_absolute(html, "http://y.test/") == html


def test_extract_hrefs_document_order_with_dupes():
    html = '<p><a id="1" href="/a">1</a><a href="/b">2</a><a href="/a">3</a></p>'
    assert K.extract_hrefs(html) == ["/a", "/b", "/a"]


def test_follow_links_patterns():
    html = '<a href="/p/2">x</a><a href="/other/3">y</a>'
    base = "http://s.test/p/1"
    assert K.follow_links(html, base) == ["http://s.test/p/2", "http://s.test/other/3"]
    assert K.follow_links(html, base, [r"/p/"]) == ["http://s.test/p/2"]


def test_politeness_budgets():
    # counter.py:77-94: substring match, special suppresses uniform
    special = {"hot": 1, "site1": 2}
    assert K.special_host_budget("hotsite.test", special) == 1
    assert K.special_host_budget("site1.test", special) == 2
    assert K.special_host_budget("cold.test", special) is None
    assert K.host_budget("cold.test", 3, special) == 3
    assert K.host_budget("hotsite.test", 3, special) == 1
    assert K.host_budget("cold.test", 0, special) == 1 << 30  # 0 = unlimited
