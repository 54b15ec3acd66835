"""The linear-time absolutize fast path must be byte-identical to the
reference regex (the spec) on EVERY input — fuzzed + fixture-pinned."""

import re

from hypothesis import given, settings, strategies as st

from acrawler_spark.kernel import (
    make_text_links_absolute,
    make_text_links_absolute_spec,
)

BASE = "http://site0.test/a/b?x=1"

# alphabet biased toward the regex's meta-structure: tags, quotes, attr
# literals, skip prefixes, nesting and truncation shapes
_CHUNKS = st.sampled_from(
    [
        "<", ">", '"', "'", "=", "#", " ",
        "src=", "href=", "src", "href",
        "<a ", "<img ", "</a>", "<div>",
        'href="/p/1"', "href='x'", 'src="s.png"',
        'href="#top"', 'href="javascript:void(0)"', 'href="mailto:a@b"',
        'href="http://other.test/q?b=2&a=1#f"',
        "text", "x", "\n", 'href="', "src='", 'href=">',
        '<a href="/1"><b src=\'2\'>', "< src=\"", "='",
    ]
)


@settings(max_examples=3000, deadline=None)
@given(st.lists(_CHUNKS, min_size=0, max_size=40))
def test_fuzz_fast_equals_spec(chunks):
    text = "".join(chunks)
    assert make_text_links_absolute(text, BASE) == make_text_links_absolute_spec(
        text, BASE
    )


@settings(max_examples=500, deadline=None)
@given(st.text(alphabet='<>"\'=#shrefcja:v/. \n', max_size=200))
def test_fuzz_raw_text(text):
    assert make_text_links_absolute(text, BASE) == make_text_links_absolute_spec(
        text, BASE
    )


_BASES = st.sampled_from(
    [
        "http://site0.test/a/b?x=1",
        "https://h.example",
        "http://h.example:8080/p/q#frag",
        "http://user:pw@h.example/p",
        "HTTP://UPPER.test/p",          # uppercase scheme: urljoin lowercases it
        "http://h.example?x=1",         # query with no path
        "http://h.example#f",
        "http:///nonetloc",
        "ftp://other.scheme/p",
        "relative/base",
        "http://bad\thost/p",           # tab stripped by urlsplit
        "",
    ]
)

_HREF_CHUNKS = st.sampled_from(
    [
        "/", "//", "p", "/p/1", "?b=2&a=1", "#frag", "http://x.test/q",
        "https://y.test", "HTTP://Z.test/p", "..", "../q", "./q",
        "javascript:void(0)", "mailto:a@b", " ", "\t", "\n", "\r",
        "%20", ":", "@", "//proto.rel/p", "\x0b", "a b",
        # empty-component shapes: urljoin drops empty params/query/fragment
        "?", "#", ";", "?#", "/p?", "/p#", "/p;", ";x",
    ]
)


@settings(max_examples=3000, deadline=None)
@given(_BASES, st.lists(_HREF_CHUNKS, min_size=0, max_size=6))
def test_fuzz_fast_urljoin_equals_urljoin(base, href_chunks):
    from urllib.parse import urljoin

    from acrawler_spark.kernel import _base_root, fast_urljoin

    href = "".join(href_chunks)
    assert fast_urljoin(base, href) == urljoin(base, href)
    # and with the per-page precomputed root (the hot-loop form)
    assert fast_urljoin(base, href, _base_root(base)) == urljoin(base, href)


@settings(max_examples=800, deadline=None)
@given(
    st.text(alphabet="htps:/.?#;@ \t\nabZ019-", max_size=40),
    st.text(alphabet="htps:/.?#;@ \t\nabZ019-%", max_size=30),
)
def test_fuzz_fast_urljoin_raw_strings(base, href):
    from urllib.parse import urljoin

    from acrawler_spark.kernel import fast_urljoin

    assert fast_urljoin(base, href) == urljoin(base, href)


def test_fixture_pages_identical():
    from acrawler_spark.sources.corpus import build_fixture_pages

    pages = build_fixture_pages(n_hosts=3, depth=3, fanout=3)
    assert pages
    for p in pages:
        raw = p["html"].decode(p.get("encoding", "utf-8"), "ignore")
        assert make_text_links_absolute(raw, p["url"]) == make_text_links_absolute_spec(
            raw, p["url"]
        )


def test_spec_still_matches_reference_regex_shape():
    # the spec constant itself must stay the reference's exact pattern
    # (utils.py:125-153)
    from acrawler_spark.kernel import LINK_PATTERN

    assert LINK_PATTERN.pattern == r"<(.*?)(src|href)=(\"|')(.*?)(\"|')(.*?)>"
    assert LINK_PATTERN.flags & re.S


def test_empty_component_hrefs_match_urljoin():
    # Regression (r4 ADVICE): urljoin round-trips through urlparse/urlunparse,
    # which DROP empty params/query/fragment; the fast path must fall back.
    from urllib.parse import urljoin

    from acrawler_spark.kernel import fast_urljoin

    base = "http://host.test/a/b"
    for href in ["/p?", "/p#", "/p;", "/p?#f", "/p;?", "/p?#", "/p?q=1#",
                 "/p?#q", "/p??", "/p##", "/p?;", "/p;x", "/p;x?y"]:
        assert fast_urljoin(base, href) == urljoin(base, href), href
    # and through the absolutize fast path (uses fast_urljoin internally)
    text = '<a href="/p?"><a href="/p?#f"><a href="/p;">'
    assert make_text_links_absolute(text, base) == make_text_links_absolute_spec(
        text, base
    )


def test_crossing_tags_and_unclosed():
    cases = [
        '<div>junk href="/x">tail',          # group1 spans the div tag
        '<a href="/1"></a><a href="/2"></a>',
        '<a href=nofollow>',                  # unquoted value: no match
        '<a href="/unclosed',                 # no closing quote
        '<a href="/noclose"',                 # no >
        '<img src="a.png"><a href="#f"></a>',
        '< href="">',
        "<" * 50 + 'href="/deep">',
    ]
    for text in cases:
        assert make_text_links_absolute(text, BASE) == make_text_links_absolute_spec(
            text, BASE
        ), text
