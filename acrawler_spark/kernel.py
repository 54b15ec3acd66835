"""Pure-Python semantic kernel — exact reference semantics, zero Spark deps.

Every function here replicates, bit-for-bit, a behavior of the reference
crawler (wind2sing/aCrawler at /root/reference). These are the single source
of truth for both the Spark engine (wrapped as Arrow-batched pandas UDFs in
``acrawler_spark.functions``) and the hermetic test oracle
(``tests/oracle.py``). They are plain str/bytes functions so they can be
unit-tested against the reference's own golden values without a SparkSession.

Reference citations are ``path:line`` into /root/reference.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urljoin, urlsplit

# ---------------------------------------------------------------------------
# URL canonicalization + fingerprint (reference http.py:120-145)
# ---------------------------------------------------------------------------

# Golden value pinned by the reference's own test suite
# (reference tests/test_request.py:8-10).
GOLDEN_URL = "https://httpbin.org/cookies/set?name=crawler&age=18"
GOLDEN_FINGERPRINT = "7c6accfd1f05cb417373b9f00f3d9b1bd90bbb78"


def canonicalize_url(url: str) -> str:
    """Sorted-query, fragment-stripped canonical form.

    Reference (http.py:120-126) splits yarl's ``raw_query_string`` on ``&``,
    sorts the whole ``k=v`` strings lexicographically, rejoins, and strips
    ``#fragment``. yarl also normalizes an empty path to ``/`` — matched here
    so fingerprints agree on host-only URLs.
    """
    base, _, _fragment = url.partition("#")
    pre, sep, query = base.partition("?")
    # yarl: URL("http://host.test") -> str "http://host.test/"
    parts = urlsplit(pre)
    if parts.netloc and not parts.path:
        pre = pre + "/"
    if sep:
        # empty query keeps its '?' — reference replaces "" with "" (no-op)
        query = "&".join(sorted(query.split("&")))
        return pre + "?" + query
    return pre


def fingerprint(url: str, method: str = "GET") -> str:
    """sha1(canonical_url_utf8 || method_utf8) hexdigest (http.py:138-145)."""
    fp = hashlib.sha1()
    fp.update(canonicalize_url(url).encode())
    fp.update(method.encode())
    return fp.hexdigest()


def url_host(url: str) -> str:
    """Host component, as used for politeness budgets (counter.py:79,89)."""
    return urlsplit(url).hostname or ""


# ---------------------------------------------------------------------------
# Frontier score (reference task.py:92-93)
# ---------------------------------------------------------------------------

SCORE_PRIORITY_WEIGHT = 10_000_000_000


def score(priority: int, exetime: float) -> float:
    """``priority * 1e10 - exetime``: priority dominates; within a priority,
    earlier exetime => larger score => scheduled first (FIFO, task.py:29-30).

    NOTE (scale): at epoch-seconds magnitude this loses sub-second precision
    in float64; the Spark engine never sorts by this scalar — it sorts by the
    equivalent composite key (priority DESC, exetime ASC, fingerprint ASC).
    This scalar exists for parity tests and metrics only.
    """
    return priority * SCORE_PRIORITY_WEIGHT - exetime


SORT_KEY_DOC = "(priority DESC, exetime ASC, fingerprint ASC)"


# ---------------------------------------------------------------------------
# Body decode (reference http.py:291-298)
# ---------------------------------------------------------------------------

def decode_body(body: bytes, encoding: str = "utf-8") -> str:
    """Decode with the declared encoding; on failure re-decode with
    ``errors='ignore'`` — exactly the reference's fallback chain."""
    try:
        return body.decode(encoding)
    except Exception:
        return body.decode(encoding, "ignore")


# ---------------------------------------------------------------------------
# Link absolutization (reference utils.py:125-153)
# ---------------------------------------------------------------------------
# The regex and skip rules define the byte-identical `text` invariant
# (BASELINE.json input_hint), so they must match the reference exactly:
# non-greedy groups, re.S, and the '#'/'javascript:'/'mailto:' skip list.

LINK_PATTERN = re.compile(r"<(.*?)(src|href)=(\"|')(.*?)(\"|')(.*?)>", re.S)

_SKIP_PREFIXES = ("javascript:", "mailto:")


def _base_root(base_url: str) -> str | None:
    """``scheme://netloc`` of an http(s) base, exactly as ``urljoin``
    computes it for a root-relative href — or None when the base falls
    outside the fast shapes (non-http scheme, or tab/CR/LF characters
    that ``urlsplit`` would strip). Computed once per page so per-link
    joins are O(len(href))."""
    if base_url.startswith("http://"):
        i = 7
    elif base_url.startswith("https://"):
        i = 8
    else:
        return None
    if "\t" in base_url or "\n" in base_url or "\r" in base_url:
        return None
    for j in range(i, len(base_url)):
        c = base_url[j]
        if c == "/" or c == "?" or c == "#":
            return base_url[:j]
    return base_url


def fast_urljoin(base_url: str, href: str, root: str | None = None) -> str:
    """Byte-identical fast path of ``urllib.parse.urljoin`` for the hot
    shape: a root-relative href (``/path...``) against an http(s) base.
    ``urljoin`` spends ~6.5 us/call re-splitting the base; page hrefs are
    overwhelmingly root-relative, so the engine joins them as
    ``scheme://netloc + href`` (~1 us). Every other shape — absolute,
    protocol-relative (``//``), document-relative, hrefs carrying tab/CR/
    LF that ``urlsplit`` strips — falls back to ``urljoin`` verbatim.
    Equivalence is pinned by differential fuzzing
    (tests/test_kernel_fastpath.py) and, for the absolutize path, by the
    spec-vs-fast byte-identity property that already fuzzes this join.

    ``root`` is the precomputed :func:`_base_root` for callers joining
    many hrefs against one page URL.

    Empty-component shapes fall back too: ``urljoin`` round-trips through
    ``urlparse``/``urlunparse``, which DROP an empty params (``;`` with
    nothing after, up to ``?``/``#``), empty query (``?`` at end or
    immediately before ``#``), or empty fragment (trailing ``#``) — e.g.
    ``/p?`` -> ``/p``, ``/p?#f`` -> ``/p#f``, ``/p;`` -> ``/p``. An empty
    query can only arise with ``?`` at end-of-string or right before
    ``#``; an empty fragment only with a trailing ``#``; an empty params
    only when ``;`` is present — so guarding those shapes (conservatively
    for ``;``) is exact."""
    if (
        href.startswith("/")
        and not href.startswith("//")
        and "/." not in href  # '.'/'..' path segments: urljoin normalizes them
        and "\t" not in href
        and "\n" not in href
        and "\r" not in href
        and ";" not in href  # possible empty params: urljoin drops them
        and not href.endswith("?")  # empty query dropped by urljoin
        and not href.endswith("#")  # empty fragment dropped by urljoin
        and "?#" not in href  # empty query before fragment dropped
    ):
        r = _base_root(base_url) if root is None else root
        if r is not None:
            return r + href
    return urljoin(base_url, href)


def _absolutize_match(match: re.Match, base_url: str) -> str:
    href = match.group(4)
    new_url = href
    if href and not href.startswith("#") and not href.startswith(_SKIP_PREFIXES):
        new_url = urljoin(base_url, href)
    return (
        "<"
        + match.group(1)
        + match.group(2)
        + "="
        + match.group(3)
        + new_url
        + match.group(5)
        + match.group(6)
        + ">"
    )


def make_text_links_absolute_spec(text: str, base_url: str) -> str:
    """Rewrite every src=/href= attribute to an absolute URL — the SPEC
    implementation: literally the reference regex + sub. Kept as the
    differential-test oracle for the fast path below; byte-identical
    output is the contract."""
    return LINK_PATTERN.sub(lambda m: _absolutize_match(m, base_url), text)


def make_text_links_absolute(text: str, base_url: str) -> str:
    """Byte-identical fast path of :func:`make_text_links_absolute_spec`.

    The reference regex is quadratic: with ``re.S``, every ``<`` that is
    not followed by a src=/href= attribute lazily expands ``(.*?)``
    through the remainder of the page before failing — ~2 ms per 100 KB
    page, 95% of the parse kernel's CPU (and adversarially O(n^2) on
    pathological pages at corpus scale). This emulates the regex engine's
    exact leftmost-match / lazy-expansion order with C-speed ``str.find``
    in one linear pass:

    * leftmost match starts at the first ``<`` after the previous match;
    * group1 ``(.*?)`` expansion == taking src=/href= *sites* in start
      order (at equal expansion the alternation can't tie: the two
      literals can't start at the same index);
    * a site completes iff the char after ``=`` is a quote, ANOTHER
      quote char occurs later (lazy group4 — note group5 is an
      independent ``("|')`` alternation, NOT a backreference: either
      quote closes), and a ``>`` follows it (lazy group6); otherwise the
      engine keeps expanding group1 — i.e. we advance to the next site.
      (If no ``>`` exists after the *first* closing quote, none exists
      after any later one, so trying longer group4 expansions — the
      engine's backtrack order — cannot succeed either; skipping
      straight to the next site is equivalent.)
    * only group4 (the href value) is rewritten; the match is consumed
      through the ``>``.

    Equivalence is pinned by tests/test_kernel_fastpath.py: differential
    fuzzing (hypothesis) + the fixture corpus, fast == spec byte-for-byte.
    """
    find = text.find
    n = len(text)
    out = []
    pos = 0
    root = _base_root(base_url)
    i_src = i_href = -2  # -2 = not yet searched; -1 = exhausted
    while True:
        lt = find("<", pos)
        if lt == -1:
            break
        k = lt + 1
        m_end = -1
        while True:
            # memoized finds: str.find is monotone in its start index, so a
            # cached hit at >= k is still the next occurrence, and a cached
            # -1 (exhausted) stays -1 — each literal is scanned for at most
            # once per position instead of once per site retry
            if i_src != -1 and i_src < k:
                i_src = find("src=", k)
            if i_href != -1 and i_href < k:
                i_href = find("href=", k)
            if i_src == -1 and i_href == -1:
                break
            if i_src != -1 and (i_href == -1 or i_src < i_href):
                site, alen = i_src, 4
            else:
                site, alen = i_href, 5
            eq_end = site + alen
            if eq_end >= n:
                break
            q = text[eq_end]
            if q != '"' and q != "'":
                k = site + 1
                continue
            c2a = find('"', eq_end + 1)
            c2b = find("'", eq_end + 1)
            c2 = c2a if c2b == -1 or (c2a != -1 and c2a < c2b) else c2b
            if c2 == -1:
                k = site + 1
                continue
            gt = find(">", c2 + 1)
            if gt == -1:
                k = site + 1
                continue
            href = text[eq_end + 1 : c2]
            if href and not href.startswith("#") and not href.startswith(_SKIP_PREFIXES):
                out.append(text[pos : eq_end + 1])
                out.append(fast_urljoin(base_url, href, root))
                out.append(text[c2 : gt + 1])
            else:
                out.append(text[pos : gt + 1])
            m_end = gt + 1
            break
        if m_end == -1:
            break
        pos = m_end
    out.append(text[pos:])
    return "".join(out)


def extracted_text(body: bytes, encoding: str, url: str, links_to_abs: bool = True) -> str:
    """The reference's ``Response.text`` (http.py:284-304): decode, then
    absolutize iff ``links_to_abs``. This is the byte-identical oracle."""
    raw = decode_body(body, encoding)
    return make_text_links_absolute(raw, url) if links_to_abs else raw


# ---------------------------------------------------------------------------
# Link extraction (reference parser.py:84-98: parsel `a::attr(href)`)
# ---------------------------------------------------------------------------
# parsel/lxml are not in this sandbox; for the well-formed fixture HTML a
# regex over <a ...> tags reproduces `a::attr(href)` document order. The
# href value group mirrors LINK_PATTERN's quote handling.

A_HREF_PATTERN = re.compile(r"<a\s[^>]*?href=(\"|')(.*?)\1", re.S | re.I)


def extract_hrefs(html: str) -> list[str]:
    """All <a href=...> values in document order (may contain duplicates —
    the dedup layer, not extraction, removes them; scheduler.py:282-291)."""
    return [m.group(2) for m in A_HREF_PATTERN.finditer(html)]


def follow_links(html: str, base_url: str, follow_patterns: list[str] | None = None) -> list[str]:
    """parser.py:84-98: urljoin every href against the page URL, keep those
    matching any follow pattern (regex ``search``); no patterns => keep all
    (Response.follow semantics, http.py:387-435)."""
    root = _base_root(base_url)
    links = [fast_urljoin(base_url, href, root) for href in extract_hrefs(html)]
    if not follow_patterns:
        return links
    compiled = [re.compile(p) for p in follow_patterns]
    return [l for l in links if any(p.search(l) for p in compiled)]


# ---------------------------------------------------------------------------
# Politeness budget math (reference counter.py:70-109)
# ---------------------------------------------------------------------------

def special_host_budget(host: str, special: dict[str, int]) -> int | None:
    """MAX_REQUESTS_SPECIAL_HOST match is by *substring* of the host
    (counter.py:79: ``host in req.url.host``), not equality. A special match
    suppresses the uniform per-host check (counter.py:76-88). Multiple
    matching patterns each consume a slot in the reference; the batch engine
    uses the min of matching budgets (equivalent admission set per round).
    Returns None when no special pattern matches."""
    budgets = [cap for pat, cap in special.items() if pat in host]
    if not budgets:
        return None
    return min(budgets)


def host_budget(host: str, uniform: int, special: dict[str, int]) -> int:
    """Effective per-round budget for a host. 0/negative uniform means
    unlimited (counter.py:21-23: ``unicheck = uni > 0``); represented here
    as a very large cap so Window ranking stays uniform."""
    sp = special_host_budget(host, special)
    if sp is not None:
        return sp
    return uniform if uniform > 0 else 1 << 30
