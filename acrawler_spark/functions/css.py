"""CSS selector fallback for item rules outside the regex-compilable subset.

The fast path (operators/items.py) compiles ``tag.class::text`` and
``tag::attr(name)`` to JVM regexp expressions — zero Python in the hot
loop. Real selectors are richer (reference ParselItem accepts any parsel
css rule, item.py:229-337): descendant/child combinators, multiple
classes, ``#id``. parsel/lxml are not in this sandbox, so this module
implements the needed subset over a stdlib ``html.parser`` mini-DOM and
is applied as an Arrow-batched pandas UDF — the declared slow-path seam
(items.py module docstring): one Python pass per page batch, vectorized
transfer, no per-row UDF.

Supported grammar::

    selector  := step ( ( ' ' | ' > ' ) step )* pseudo?
    step      := (tag | '*') ('.' class)* ('#' id)?
    pseudo    := '::text' | '::attr(name)'

Semantics follow parsel/W3C: ``' '`` = descendant, ``'>'`` = direct
child; ``::text`` yields the element's *direct* text nodes (parsel css
``a::text`` -> xpath ``a/text()``); ``::attr(n)`` yields the attribute
value of matched elements that carry it; matches are returned in
document order. ``get`` = first yield, ``getall`` = all yields
(item.py:240-277).
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf resolves
# the pd.Series type hints at runtime and PEP-563 stringified hints break it.

import re
from dataclasses import dataclass
from html.parser import HTMLParser

# elements that never take a closing tag (HTML5 void elements)
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag, attrs, parent):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # Node | str (text)
        self.parent = parent

    @property
    def classes(self) -> set:
        return set((self.attrs.get("class") or "").split())

    def iter_elements(self):
        for c in self.children:
            if isinstance(c, Node):
                yield c
                yield from c.iter_elements()

    def direct_text(self) -> list[str]:
        return [c for c in self.children if isinstance(c, str)]


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        if tag not in _VOID:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag):
        # pop to the nearest open ancestor with this tag (lenient on
        # mis-nesting, like lxml's recover mode)
        n = self.cur
        while n is not self.root and n.tag != tag:
            n = n.parent
        if n is not self.root:
            self.cur = n.parent

    def handle_data(self, data):
        if data:
            self.cur.children.append(data)


def parse_html(text: str) -> Node:
    b = _TreeBuilder()
    b.feed(text or "")
    return b.root


_STEP = re.compile(r"^([\w-]+|\*)?((?:\.[\w-]+)*)(?:#([\w-]+))?$")
_PSEUDO = re.compile(r"::(text|attr\(([\w-]+)\))$")


@dataclass(frozen=True)
class Step:
    combinator: str  # ' ' (descendant) or '>' (child)
    tag: str | None
    classes: frozenset
    id: str | None

    def matches(self, n: Node) -> bool:
        if self.tag and self.tag != "*" and n.tag != self.tag:
            return False
        if self.classes and not self.classes <= n.classes:
            return False
        if self.id and n.attrs.get("id") != self.id:
            return False
        return True


@dataclass(frozen=True)
class Selector:
    steps: tuple
    pseudo: str | None  # 'text' | 'attr' | None
    attr: str | None


def parse_selector(sel: str) -> Selector:
    sel = sel.strip()
    pseudo = attr = None
    m = _PSEUDO.search(sel)
    if m:
        pseudo = "attr" if m.group(2) else "text"
        attr = m.group(2)
        sel = sel[: m.start()]
    tokens = sel.replace(">", " > ").split()
    steps, comb = [], " "
    for tok in tokens:
        if tok == ">":
            comb = ">"
            continue
        sm = _STEP.match(tok)
        if not sm or not (sm.group(1) or sm.group(2) or sm.group(3)):
            raise ValueError(f"unsupported selector step: {tok!r} in {sel!r}")
        steps.append(
            Step(
                comb,
                sm.group(1),
                frozenset(c for c in sm.group(2).split(".") if c),
                sm.group(3),
            )
        )
        comb = " "
    if not steps:
        raise ValueError(f"empty selector: {sel!r}")
    return Selector(tuple(steps), pseudo, attr)


def _match(root: Node, steps: tuple) -> list[Node]:
    """Left-to-right combinator walk; result in document order, deduped."""
    current = [root]
    for step in steps:
        nxt, seen = [], set()
        for base in current:
            pool = (
                (c for c in base.children if isinstance(c, Node))
                if step.combinator == ">"
                else base.iter_elements()
            )
            for n in pool:
                if id(n) not in seen and step.matches(n):
                    seen.add(id(n))
                    nxt.append(n)
        current = nxt
    # re-establish document order across bases
    order = {id(n): i for i, n in enumerate(root.iter_elements())}
    return sorted(current, key=lambda n: order.get(id(n), -1))


def select(html_text: str, selector: Selector) -> list[str]:
    """All yields of the selector over one document (parsel .getall())."""
    nodes = _match(parse_html(html_text), selector.steps)
    out: list[str] = []
    for n in nodes:
        if selector.pseudo == "text":
            out.extend(n.direct_text())
        elif selector.pseudo == "attr":
            v = n.attrs.get(selector.attr)
            if v is not None:
                out.append(v)
        else:  # no pseudo: parsel returns the serialized element; the
            # engine's consumers only ever use ::text/::attr — keep the
            # direct text as a pragmatic stand-in and document it
            out.extend(n.direct_text())
    return out


def make_select_udf(selector_str: str, getall: bool):
    """Pandas-UDF Column factory: string -> first match (get) or
    array<string> of all matches (getall). NULL when nothing matched,
    mirroring the regex path's no-match -> NULL contract."""
    import pandas as pd
    from pyspark.sql import functions as F

    sel = parse_selector(selector_str)

    if getall:
        @F.pandas_udf("array<string>")
        def udf_all(texts: pd.Series) -> pd.Series:
            return texts.map(lambda t: (select(t, sel) or None) if t is not None else None)

        return udf_all

    @F.pandas_udf("string")
    def udf_first(texts: pd.Series) -> pd.Series:
        def first(t):
            if t is None:
                return None
            r = select(t, sel)
            return r[0] if r else None

        return texts.map(first)

    return udf_first
