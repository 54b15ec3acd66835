"""CSS/XPath selector fallback for item rules outside the regex subset.

The fast path (operators/items.py) compiles ``tag.class::text`` and
``tag::attr(name)`` to JVM regexp expressions — zero Python in the hot
loop. Real selectors are richer (reference ParselItem accepts any parsel
css OR xpath rule, item.py:240-277 + 318-332: ``self.sel.css(rule)`` /
``self.sel.xpath(rule)``). parsel/lxml are not in this sandbox, so this
module implements the needed subset over a stdlib ``html.parser``
mini-DOM and is applied as an Arrow-batched pandas UDF — the declared
slow-path seam (items.py module docstring): one Python pass per page
batch, vectorized transfer, no per-row UDF.

Supported CSS grammar::

    selector  := step ( ( ' ' | ' > ' ) step )* pseudo?
    step      := (tag | '*') ('.' class)* ('#' id)?
    pseudo    := '::text' | '::attr(name)'

Supported XPath grammar (the Scrapy-habituated subset; anything outside
it still raises ValueError at spec-build time)::

    xpath     := ( '//' | '/' ) step ( ( '//' | '/' ) step )* trailer?
    step      := (tag | '*') predicate*
    predicate := '[@attr="v"]' | "[@attr='v']" | '[@attr]'
    trailer   := '/text()' | '//text()' | '/@attr'

Semantics follow parsel/W3C: css ``' '`` / xpath ``'//'`` = descendant,
css ``'>'`` / xpath ``'/'`` = direct child; ``::text`` / ``/text()``
yields the element's *direct* text nodes, ``//text()`` its descendant
text nodes; ``::attr(n)`` / ``/@n`` yields the attribute value of
matched elements that carry it; a selector with no pseudo/trailer
yields the serialized element (outer HTML), as parsel's ``.get()`` does
on an element. ``[@class="v"]`` is exact attribute equality (xpath
semantics), unlike css ``.v`` which is class-token membership. Matches
are returned in document order. ``get`` = first yield, ``getall`` =
all yields (item.py:240-277).
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

    def all_text(self) -> list[str]:
        """Descendant-or-self text nodes in document order (`//text()`)."""
        out: list[str] = []
        for c in self.children:
            if isinstance(c, str):
                out.append(c)
            else:
                out.extend(c.all_text())
        return out


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
    # xpath attribute predicates: (name, value) = exact equality,
    # (name, None) = attribute-presence ([@attr])
    attrs_eq: tuple = ()

    def matches(self, n: Node) -> bool:
        if self.tag and self.tag != "*" and n.tag != self.tag:
            return False
        if self.classes and not self.classes <= n.classes:
            return False
        if self.id and n.attrs.get("id") != self.id:
            return False
        for name, value in self.attrs_eq:
            got = n.attrs.get(name)
            if got is None or (value is not None and got != value):
                return False
        return True


@dataclass(frozen=True)
class Selector:
    steps: tuple
    pseudo: str | None  # 'text' | 'text_all' | 'attr' | None (serialized element)
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


# xpath step: tag or '*', then zero or more [@attr="v"] / [@attr='v'] / [@attr]
_XSTEP = re.compile(r"^([\w-]+|\*)((?:\[@[\w-]+(?:=(?:\"[^\"]*\"|'[^']*'))?\])*)$")
_XPRED = re.compile(r"\[@([\w-]+)(?:=(?:\"([^\"]*)\"|'([^']*)'))?\]")


def parse_xpath(expr: str) -> Selector:
    """Compile the supported xpath subset (module docstring) to the same
    Selector IR the css path uses — reference item.py:318-332 accepts
    xpath rules interchangeably with css ones. ``//`` = descendant axis,
    ``/`` = child axis; trailers ``/text()`` (direct text — what parsel's
    ``a/text()`` yields), ``//text()`` (descendant text), ``/@attr``."""
    expr = expr.strip()
    pseudo = attr = None
    if expr.endswith("//text()"):
        pseudo, expr = "text_all", expr[: -len("//text()")]
    elif expr.endswith("/text()"):
        pseudo, expr = "text", expr[: -len("/text()")]
    else:
        m = re.search(r"/@([\w-]+)$", expr)
        if m:
            pseudo, attr = "attr", m.group(1)
            expr = expr[: m.start()]
    if not expr.startswith("/"):
        raise ValueError(f"unsupported xpath (must be absolute): {expr!r}")
    steps = []
    pos = 0
    while pos < len(expr):
        if expr.startswith("//", pos):
            comb, pos = " ", pos + 2
        elif expr.startswith("/", pos):
            comb, pos = ">", pos + 1
        else:
            raise ValueError(f"unsupported xpath at {expr[pos:]!r}")
        # a step ends at the next axis '/' that is OUTSIDE a predicate
        depth, end = 0, pos
        while end < len(expr):
            ch = expr[end]
            if ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
            elif ch == "/" and depth == 0:
                break
            end += 1
        tok, pos = expr[pos:end], end
        sm = _XSTEP.match(tok)
        if not sm:
            raise ValueError(f"unsupported xpath step: {tok!r} in {expr!r}")
        preds = tuple(
            (p.group(1), p.group(2) if p.group(2) is not None else p.group(3))
            for p in _XPRED.finditer(sm.group(2))
        )
        steps.append(Step(comb, sm.group(1), frozenset(), None, preds))
    if not steps:
        raise ValueError(f"empty xpath: {expr!r}")
    # parsel's first step '//tag' or '/tag' both search from the document
    # root; '/' at depth 0 means "child of the root", which the root-based
    # walk below already implements, so nothing special to do here.
    return Selector(tuple(steps), pseudo, attr)


def parse_rule(rule: str) -> Selector:
    """Dispatch a raw item rule to the css or xpath grammar: the reference
    keeps them in separate dicts (item.py:252-277) but feeds both through
    the same Selector; here an absolute path (leading '/') is xpath."""
    return parse_xpath(rule) if rule.lstrip().startswith("/") else parse_selector(rule)


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


def _esc_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _esc_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace('"', "&quot;")


def serialize(n: Node) -> str:
    """Outer HTML of a matched element — what parsel yields for a rule
    with no ::text/::attr pseudo (``Selector.get()`` on an element).
    Re-serialized from the tree (the builder decodes charrefs, so text is
    re-escaped minimally: ``& < >`` in text, ``& \"`` in attribute
    values); attribute order is source order, void elements take no
    closing tag — lxml's conventions."""
    attrs = "".join(
        f' {k}' if v is None else f' {k}="{_esc_attr(v)}"'
        for k, v in n.attrs.items()
    )
    if n.tag in _VOID:
        return f"<{n.tag}{attrs}>"
    inner = "".join(
        _esc_text(c) if isinstance(c, str) else serialize(c) for c in n.children
    )
    return f"<{n.tag}{attrs}>{inner}</{n.tag}>"


def select(html_text: str, selector: Selector) -> list[str]:
    """All yields of the selector over one document (parsel .getall())."""
    nodes = _match(parse_html(html_text), selector.steps)
    out: list[str] = []
    for n in nodes:
        if selector.pseudo == "text":
            out.extend(n.direct_text())
        elif selector.pseudo == "text_all":
            out.extend(n.all_text())
        elif selector.pseudo == "attr":
            v = n.attrs.get(selector.attr)
            if v is not None:
                out.append(v)
        else:
            # no pseudo: the serialized element (outer HTML), matching
            # parsel's semantics for a bare element rule (ADVICE r3 #4;
            # until r4 this returned direct text as a stand-in)
            out.append(serialize(n))
    return out


def make_select_udf(selector_str: str, getall: bool):
    """Pandas-UDF Column factory: string -> first match (get) or
    array<string> of all matches (getall). NULL when nothing matched,
    mirroring the regex path's no-match -> NULL contract."""
    import pandas as pd
    from pyspark.sql import functions as F

    sel = parse_rule(selector_str)

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
