"""Item extraction — the reference's ParselItem rule engine (item.py:229-337)
compiled to JVM column expressions over the extracted page text.

Reference semantics preserved:
* a plain rule extracts the FIRST match (``.get()``); a rule wrapped in a
  list extracts ALL matches (``.getall()``) — item.py:240-277;
* missing fields take the declared default (item.py:258-266);
* per-field processor chains run after extraction (item.py:339-360) —
  here ``functions.processors`` transformers;
* ``drop_item`` processors filter the whole row (SkipTaskImmediatelyError,
  item.py:85-87);
* ``css_divider`` splits a page into fragments, one item per fragment
  (http.py:437-449, parser.py:31-38) — posexplode of the fragment array.

Selectors, two-tier: the two css shapes the fixtures use —
``tag.class::text`` and ``tag::attr(name)`` — compile to equivalent JVM
regexp expressions (fast path; documented contract: well-formed,
non-nested target tags, which CommonCrawl-style extraction pipelines
normalize to upstream anyway). Any richer rule — css with
descendant/child combinators, multiple classes, ``#id`` (e.g.
``div.a > span::text``), a bare-element rule (serialized outer HTML),
or an xpath rule (``//div[@id="x"]/text()``, ``//a/@href`` — the
reference accepts xpath interchangeably, item.py:318-332) — falls back
to an Arrow-batched pandas UDF over a stdlib-``html.parser`` DOM
(functions/css.py), the declared slow-path seam. ``ValueError`` is
reserved for syntax neither tier parses.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from acrawler_spark.functions.processors import chain as proc_chain
from acrawler_spark.functions.processors import truthy


def _css_to_regex(selector: str) -> tuple[str, int]:
    """Compile the supported selector subset to (java_regex, group)."""
    m = re.fullmatch(r"(\w+)(?:\.([\w-]+))?::text", selector)
    if m:
        tag, cls = m.group(1), m.group(2)
        if cls:
            return (
                rf'<{tag}\b[^>]*class="[^"]*{re.escape(cls)}[^"]*"[^>]*>(.*?)</{tag}>',
                1,
            )
        return rf"<{tag}\b[^>]*>(.*?)</{tag}>", 1
    m = re.fullmatch(r"(\w+)(?:\.([\w-]+))?::attr\(([\w-]+)\)", selector)
    if m:
        tag, cls, attr = m.group(1), m.group(2), m.group(3)
        cls_part = rf'[^>]*class="[^"]*{re.escape(cls)}[^"]*"' if cls else ""
        return rf'<{tag}\b{cls_part}[^>]*{attr}=["\'](.*?)["\']', 1
    raise ValueError(f"unsupported selector: {selector!r}")


@dataclass
class FieldRule:
    """One field of an item family.

    rule: a css selector (``span.price::text``), an xpath (leading ``/``,
    e.g. ``//span[@class="price"]/text()``), or ``re:<pattern>`` for a
    raw-regex rule (reference css/xpath/re rule dicts, item.py:240-277).
    getall: list-rule semantics (``[rule]`` in the reference).
    processors: chain of functions.processors specs.
    default: value when extraction yields nothing (item.py:258-266).
    drop_item_if_falsy: SkipTaskImmediatelyError semantics (item.py:85-87).
    """

    rule: str
    getall: bool = False
    processors: list = dc_field(default_factory=list)
    default: object = None
    drop_item_if_falsy: bool = False
    # inline nested items (item.py:279-303): the rule selects fragment(s),
    # and ``inline`` extracts a sub-item struct from each fragment
    inline: "ItemSpec | None" = None

    def compile(self, text: Column) -> Column:
        regex = group = None
        if self.rule.startswith("re:"):
            regex, group = self.rule[3:], 1
        else:
            try:
                regex, group = _css_to_regex(self.rule)
            except ValueError:
                # selector outside the regex subset -> pandas-UDF DOM
                # fallback (functions/css.py); parse now so a truly
                # unsupported selector still fails at spec-build time
                from acrawler_spark.functions.css import (
                    make_select_udf,
                    parse_rule,
                )

                parse_rule(self.rule)  # raises ValueError on bad syntax
                if self.inline is not None:
                    raise ValueError(
                        "inline nested items require a regex-subset rule "
                        f"(tag.class::text / tag::attr): {self.rule!r}"
                    )
                col = make_select_udf(self.rule, self.getall)(text)
                if self.processors:
                    col = proc_chain(*self.processors)(col)
                if self.default is not None:
                    col = F.coalesce(col, F.lit(self.default))
                return col
        if self.inline is not None:
            def sub_struct(frag: Column) -> Column:
                return F.struct(
                    *[r.compile(frag).alias(n) for n, r in self.inline.fields.items()]
                )
            if self.getall:
                frags = F.regexp_extract_all(text, F.lit(regex), F.lit(group))
                return F.when(F.size(frags) > 0, F.transform(frags, sub_struct))
            frag = F.regexp_extract(text, regex, group)
            return F.when(text.rlike(regex), sub_struct(frag))
        if self.getall:
            col = F.regexp_extract_all(text, F.lit(regex), F.lit(group))
            col = F.when(F.size(col) > 0, col)  # [] -> NULL (no match)
        else:
            col = F.when(text.rlike(regex), F.regexp_extract(text, regex, group))
        if self.processors:
            col = proc_chain(*self.processors)(col)
        if self.default is not None:
            col = F.coalesce(col, F.lit(self.default))
        return col


@dataclass
class ItemSpec:
    """An item family: ParselItem subclass equivalent (item.py:200-227)."""

    family: str
    fields: dict[str, FieldRule]
    css_divider: str | None = None  # fragment selector (parser.py:31-38)
    url_pattern: str | None = None  # in_pattern gate (parser.py:62-73)
    # callback-chain routing (http.py:102-104 + parser.py:41-57): when set,
    # the spec extracts only from pages whose inherited callback_family
    # matches (follow/paginate children inherit the parent's — the
    # "listing parses with A, detail with B, pagination inherits A" shape)
    callback_family: str | None = None

    def extract(self, pages: DataFrame, text_col: str = "extracted_text") -> DataFrame:
        """pages: (url, <text_col>, round, ...) -> one row per item with the
        family's fields as typed columns + a stringified content map."""
        df = pages
        src = F.col(text_col)
        if self.css_divider:
            regex, group = _css_to_regex(self.css_divider)
            frags = F.regexp_extract_all(src, F.lit(regex), F.lit(group))
            df = df.withColumn("_frag", F.explode(frags))
            src = F.col("_frag")

        out_cols = []
        for name, rule in self.fields.items():
            out_cols.append(rule.compile(src).alias(name))
        result = df.select(
            "url",
            F.lit(self.family).alias("family"),
            *(["round"] if "round" in df.columns else []),
            *out_cols,
        )
        for name, rule in self.fields.items():
            if rule.drop_item_if_falsy:
                result = result.filter(truthy(F.col(name)))
        field_names = list(self.fields)
        content = F.map_from_arrays(
            F.array(*[F.lit(n) for n in field_names]),
            F.array(*[F.col(n).cast("string") for n in field_names]),
        )
        return result.withColumn("content", content)
