"""Item extraction rules (ParselItem equivalent) over fixture pages."""

from pyspark.sql import functions as F

from acrawler_spark.operators.items import FieldRule, ItemSpec
from acrawler_spark.sources.corpus import build_fixture_pages


def _pages_df(spark, **kw):
    pages = build_fixture_pages(**kw)
    return spark.createDataFrame(
        [(p["url"], p["text"], 1) for p in pages], "url string, extracted_text string, round int"
    ), pages


def test_field_extraction_with_processors(spark):
    df, pages = _pages_df(spark, n_hosts=2, depth=2, fanout=3)
    spec = ItemSpec(
        family="page",
        fields={
            "title": FieldRule("h1.title::text", processors=["strip"]),
            "price": FieldRule("span.price::text", processors=["to_float"]),
            "reviews": FieldRule("span.reviews::text", processors=["to_int"]),
            "date": FieldRule("span.date::text", processors=["to_date"]),
            "doc_id": FieldRule(r"re:Doc (\d+)", processors=["to_int"]),
        },
    )
    items = spec.extract(df)
    assert items.count() == df.count()
    row = items.filter(F.col("url") == "http://site0.test/p/2").first()
    assert row.title == "Doc 2"
    assert row.price == 2.5
    assert row.reviews == 7
    assert row.doc_id == 2
    assert row.content["title"] == "Doc 2"
    assert row.content["reviews"] == "7"


def test_getall_rule(spark):
    df, _ = _pages_df(spark, n_hosts=1, depth=1, fanout=3)
    spec = ItemSpec(
        family="links",
        fields={"hrefs": FieldRule("a::attr(href)", getall=True)},
    )
    row = spec.extract(df).filter(F.col("url") == "http://site0.test/p/0").first()
    # root page links 3 children (+1 duplicate for child 3) + noise links
    assert any(h.startswith("http://site0.test/p/") or h.startswith("/p/") for h in row.hrefs)
    assert "#top" in row.hrefs


def test_drop_item_if_falsy(spark):
    df = spark.createDataFrame(
        [("u1", "<span class='n'>5</span>", 1), ("u2", "no number", 1)],
        "url string, extracted_text string, round int",
    )
    spec = ItemSpec(
        family="t",
        fields={"n": FieldRule(r"re:(\d+)", processors=["to_int"], drop_item_if_falsy=True)},
    )
    out = spec.extract(df)
    assert [r.url for r in out.collect()] == ["u1"]


def test_css_divider_spawns_fragments(spark):
    html = (
        '<div class="quote"><span class="t">a</span></div>'
        '<div class="quote"><span class="t">b</span></div>'
    )
    df = spark.createDataFrame([("u", html, 1)], "url string, extracted_text string, round int")
    spec = ItemSpec(
        family="quote",
        css_divider="div.quote::text",
        fields={"t": FieldRule("span.t::text")},
    )
    out = spec.extract(df).orderBy("t").collect()
    assert [r.t for r in out] == ["a", "b"]


def test_default_value(spark):
    df = spark.createDataFrame([("u", "nothing here", 1)], "url string, extracted_text string, round int")
    spec = ItemSpec(family="d", fields={"x": FieldRule("span.x::text", default="unknown")})
    assert spec.extract(df).first().x == "unknown"


def test_inline_nested_items(spark):
    # item.py:279-303: inline rules load sub-items (per inline_divider
    # fragment) into a field
    from acrawler_spark.operators.items import FieldRule, ItemSpec

    html = (
        '<div class="book"><span class="t">B1</span><span class="p">$ 3.5</span></div>'
        '<div class="book"><span class="t">B2</span><span class="p">$ 4.0</span></div>'
    )
    df = spark.createDataFrame([("u", html, 1)], "url string, extracted_text string, round int")
    inner = ItemSpec(
        family="book",
        fields={
            "t": FieldRule("span.t::text"),
            "p": FieldRule("span.p::text", processors=["to_float"]),
        },
    )
    spec = ItemSpec(
        family="shelf",
        fields={"books": FieldRule("div.book::text", getall=True, inline=inner)},
    )
    row = spec.extract(df).first()
    assert [(b.t, b.p) for b in row.books] == [("B1", 3.5), ("B2", 4.0)]


def test_fallback_descendant_selector(spark):
    # selectors outside the regex subset (descendant/child combinators,
    # #id) drop to the functions/css.py pandas-UDF DOM fallback — these
    # raised ValueError before
    html = (
        '<div class="a"><span class="inner">yes</span></div>'
        '<div class="b"><span class="inner">no</span></div>'
        '<p id="pid">by-id</p>'
    )
    df = spark.createDataFrame(
        [("u", html, 1)], "url string, extracted_text string, round int"
    )
    spec = ItemSpec(
        family="f",
        fields={
            "child": FieldRule("div.a > span::text"),
            "descendant": FieldRule("div.a span.inner::text"),
            "by_id": FieldRule("p#pid::text"),
        },
    )
    row = spec.extract(df).first()
    assert row.child == "yes"
    assert row.descendant == "yes"
    assert row.by_id == "by-id"


def test_fallback_getall_and_attr(spark):
    html = (
        '<ul class="nav"><li><a href="/x">x</a></li><li><a href="/y">y</a></li></ul>'
        '<a href="/outside">z</a>'
    )
    df = spark.createDataFrame(
        [("u", html, 1)], "url string, extracted_text string, round int"
    )
    spec = ItemSpec(
        family="f",
        fields={
            "nav_hrefs": FieldRule("ul.nav a::attr(href)", getall=True),
            "nav_texts": FieldRule("ul.nav > li > a::text", getall=True),
        },
    )
    row = spec.extract(df).first()
    assert row.nav_hrefs == ["/x", "/y"]
    assert row.nav_texts == ["x", "y"]


def test_fallback_no_match_and_processors(spark):
    df = spark.createDataFrame(
        [("u", '<div class="a"><b>7</b></div>', 1)],
        "url string, extracted_text string, round int",
    )
    spec = ItemSpec(
        family="f",
        fields={
            "n": FieldRule("div.a > b::text", processors=["to_int"]),
            "missing": FieldRule("div.z > b::text", default="none"),
        },
    )
    row = spec.extract(df).first()
    assert row.n == 7
    assert row.missing == "none"


def test_truly_unsupported_selector_still_raises(spark):
    import pytest

    df = spark.createDataFrame(
        [("u", "<p>x</p>", 1)], "url string, extracted_text string, round int"
    )
    spec = ItemSpec(family="f", fields={"x": FieldRule("p:nth-child(2)::text")})
    with pytest.raises(ValueError):
        spec.extract(df)
