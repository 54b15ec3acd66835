"""Processors parity table (FIXTURES §7: one row per reference processor,
input -> expected output pairs from processors.py:26-285 semantics)."""

import datetime

from pyspark.sql import functions as F

from acrawler_spark.functions import processors as P


def _apply(spark, transformer, values, in_type="string"):
    df = spark.createDataFrame([(v,) for v in values], f"v {in_type}")
    return [r.out for r in df.select(transformer(F.col("v")).alias("out")).collect()]


def test_to_int(spark):
    t = P.to_int()
    assert _apply(spark, t, ["12 reviews", "about 7 things", "none", None]) == [12, 7, None, None]


def test_to_float(spark):
    t = P.to_float()
    assert _apply(spark, t, ["$ 3.5k", "1.25", "x", None]) == [3.5, 1.25, None, None]


def test_to_date(spark):
    # NOTE: expected values are the REFERENCE's actual outputs (verified by
    # running processors.py:211 regex under CPython re): the day alternation
    # (0?[1-9]|...) lets the trailing .* absorb the second digit, so
    # "2019-11-18" parses as day=1. We are bit-compatible with the
    # reference, quirks included.
    t = P.to_date()
    out = _apply(spark, t, ["published 2019-11-18", "2020/1/2 extra", "nope"])
    assert out == [datetime.date(2019, 11, 1), datetime.date(2020, 1, 2), None]


def test_to_datetime_with_time(spark):
    # same quirk on seconds: "09" parses as 0 (processors.py:177 regex)
    t = P.to_datetime(with_time=True)
    out = _apply(spark, t, ["at 2019-11-18 13:05:09 tz", "nope"])
    assert out == [datetime.datetime(2019, 11, 18, 13, 5, 0), None]


def test_re(spark):
    t = P.re_(r"(\d+)-(\d+)", 2)
    assert _apply(spark, t, ["a 12-34 b", "zz"]) == ["34", None]


def test_re_groups(spark):
    t = P.re_groups(r"(\d+)-(\d+)", 2)
    assert _apply(spark, t, ["a 12-34 b", "zz"]) == [["12", "34"], None]


def test_strip_and_first(spark):
    assert _apply(spark, P.strip(), ["  x ", None]) == ["x", None]
    df = [( ["a", "b"],), ([],)]
    vals = _apply(spark, P.first(), [["a", "b"], []], in_type="array<string>")
    assert vals == ["a", None]
    assert _apply(spark, P.strip_list(), [[" a ", "b "]], "array<string>") == [["a", "b"]]


def test_map_filter(spark):
    t = P.map_(lambda c: F.upper(c))
    assert _apply(spark, t, [["a", "b"]], "array<string>") == [["A", "B"]]
    assert _apply(spark, P.filter_(), [["a", "", "b"]], "array<string>") == [["a", "b"]]


def test_default_and_drop(spark):
    assert _apply(spark, P.default("dflt"), ["", None, "x"]) == ["dflt", "dflt", "x"]
    assert _apply(spark, P.drop(), ["", "x"]) == [None, "x"]


def test_replace(spark):
    assert _apply(spark, P.replace("a", "o"), ["banana"]) == ["bonono"]


def test_try_chain(spark):
    # branches of try_ must be type-compatible (typed columns)
    t = P.try_(P.to_int(), lambda c: F.lit(-1).cast("long"))
    assert _apply(spark, t, ["7 up", "xx"]) == [7, -1]


def test_string_ref_registry(spark):
    t = P.chain("strip", "to_int")
    assert _apply(spark, t, ["  33 units "]) == [33]
    t2 = P.compile_spec("re:(\\d+)")
    assert _apply(spark, t2, ["n=42"]) == ["42"]


def test_re_groupdict(spark):
    t = P.re_groupdict(r"(\d+)-(\d+)", ["lo", "hi"])
    out = _apply(spark, t, ["a 12-34 b", "zz"])
    assert out[0] == {"lo": "12", "hi": "34"}
    assert out[1] is None


def test_replace_bounded_count(spark):
    # processors.py:155-160: str.replace(old, new, count) — bounded count
    # replaces only the first N occurrences (pandas-UDF path)
    assert _apply(spark, P.replace("a", "o", 2), ["banana", None]) == ["bonona", None]
    assert _apply(spark, P.replace("aa", "x", 1), ["aaaa"]) == ["xaa"]


def test_string_ref_registry_complete(spark):
    # every reference processor resolves by name (processors.py:12-24)
    for name in ["first", "strip", "map", "filter", "drop", "drop_item", "re",
                 "re_groups", "re_groupdict", "default", "try_", "replace",
                 "to_datetime", "to_date", "to_float", "to_int"]:
        assert name in P.REGISTRY, name
    # nested string refs: map over a named processor, try_ over two
    t = P.compile_spec("map:strip")
    df = spark.createDataFrame([(["  a ", " b"],)], "v array<string>")
    assert [r.out for r in df.select(t(F.col("v")).alias("out")).collect()] == [["a", "b"]]
    t2 = P.compile_spec("try_:to_int")
    assert _apply(spark, t2, ["n 5"]) == [5]
    t3 = P.compile_spec("replace:a,o,1")
    assert _apply(spark, t3, ["banana"]) == ["bonana"]
    t4 = P.compile_spec("re_groups:(\\d+)-(\\d+),2")
    assert _apply(spark, t4, ["4-5"]) == [["4", "5"]]


def test_to_date_error_keep(spark):
    # error_keep: original string kept on miss; hits rendered as CAST(date)
    t = P.to_date(error_keep=True)
    assert _apply(spark, t, ["2020-01-02", "no date here"]) == [
        "2020-01-02", "no date here",
    ]
