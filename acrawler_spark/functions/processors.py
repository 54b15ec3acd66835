"""Field-processor library — the reference's Processors (processors.py:26-285)
re-expressed as JVM Column expressions (whole-stage codegen; no Python).

Each factory returns a ``Column -> Column`` transformer, so processor chains
compose exactly like the reference's per-field processor lists
(item.py:339-360). A name registry supports the reference's string-ref form
``"func:arg1,arg2"`` (item.py:343-352, processors.py:12-24).

Semantics notes (kept bit-compatible where representable in a typed column):
* ``re_``/``to_*`` return NULL where the reference returns None.
* Java vs Python regex: the shipped default patterns (to_int/to_float/
  to_datetime/to_date, processors.py:177-269) use only constructs with
  identical semantics in java.util.regex; custom patterns must stick to the
  common subset.
* ``error_keep`` (keep original string on parse miss) is only sound for
  string-typed outputs; typed outputs use NULL-on-miss (Spark columns are
  monotyped — documented divergence).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

Transformer = Callable[[Column], Column]

# regexes copied from the reference defaults (processors.py:177-269)
RE_DATETIME = r".*(\d\d\d\d)\D+(0?[1-9]|1[0-2])\D+(0?[1-9]|[12][0-9]|3[01])\D+(00|[0-9]|1[0-9]|2[0-3]):([0-9]|[0-5][0-9]):([0-9]|[0-5][0-9]).*"
RE_DATE = r".*(\d\d\d\d)\D+(0?[1-9]|1[0-2])\D+(0?[1-9]|[12][0-9]|3[01]).*"
RE_FLOAT = r"\D*(\d*\.?\d*).*"
RE_INT = r"\D*(\d+).*"


def truthy(col: Column) -> Column:
    """Python bool() for the common field types: NULL/''/0 are falsy
    (used by default()/drop()/filter() parity, processors.py:71-141)."""
    s = col.cast("string")
    return col.isNotNull() & (s != "") & (s != "0") & (s != "0.0") & (s != "false")


def first() -> Transformer:
    """Head of a list value, identity otherwise (processors.py:26-37).
    Apply to array columns; the item layer routes scalar fields around it.
    Empty list -> NULL (the reference returns [] — a typed column cannot)."""
    return lambda col: F.try_element_at(col, F.lit(1))


def strip() -> Transformer:
    """Trim strings (processors.py:39-54). Use strip_list for arrays."""
    return lambda col: F.trim(col)


def strip_list() -> Transformer:
    return lambda col: F.transform(col, lambda x: F.trim(x))


def map_(fn: Transformer) -> Transformer:
    """Apply fn to each element of a list field (processors.py:56-68)."""
    return lambda col: F.transform(col, fn)


def filter_(pred: Callable[[Column], Column] | None = None) -> Transformer:
    """Keep elements where pred (default: truthy) holds (processors.py:70-78)."""
    p = pred or truthy
    return lambda col: F.filter(col, p)


def drop(pred: Callable[[Column], Column] | None = None) -> Transformer:
    """Falsy => drop the field == NULL it out (processors.py:80-90 raises
    DropFieldError; columnar equivalent: NULL, dropped at map-build time)."""
    p = pred or truthy
    return lambda col: F.when(p(col), col)


def drop_item_flag(pred: Callable[[Column], Column] | None = None) -> Callable[[Column], Column]:
    """Falsy => drop the whole item row (processors.py:92-102 raises
    SkipTaskImmediatelyError). Returns the row-filter predicate; the item
    operator applies it as DataFrame.filter."""
    p = pred or truthy
    return lambda col: p(col)


def re_(regex: str, group_index: int = 0) -> Transformer:
    """First match group; NULL when no match (processors.py:104-112 —
    re.search => unanchored, same as Java find())."""
    return lambda col: F.when(col.rlike(regex), F.regexp_extract(col, regex, group_index))


def re_groups(regex: str, n_groups: int, default: str | None = None) -> Transformer:
    """All groups as an array; NULL when no match (processors.py:114-122)."""
    def t(col: Column) -> Column:
        groups = [
            F.coalesce(
                F.when(F.regexp_extract(col, regex, i) != "", F.regexp_extract(col, regex, i)),
                F.lit(default),
            )
            for i in range(1, n_groups + 1)
        ]
        return F.when(col.rlike(regex), F.array(*groups))
    return t


def re_groupdict(regex: str, names: list[str], default: str | None = None) -> Transformer:
    """Named groups as a map (processors.py:124-132). ``names`` lists the
    group names in positional order (columnar regexp extraction is by
    index; the names key the output map)."""
    def t(col: Column) -> Column:
        vals = [
            F.coalesce(
                F.when(F.regexp_extract(col, regex, i) != "", F.regexp_extract(col, regex, i)),
                F.lit(default),
            )
            for i in range(1, len(names) + 1)
        ]
        m = F.map_from_arrays(F.array(*[F.lit(n) for n in names]), F.array(*vals))
        return F.when(col.rlike(regex), m)
    return t


def default(d) -> Transformer:
    """Falsy => default (processors.py:134-142)."""
    return lambda col: F.when(truthy(col), col).otherwise(F.lit(d))


def try_(*fns: Transformer) -> Transformer:
    """First transformer producing a non-NULL result (processors.py:144-153:
    first fn that doesn't raise; columnar errors surface as NULL via
    try_cast-style expressions, so coalesce is the equivalent)."""
    return lambda col: F.coalesce(*[fn(col) for fn in fns])


def replace(old: str, new: str, count: int = -1) -> Transformer:
    """str.replace (processors.py:155-160). count=-1 (replace all, the
    reference default) is a pure JVM expression; a bounded count matches
    Python's ``str.replace(old, new, count)`` via one Arrow-vectorized
    pandas UDF (the only processor that needs Python, and only in this
    mode)."""
    count = int(count)
    if count == -1:
        return lambda col: F.replace(col, F.lit(old), F.lit(new))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _bounded(s):
        return s.str.replace(old, new, n=count, regex=False)

    return lambda col: _bounded(col.cast("string"))


def to_datetime(
    regex: str | None = None,
    with_time: bool = False,
    error_drop: bool = False,
    error_keep: bool = False,
) -> Transformer:
    """Extract a timestamp (processors.py:162-195). Error modes mirror the
    reference flags: default and ``error_drop`` both yield NULL on miss (a
    NULL field is dropped when the item map is built, == DropFieldError);
    ``error_keep`` keeps the original string on miss — the column is then
    string-typed, with hits rendered as ``CAST(ts AS STRING)`` (Spark
    columns are monotyped; the reference mixes datetime and str)."""
    r = regex or (RE_DATETIME if with_time else RE_DATE)
    def t(col: Column) -> Column:
        c = F.coalesce(col.cast("string"), F.lit(""))
        g = lambda i: F.regexp_extract(c, r, i).cast("int")  # noqa: E731
        if with_time:
            ts = F.make_timestamp(g(1), g(2), g(3), g(4), g(5), g(6))
        else:
            ts = F.make_timestamp(g(1), g(2), g(3), F.lit(0), F.lit(0), F.lit(0))
        if error_keep:
            return F.when(c.rlike(r), ts.cast("string")).otherwise(col.cast("string"))
        return F.when(c.rlike(r), ts)
    return t


def to_date(
    regex: str | None = None, error_drop: bool = False, error_keep: bool = False
) -> Transformer:
    """Extract a date; error modes as in to_datetime (processors.py:197-227)."""
    r = regex or RE_DATE
    def t(col: Column) -> Column:
        c = F.coalesce(col.cast("string"), F.lit(""))
        g = lambda i: F.regexp_extract(c, r, i).cast("int")  # noqa: E731
        d = F.make_date(g(1), g(2), g(3))
        if error_keep:
            return F.when(c.rlike(r), d.cast("string")).otherwise(col.cast("string"))
        return F.when(c.rlike(r), d)
    return t


def to_float(regex: str | None = None) -> Transformer:
    """Leading-junk-tolerant float extract; NULL on miss or empty group
    (processors.py:229-256: ``match and match.group(1)``)."""
    r = regex or RE_FLOAT
    def t(col: Column) -> Column:
        x = F.regexp_extract(F.coalesce(col.cast("string"), F.lit("")), r, 1)
        return F.when(x != "", x.cast("double"))
    return t


def to_int(regex: str | None = None) -> Transformer:
    """Leading-junk-tolerant int extract; NULL on miss (processors.py:258-285)."""
    r = regex or RE_INT
    def t(col: Column) -> Column:
        x = F.regexp_extract(F.coalesce(col.cast("string"), F.lit("")), r, 1)
        return F.when(x != "", x.cast("long"))
    return t


# ---------------------------------------------------------------------------
# Registry + string refs ("func:arg1,arg2" — item.py:343-352)
# ---------------------------------------------------------------------------

def _map_ref(*specs) -> Transformer:
    """String-ref form of map: ``"map:strip"`` applies the named processor
    chain to each list element (processors.py:56-68)."""
    return map_(chain(*specs))


def _try_ref(*specs) -> Transformer:
    """String-ref form of try_: ``"try_:to_int,to_float"`` — first named
    processor yielding non-NULL (processors.py:144-153)."""
    return try_(*[compile_spec(s) for s in specs])


def _re_groups_ref(regex: str, n_groups, default: str | None = None) -> Transformer:
    return re_groups(regex, int(n_groups), default)


def _re_groupdict_ref(regex: str, *names: str) -> Transformer:
    return re_groupdict(regex, list(names))


REGISTRY: dict[str, Callable[..., Transformer]] = {
    "first": first,
    "strip": strip,
    "strip_list": strip_list,
    "map": _map_ref,
    "filter": filter_,
    "drop": drop,
    "drop_item": drop_item_flag,
    "re": re_,
    "re_groups": _re_groups_ref,
    "re_groupdict": _re_groupdict_ref,
    "default": default,
    "try_": _try_ref,
    "replace": replace,
    "to_datetime": to_datetime,
    "to_date": to_date,
    "to_float": to_float,
    "to_int": to_int,
}


def register(name: str, factory: Callable[..., Transformer]) -> None:
    """Processors.register/use equivalent (processors.py:12-24)."""
    REGISTRY[name] = factory


def compile_spec(spec) -> Transformer:
    """Resolve a processor spec: a Transformer, a factory name, or a
    string-ref ``"name:arg1,arg2"`` with string args (item.py:343-352)."""
    if callable(spec):
        return spec
    name, _, argstr = str(spec).partition(":")
    args = [a for a in argstr.split(",") if a != ""] if argstr else []
    return REGISTRY[name](*args)


def chain(*specs) -> Transformer:
    """Compose a processor list left-to-right (item.py:339-360)."""
    ts = [compile_spec(s) for s in specs]
    def t(col: Column) -> Column:
        for f in ts:
            col = f(col)
        return col
    return t
