"""Per-host politeness budgets as salted Window ranking.

Reference semantics (counter.py:70-109):
* MAX_REQUESTS_PER_HOST — uniform per-host in-flight cap; batch equivalent:
  at most ``budget`` rows per host admitted per round, best-score first;
  the rest stay in the frontier (== ReScheduleError re-enqueue,
  crawler.py:87-97, uncounted).
* MAX_REQUESTS_SPECIAL_HOST — per-pattern caps matched by **substring** of
  the host (counter.py:79: ``host in req.url.host``); a special match
  suppresses the uniform check (counter.py:76-88). Multiple matches =>
  min cap (equivalent per-round admission set).
* DOWNLOAD_DELAY — converted to a per-round budget upstream
  (floor(round_seconds / delay)); the reference's random jitter
  (counter.py:106) is load-shaping, not semantics, and is disabled for
  order parity.

Scale: Window.partitionBy(host) alone funnels a hot domain into one task
(SURVEY §7 hot-host skew). Two-phase top-k fixes it: rows are first ranked
within (host, salt) — any row in a host's true top-k is also in its salt's
top-k — survivors (≤ salt_n·budget per host) are re-ranked within host.
Unlimited hosts skip ranking entirely (no shuffle for them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

UNLIMITED = 1 << 30

def rank_keys():
    """The frontier total order (== score DESC + deterministic tie-break)."""
    return [F.col("priority").desc(), F.col("exetime").asc(), F.col("fingerprint").asc()]


def budget_col(host, uniform: int, special: dict[str, int]):
    """Effective per-round budget for a host column (kernel.host_budget as a
    JVM expression; special caps folded as nested CASE WHEN on substring
    match, min-combined)."""
    expr = F.lit(None).cast("int")
    # fold special patterns: min over matching caps
    matched_min = None
    for pat, cap in sorted(special.items()):
        this = F.when(F.instr(host, pat) > 0, F.lit(int(cap)))
        matched_min = this if matched_min is None else F.least(
            F.coalesce(matched_min, F.lit(UNLIMITED)), F.coalesce(this, F.lit(UNLIMITED))
        )
    if matched_min is not None:
        # least() above treats non-matches as UNLIMITED; recover "no match"
        any_match = None
        for pat in special:
            cond = F.instr(host, pat) > 0
            any_match = cond if any_match is None else (any_match | cond)
        expr = F.when(any_match, matched_min)
    uniform_budget = F.lit(int(uniform) if uniform > 0 else UNLIMITED)
    return F.coalesce(expr, uniform_budget)


def global_schedule_rank(df: DataFrame, n_parts: int = 0) -> tuple[DataFrame, DataFrame]:
    """Exact global schedule rank (1-based, frontier total order) without a
    single-partition Window over the data: range-partition on the sort
    keys, row_number within each range, add per-range cumulative offsets.
    Safe for unbounded selected sets — no straggler partition at any scale.

    The offsets are NOT collected to the driver: they are a lazy
    ``groupBy(_pid).count`` + cumulative-sum subplan (metadata-sized —
    n_partitions rows; its single-partition window is over partition
    COUNTS, not data) broadcast-joined back. The whole rank is therefore
    one lazy plan fused into whichever job consumes it — zero extra
    driver actions per round (VERDICT r2 #6). Offset/row alignment is
    safe under cache loss: the range boundaries live in the shuffle's
    Partitioner object, which recomputation of lost cached partitions
    reuses — both the counts subplan and the main scan read the same
    persisted exchange.

    Returns ``(ranked, cache_handle)``; the caller unpersists the handle
    after the round's jobs finish. ``rank`` is a long (a 10^10-row
    frontier overflows int).
    """
    keys = rank_keys()
    n_parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    d = (
        df.repartitionByRange(n_parts, *keys)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = d.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    w = Window.partitionBy("_pid").orderBy(*keys)
    ranked = (
        d.join(F.broadcast(offsets), "_pid")
        .withColumn("rank", (F.row_number().over(w) + F.col("_off")).cast("long"))
        .drop("_pid", "_off")
    )
    return ranked, d


def apply_host_budgets(
    eligible: DataFrame,
    uniform: int = 0,
    special: dict[str, int] | None = None,
    salt_n: int = 4,
    delay_budgets: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split eligible frontier rows into (selected, deferred) per budgets.

    Returns both sides with the original frontier columns (plus ``budget``
    dropped). Deferred rows keep their exetime — they were already due and
    simply wait for the next round (reference: ReScheduleError with the
    politeness counter exhausted, counter.py:86,94).

    ``delay_budgets`` is an optional tiny (host, delay_budget) table —
    robots.txt Crawl-delay converted to a per-round cap
    (robots.delay_budgets_df). It min-combines with the uniform/special
    budget via a broadcast join on host: no shuffle on the frontier, and
    hosts absent from the table keep their configured budget."""
    special = special or {}
    cols = eligible.columns
    b = eligible.withColumn("budget", budget_col(F.col("host"), uniform, special))
    if delay_budgets is not None:
        b = (
            b.join(
                F.broadcast(
                    delay_budgets.select(
                        F.col("host").alias("_dhost"), "delay_budget"
                    )
                ),
                F.col("host") == F.col("_dhost"),
                "left",
            )
            .withColumn(
                "budget",
                F.least(
                    F.col("budget"),
                    F.coalesce(F.col("delay_budget"), F.lit(UNLIMITED)),
                ),
            )
            .drop("_dhost", "delay_budget")
        )

    unlimited = b.filter(F.col("budget") >= UNLIMITED).select(*cols)
    limited = b.filter(F.col("budget") < UNLIMITED)

    if not special and uniform <= 0 and delay_budgets is None:
        # fast path: nobody is limited — no shuffle at all
        return eligible, eligible.limit(0)

    # phase 1: rank inside (host, salt) — bounds any single partition's work
    salted = limited.withColumn("salt", F.pmod(F.xxhash64("fingerprint"), F.lit(salt_n)))
    w1 = Window.partitionBy("host", "salt").orderBy(*rank_keys())
    survivors = (
        salted.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= F.col("budget"))
        .drop("rn1", "salt")
    )
    # phase 2: exact top-budget within host over the ≤ salt_n·budget survivors
    w2 = Window.partitionBy("host").orderBy(*rank_keys())
    ranked = survivors.withColumn("rn2", F.row_number().over(w2))
    selected_limited = ranked.filter(F.col("rn2") <= F.col("budget")).select(*cols)

    selected = unlimited.unionByName(selected_limited)
    deferred = limited.select(*cols).join(
        selected_limited.select("fingerprint"), "fingerprint", "left_anti"
    ).select(*cols)
    return selected, deferred
