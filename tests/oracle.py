"""Hermetic reference oracle: the aCrawler scheduler simulated sequentially.

Re-implements the reference's exact semantics (FIXTURES.md §8 protocol) —
canonicalize/fingerprint (http.py:120-145), schedule-time dedup
(scheduler.py:39-62,282-291), score order with FIFO tie-break
(task.py:29-30,92-93), per-host budgets with substring-matched specials
(counter.py:70-109), retry/recrawl lifecycle (crawler.py:98-126) — under
the same round quantization contract as the Spark engine (logical clock
now = t0 + round; tie-break by fingerprint).

The oracle is trusted because the kernel functions it delegates to are
pinned by the reference's own golden values (tests/test_kernel.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from acrawler_spark import kernel


@dataclass
class OracleTask:
    url: str
    priority: int = 0
    exetime: float = 0.0
    tries: int = 0
    recrawl: int = 0
    depth: int = 0
    dont_filter: bool = False
    discovery_idx: int = 0
    method: str = "GET"
    status_allowed: list | None = None  # per-Request (http.py:101)
    ignore_exception: bool = False  # task.py:51: failure skips the retry ladder

    @property
    def url_canon(self) -> str:
        return kernel.canonicalize_url(self.url)

    @property
    def fingerprint(self) -> str:
        return kernel.fingerprint(self.url, self.method)

    @property
    def host(self) -> str:
        return kernel.url_host(self.url)

    def sort_key(self):
        # == (priority DESC, exetime ASC, fingerprint ASC)
        return (-self.priority, self.exetime, self.fingerprint)


@dataclass
class OracleResult:
    # per round: list of (rank, url_canon) in schedule order
    schedule: dict[int, list[str]] = field(default_factory=dict)
    seen: set[str] = field(default_factory=set)
    items: dict[str, str] = field(default_factory=dict)  # url_canon -> extracted text
    failed: list[str] = field(default_factory=list)
    fetch_counts: dict[int, dict] = field(default_factory=dict)


class OracleCrawl:
    def __init__(
        self,
        corpus_rows: list[dict],
        seeds: list[str],
        follow_patterns: list[str],
        max_tries: int = 3,
        uniform_budget: int = 0,
        special_budgets: dict[str, int] | None = None,
        round_cap: int | None = None,
        t0: float = 1767225600.0,
        round_seconds: float = 1.0,
        seed_recrawl: int = 0,
        max_depth: int | None = None,
        links_to_abs: bool = True,
        status_allowed: list | None = None,
        defer_rule=None,  # fn(url_canon, tries) -> defer seconds (0 = none)
        skip_rule=None,  # fn(url_canon) -> bool (SkipTaskError)
    ):
        self.corpus = {r["url"]: r for r in corpus_rows}
        self.follow_patterns = follow_patterns
        self.max_tries = max_tries
        self.uniform = uniform_budget
        self.special = special_budgets or {}
        self.round_cap = round_cap
        self.t0 = t0
        self.round_seconds = round_seconds
        self.max_depth = max_depth
        self.links_to_abs = links_to_abs
        self.status_allowed = status_allowed
        self.defer_rule = defer_rule
        self.skip_rule = skip_rule

        self.res = OracleResult()
        self.frontier: list[OracleTask] = []
        # bootstrap == engine.bootstrap(): admit seeds, seen at schedule time
        idx = 0
        for i, s in enumerate(seeds):
            s = {"url": s} if isinstance(s, str) else dict(s)
            t = OracleTask(
                url=s["url"],
                exetime=t0,
                priority=int(s.get("priority", 0)),
                recrawl=int(s.get("recrawl", seed_recrawl)),
                method=s.get("method", "GET"),
                status_allowed=s.get("status_allowed"),
                ignore_exception=bool(s.get("ignore_exception", False)),
                discovery_idx=i,
            )
            if t.fingerprint in self.res.seen:
                continue
            self.res.seen.add(t.fingerprint)
            self.frontier.append(t)
            idx += 1

    # -- one round -----------------------------------------------------------

    def run_round(self, rnd: int) -> dict:
        now = self.t0 + rnd * self.round_seconds
        eligible = [t for t in self.frontier if t.exetime <= now]
        rest = [t for t in self.frontier if t.exetime > now]
        eligible.sort(key=OracleTask.sort_key)

        # per-host budgets, greedy best-score-first (counter.py:70-109)
        used: dict[str, int] = {}
        selected: list[OracleTask] = []
        deferred: list[OracleTask] = []
        for t in eligible:
            budget = kernel.host_budget(t.host, self.uniform, self.special)
            if used.get(t.host, 0) < budget:
                used[t.host] = used.get(t.host, 0) + 1
                selected.append(t)
            else:
                deferred.append(t)
        if self.round_cap is not None and len(selected) > self.round_cap:
            deferred.extend(selected[self.round_cap :])
            selected = selected[: self.round_cap]

        self.res.schedule[rnd] = [t.url_canon for t in selected]

        retries: list[OracleTask] = []
        recrawls: list[OracleTask] = []
        deferred_user: list[OracleTask] = []
        candidates: list[OracleTask] = []
        n_ok = n_failed = 0
        for rank, t in enumerate(selected, start=1):
            tries_done = t.tries + 1
            # handler control flow (exceptions.py:23-43): ReScheduleError —
            # re-enqueued at now+defer, tries kept incremented, uncounted
            if self.defer_rule:
                d = self.defer_rule(t.url_canon, t.tries)
                if d and d > 0:
                    deferred_user.append(
                        replace(t, tries=tries_done, exetime=now + d, dont_filter=True)
                    )
                    continue
            # SkipTaskError: counted success, no parse/items/links
            if self.skip_rule and self.skip_rule(t.url_canon):
                n_ok += 1
                if t.recrawl > 0:
                    recrawls.append(
                        replace(t, tries=0, exetime=now + t.recrawl, dont_filter=True)
                    )
                continue
            page = self.corpus.get(t.url_canon) if t.method == "GET" else None
            status = int(page.get("status", 200)) if page is not None else 404
            allowed = (
                t.status_allowed if t.status_allowed is not None else self.status_allowed
            )
            resp_ok = page is not None and (
                status == 200 or allowed == [] or (allowed is not None and status in allowed)
            )
            if not resp_ok:  # miss or disallowed status -> retry lifecycle
                if tries_done <= self.max_tries and not t.ignore_exception:
                    retries.append(
                        replace(t, tries=tries_done, exetime=now, dont_filter=True)
                    )
                else:
                    n_failed += 1
                    self.res.failed.append(t.url_canon)
                continue
            n_ok += 1
            text = kernel.extracted_text(
                page["html"], page.get("encoding", "utf-8"), t.url_canon, self.links_to_abs
            )
            self.res.items[t.url_canon] = text
            if self.follow_patterns:
                raw = kernel.decode_body(page["html"], page.get("encoding", "utf-8"))
                links = kernel.follow_links(raw, t.url_canon, self.follow_patterns)
                for pos, link in enumerate(links):
                    child = OracleTask(
                        url=link,
                        exetime=now,
                        depth=t.depth + 1,
                        discovery_idx=rank * 1_000_000 + pos,
                    )
                    if self.max_depth is not None and child.depth > self.max_depth:
                        continue
                    candidates.append(child)
            if t.recrawl > 0:
                recrawls.append(
                    replace(t, tries=0, exetime=now + t.recrawl, dont_filter=True)
                )

        # within-round dedup (min discovery_idx) + schedule-time seen append
        candidates.sort(key=lambda c: c.discovery_idx)
        admitted = []
        for c in candidates:
            fp = c.fingerprint
            if fp in self.res.seen:
                continue
            self.res.seen.add(fp)
            admitted.append(c)

        self.frontier = rest + deferred + retries + recrawls + deferred_user + admitted
        stats = {
            "round": rnd,
            "selected": len(selected),
            "ok": n_ok,
            "admitted": len(admitted),
            # user defers fold into "deferred" — both are flag -2 rescheduled
            "deferred": len(deferred) + len(deferred_user),
            "retried": len(retries),
            "failed": n_failed,
        }
        self.res.fetch_counts[rnd] = stats
        return stats

    def run(self, max_rounds: int = 1000) -> OracleResult:
        rnd = 1
        while rnd <= max_rounds:
            if not self.frontier:
                break  # crawl finished (unfinished count == 0)
            now = self.t0 + rnd * self.round_seconds
            if not any(t.exetime <= now for t in self.frontier):
                rnd += 1  # idle tick (future recrawl/defer)
                continue
            self.run_round(rnd)
            rnd += 1
        return self.res
