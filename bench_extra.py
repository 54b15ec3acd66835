"""Round-6 optimization harness: per-query noop-sink timing + plan dumps.

Separate from the frozen ``bench.py`` (guide §1.4): times each registry
query in isolation with the noop sink so the computation is measured, not
the output write, and dumps ``.explain("formatted")`` for the plan-diff
evidence in plans/r06/.

Usage:
  python bench_extra.py [--sf SF_DIR] [--plans SUFFIX] [--reps N] [query ...]

``--plans before`` writes plans/r06/<query>_before.txt for each query run
(and ``after`` likewise). With no query names, runs every registry entry.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=SF_DIR)
    ap.add_argument("--plans", default=None, help="suffix for plans/r06 dumps")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as E
    from acrawler_spark.session import get_spark

    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", str(CPUS))),
    )
    qs = E.queries()
    names = args.queries or list(qs)
    # absorb session/codegen start-up outside the timed region (bench.py
    # does the same with its first headline query)
    qs[names[0]](spark, args.sf).write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    for name in names:
        if name not in qs:
            print(f"unknown query: {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        best = None
        for _ in range(max(1, args.reps)):
            # construction INSIDE the timed region — bench.py's (frozen)
            # methodology; the iterative queries run eager jobs there
            t0 = time.monotonic()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        if args.plans:
            os.makedirs(plans_dir, exist_ok=True)
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.plans}.txt"), "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: {out[name]}s", flush=True)
    print(json.dumps({"sf": args.sf, "cpus": CPUS, "queries": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
