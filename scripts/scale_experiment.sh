#!/bin/bash
# One pinned scaling rep pair: local[N] pinned to N cores, store+corpus on
# TMPDIR (pass TMPDIR=/dev/shm for the tmpfs regime). Usage:
#   scripts/scale_experiment.sh <low> <high> <tag>
# Writes /tmp/r4_<tag>_lo.json and /tmp/r4_<tag>_hi.json.
set -u
LOW=$1; HIGH=$2; TAG=$3
cd "$(dirname "$0")/.."
export SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_SKIP_PROBE=1
HICPU=$((HIGH - 1)); LOCPU=$((LOW - 1))
taskset -c 0-$HICPU python bench.py --crawl-only $HIGH \
  > /tmp/r4_${TAG}_hi.json 2>/tmp/r4_${TAG}_hi.err
taskset -c 0-$LOCPU python bench.py --crawl-only $LOW \
  > /tmp/r4_${TAG}_lo.json 2>/tmp/r4_${TAG}_lo.err
python3 - "$TAG" <<'EOF'
import json, sys
tag = sys.argv[1]
out = {}
for side in ("hi", "lo"):
    with open(f"/tmp/r4_{tag}_{side}.json") as f:
        out[side] = json.load(f)
hi, lo = out["hi"], out["lo"]
def sf(r):
    busy = r.get("cpu_busy_s", 0) * 100.0
    st = r.get("steal_jiffies", 0) or 0
    return st / max(busy + st, 1.0)
print(json.dumps({
    "tag": tag,
    "hi_steady": hi["steady_urls_per_sec"], "lo_steady": lo["steady_urls_per_sec"],
    "hi_secs": hi["secs"], "lo_secs": lo["secs"],
    "hi_steal_frac": round(sf(hi), 3), "lo_steal_frac": round(sf(lo), 3),
    "hi_gc_ms": hi["gc_ms"], "lo_gc_ms": lo["gc_ms"],
    "hi_cpu_busy": hi["cpu_busy_s"], "lo_cpu_busy": lo["cpu_busy_s"],
    "hi_urls_cpu": hi["urls_per_cpu_sec"], "lo_urls_cpu": lo["urls_per_cpu_sec"],
    "hi_rounds": hi.get("round_timings"), "lo_rounds": lo.get("round_timings"),
}))
EOF
