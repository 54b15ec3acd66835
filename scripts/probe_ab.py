"""A/B the parse probe (scan + Arrow decode/absolutize/extract) under a
config override, interleaved A,B,A,B to cancel host drift.

Usage: python scripts/probe_ab.py ENV=VAL [ENV=VAL ...] [--cpus N] [--reps K]

Runs the probe in a fresh pinned subprocess per rep: baseline (no
override) vs override, alternating. Prints per-rep pages/s and the
median ratio. Used for measurement-sensitive knobs (Arrow batch bytes,
reader batch rows) where the host's ±10% drift would swamp a
non-interleaved comparison.
"""

import json
import os
import shutil
import statistics
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INNER = """
import sys, os
sys.path.insert(0, {root!r})
os.environ.setdefault('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
from bench import _spark, run_parse_probe
spark = _spark({cpus})
print('PAGES_PER_SEC=%.1f' % run_parse_probe(spark, os.environ['SPARK_GRAFT_SF_DIR']))
spark.stop()
"""


def run_once(cpus: int, env_extra: dict) -> float:
    env = os.environ.copy()
    env.update(env_extra)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pin = (
        ["taskset", "-c", f"0-{cpus - 1}"]
        if cpus < (os.cpu_count() or cpus) and shutil.which("taskset")
        else []
    )
    out = subprocess.run(
        pin + [sys.executable, "-c", INNER.format(root=root, cpus=cpus)],
        capture_output=True, text=True, env=env, timeout=300,
    )
    for line in out.stdout.splitlines():
        if line.startswith("PAGES_PER_SEC="):
            return float(line.split("=")[1])
    raise RuntimeError(out.stderr[-2000:])


def main() -> None:
    overrides = {}
    cpus, reps = 16, 3
    for a in sys.argv[1:]:
        if a.startswith("--cpus"):
            cpus = int(a.split("=")[1]) if "=" in a else cpus
        elif a.startswith("--reps"):
            reps = int(a.split("=")[1]) if "=" in a else reps
        elif "=" in a:
            k, v = a.split("=", 1)
            overrides[k] = v
    base, over = [], []
    for i in range(reps):
        base.append(run_once(cpus, {}))
        print(f"rep {i + 1} base: {base[-1]:.0f}", flush=True)
        over.append(run_once(cpus, overrides))
        print(f"rep {i + 1} over: {over[-1]:.0f}", flush=True)
    mb, mo = statistics.median(base), statistics.median(over)
    print(json.dumps({
        "cpus": cpus, "overrides": overrides,
        "base_pages_per_sec": base, "override_pages_per_sec": over,
        "median_base": mb, "median_override": mo,
        "ratio": round(mo / mb, 3),
    }))


if __name__ == "__main__":
    main()
