"""Summarize a Spark event log: per-stage wall/task-time/GC/IO, plus the
wall-clock gaps no stage covers (driver-side serial work: planning,
broadcast builds, commit bookkeeping).

Usage: python scripts/analyze_eventlog.py <eventlog-file> [min_stage_secs]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    path = sys.argv[1]
    min_s = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    stages = {}  # (stageId, attempt) -> info
    tasks = {}  # stage id -> aggregated task metrics
    app_start = app_end = None
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerApplicationStart":
                app_start = ev["Timestamp"]
            elif e == "SparkListenerApplicationEnd":
                app_end = ev["Timestamp"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                stages[sid] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "tasks": si["Number of Tasks"],
                    "sub": si.get("Submission Time"),
                    "done": si.get("Completion Time"),
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                a = tasks.setdefault(
                    sid,
                    {
                        "run_ms": 0, "gc_ms": 0, "cpu_ns": 0, "n": 0,
                        "max_ms": 0, "in_bytes": 0, "out_bytes": 0,
                        "sh_read": 0, "sh_write": 0, "ser_ms": 0,
                        "spill": 0,
                    },
                )
                rt = m.get("Executor Run Time", 0)
                a["run_ms"] += rt
                a["max_ms"] = max(a["max_ms"], rt)
                a["gc_ms"] += m.get("JVM GC Time", 0)
                a["cpu_ns"] += m.get("Executor CPU Time", 0)
                a["ser_ms"] += m.get("Result Serialization Time", 0) + m.get(
                    "Executor Deserialize Time", 0
                )
                a["spill"] += m.get("Disk Bytes Spilled", 0)
                a["n"] += 1
                im = m.get("Input Metrics") or {}
                a["in_bytes"] += im.get("Bytes Read", 0)
                om = m.get("Output Metrics") or {}
                a["out_bytes"] += om.get("Bytes Written", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                a["sh_read"] += sr.get("Remote Bytes Read", 0) + sr.get(
                    "Local Bytes Read", 0
                )
                sw = m.get("Shuffle Write Metrics") or {}
                a["sh_write"] += sw.get("Shuffle Bytes Written", 0)

    spans = sorted(
        (s["sub"], s["done"], sid)
        for sid, s in stages.items()
        if s.get("sub") and s.get("done")
    )
    total = (app_end - app_start) / 1000.0 if app_start and app_end else None
    print(f"app wall: {total:.1f}s" if total else "app wall: ?")
    print(
        f"{'stage':>5} {'wall_s':>7} {'ntask':>5} {'task_s':>8} {'max_s':>6} "
        f"{'cpu_s':>8} {'gc_s':>5} {'in_MB':>7} {'out_MB':>7} {'shR_MB':>7} "
        f"{'shW_MB':>7} {'spill':>6}  name"
    )
    for sub, done, sid in spans:
        wall = (done - sub) / 1000.0
        if wall < min_s:
            continue
        a = tasks.get(sid, {})
        print(
            f"{sid:>5} {wall:>7.1f} {a.get('n', 0):>5} "
            f"{a.get('run_ms', 0) / 1e3:>8.1f} {a.get('max_ms', 0) / 1e3:>6.1f} "
            f"{a.get('cpu_ns', 0) / 1e9:>8.1f} {a.get('gc_ms', 0) / 1e3:>5.1f} "
            f"{a.get('in_bytes', 0) / 1e6:>7.0f} {a.get('out_bytes', 0) / 1e6:>7.0f} "
            f"{a.get('sh_read', 0) / 1e6:>7.0f} {a.get('sh_write', 0) / 1e6:>7.0f} "
            f"{a.get('spill', 0) / 1e6:>6.0f}  {stages[sid]['name']}"
        )

    # wall-clock gaps with NO stage running = driver-serial sections
    if spans:
        print("\ndriver gaps (no stage running) >= 0.5s:")
        cur = spans[0][0]
        covered = []
        for sub, done, _ in spans:
            covered.append((sub, done))
        covered.sort()
        end = covered[0][1]
        for sub, done, _sid in spans[1:]:
            if sub > end:
                gap = (sub - end) / 1000.0
                if gap >= 0.5:
                    print(f"  {gap:>6.1f}s before stage at t+{(sub - spans[0][0]) / 1000.0:.1f}s")
            end = max(end, done)
        gap_total = 0.0
        end = covered[0][1]
        for sub, done in covered[1:]:
            if sub > end:
                gap_total += (sub - end) / 1000.0
            end = max(end, done)
        print(f"  total gap: {gap_total:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
