"""Summarize a Spark event log: per-job and per-stage wall, task counts,
task-time totals, and where the gaps are.  Diagnostic companion to
tools/cluster_step_probe.py --event-log.

Usage: python tools/parse_eventlog.py <eventlog-file> [--min-secs 1]
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--min-secs", type=float, default=1.0)
    args = ap.parse_args()

    jobs = {}
    stages = {}
    stage_tasks = defaultdict(lambda: {"n": 0, "task_ms": 0, "gc_ms": 0,
                                       "deser_ms": 0, "fetch_ms": 0,
                                       "shuffle_read_mb": 0.0, "input_mb": 0.0})
    app_start = None
    with open(args.path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerApplicationStart":
                app_start = ev["Timestamp"]
            elif e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", "")[:80],
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "n_tasks": si["Number of Tasks"],
                    "start": si.get("Submission Time"),
                    "end": si.get("Completion Time"),
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                st = stage_tasks[sid]
                st["n"] += 1
                st["task_ms"] += tm.get("Executor Run Time", 0)
                st["gc_ms"] += tm.get("JVM GC Time", 0)
                st["deser_ms"] += tm.get("Executor Deserialize Time", 0)
                srm = tm.get("Shuffle Read Metrics") or {}
                st["fetch_ms"] += srm.get("Fetch Wait Time", 0)
                st["shuffle_read_mb"] += (srm.get("Local Bytes Read", 0)
                                          + srm.get("Remote Bytes Read", 0)) / 1e6
                im = tm.get("Input Metrics") or {}
                st["input_mb"] += im.get("Bytes Read", 0) / 1e6

    print(f"{'job':>4} {'t0(s)':>7} {'wall(s)':>8}  desc")
    for jid, j in sorted(jobs.items()):
        if "end" not in j:
            continue
        wall = (j["end"] - j["start"]) / 1000
        if wall < args.min_secs:
            continue
        t0 = (j["start"] - app_start) / 1000 if app_start else 0
        print(f"{jid:>4} {t0:>7.1f} {wall:>8.1f}  {j['desc']}")
        for sid in sorted(j["stages"]):
            s = stages.get(sid)
            if not s or s.get("start") is None:
                continue
            swall = (s["end"] - s["start"]) / 1000
            if swall < args.min_secs:
                continue
            t = stage_tasks[sid]
            print(f"      stage {sid:>4} {swall:>7.1f}s tasks={s['n_tasks']:<4} "
                  f"taskSec={t['task_ms']/1000:>7.1f} gc={t['gc_ms']/1000:>6.1f} "
                  f"fetchWait={t['fetch_ms']/1000:>6.1f} "
                  f"shufRead={t['shuffle_read_mb']:>7.1f}MB "
                  f"input={t['input_mb']:>8.1f}MB  {s['name']}")


if __name__ == "__main__":
    main()
