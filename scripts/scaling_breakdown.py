"""Compute-vs-exchange breakdown for the scaling protocol (VERDICT
r4 item 1): run one (kind, level) pair of bench_scaling's job with
Spark event logging on, then decompose the TIMED stages into

- busy core-seconds (executor run time) vs available (wall x cores)
  -> idle fraction = scheduling / driver / barrier cost
- exchange seconds (shuffle fetch wait + shuffle write time) within
  busy time -> the bandwidth-bound fraction that a single shared
  memory bus caps in local mode but a real cluster scales
- executor CPU / run ratio -> how much of busy time is actual
  compute vs blocked I/O

Usage:
  python scripts/scaling_breakdown.py <kind> [kinds...]
Runs each kind at local[4] and local[16] (one repeat each; the
FRACTIONS are the product here, not the walls — those come from
bench_scaling.py's min-of-N protocol) and prints one JSON line per
(kind, level) plus a markdown table to stdout.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVROOT = "/tmp/geomesa_spark_scale_evlog"


def parse_evlog(evdir: str) -> dict:
    """Aggregate TIMED-description stages from the newest app log."""
    logs = sorted(glob.glob(f"{evdir}/*"), key=os.path.getmtime)
    if not logs:
        raise SystemExit(f"no event log under {evdir}")
    path = logs[-1]
    timed_stages: set[int] = set()
    job_wall_ms = 0
    agg = {
        "run_ms": 0.0, "cpu_ms": 0.0, "gc_ms": 0.0,
        "fetch_wait_ms": 0.0, "shuffle_write_ms": 0.0,
        "shuffle_read_b": 0, "shuffle_write_b": 0,
        "input_b": 0, "n_tasks": 0,
    }
    events = []
    with open(path) as fh:
        for line in fh:
            try:
                events.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    for e in events:
        if e.get("Event") == "SparkListenerJobStart":
            desc = e.get("Properties", {}).get(
                "spark.job.description", ""
            )
            if desc == "TIMED":
                for sid in e.get("Stage IDs", []):
                    timed_stages.add(sid)
    starts = {}
    for e in events:
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            desc = e.get("Properties", {}).get(
                "spark.job.description", ""
            )
            if desc == "TIMED":
                starts[e["Job ID"]] = e["Submission Time"]
        elif ev == "SparkListenerJobEnd" and e["Job ID"] in starts:
            job_wall_ms += e["Completion Time"] - starts[e["Job ID"]]
        elif ev == "SparkListenerTaskEnd":
            if e["Stage ID"] not in timed_stages:
                continue
            tm = e.get("Task Metrics") or {}
            agg["n_tasks"] += 1
            agg["run_ms"] += tm.get("Executor Run Time", 0)
            agg["cpu_ms"] += tm.get("Executor CPU Time", 0) / 1e6
            agg["gc_ms"] += tm.get("JVM GC Time", 0)
            sr = tm.get("Shuffle Read Metrics") or {}
            sw = tm.get("Shuffle Write Metrics") or {}
            agg["fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)
            agg["shuffle_write_ms"] += (
                sw.get("Shuffle Write Time", 0) / 1e6
            )
            agg["shuffle_read_b"] += (
                sr.get("Remote Bytes Read", 0)
                + sr.get("Local Bytes Read", 0)
            )
            agg["shuffle_write_b"] += sw.get("Shuffle Bytes Written", 0)
            im = tm.get("Input Metrics") or {}
            agg["input_b"] += im.get("Bytes Read", 0)
    agg["job_wall_ms"] = job_wall_ms
    return agg


def run_level(kind: str, cpus: int) -> dict:
    evdir = f"{EVROOT}/{kind}-{cpus}"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)
    env = dict(os.environ, SPARK_GRAFT_SCALE_EVLOG=evdir)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench_scaling.py"),
         "--job", str(cpus), kind],
        check=True, env=env, capture_output=True, text=True,
    )
    agg = parse_evlog(evdir)
    # the TIMED description covers warm-up-excluded min-of-3 runs;
    # fractions are per-run invariant, so the 3x multiplicity cancels
    wall_s = agg["job_wall_ms"] / 1000.0
    busy_s = agg["run_ms"] / 1000.0
    avail_s = wall_s * cpus
    exch_s = (agg["fetch_wait_ms"] + agg["shuffle_write_ms"]) / 1000.0
    return {
        "kind": kind,
        "cpus": cpus,
        "timed_job_wall_s": round(wall_s, 2),
        "busy_core_s": round(busy_s, 2),
        "avail_core_s": round(avail_s, 2),
        "idle_frac": round(1.0 - busy_s / avail_s, 3) if avail_s else None,
        "exchange_frac_of_busy": (
            round(exch_s / busy_s, 4) if busy_s else None
        ),
        "cpu_frac_of_busy": (
            round(agg["cpu_ms"] / agg["run_ms"], 3)
            if agg["run_ms"] else None
        ),
        "gc_frac_of_busy": (
            round(agg["gc_ms"] / agg["run_ms"], 3)
            if agg["run_ms"] else None
        ),
        "shuffle_read_mb": round(agg["shuffle_read_b"] / 1e6, 1),
        "shuffle_write_mb": round(agg["shuffle_write_b"] / 1e6, 1),
        "n_tasks": agg["n_tasks"],
    }


def main() -> None:
    kinds = sys.argv[1:] or ["graph", "cluster", "clean", "shuffle"]
    rows = []
    for kind in kinds:
        for cpus in (4, 16):
            r = run_level(kind, cpus)
            print(json.dumps(r), flush=True)
            rows.append(r)
    print("\n| kind | level | timed wall s | busy core-s | idle frac "
          "| exchange frac | cpu frac | gc frac | shuf MB r/w | tasks |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['kind']} | local[{r['cpus']}] "
            f"| {r['timed_job_wall_s']} | {r['busy_core_s']} "
            f"| {r['idle_frac']} | {r['exchange_frac_of_busy']} "
            f"| {r['cpu_frac_of_busy']} | {r['gc_frac_of_busy']} "
            f"| {r['shuffle_read_mb']}/{r['shuffle_write_mb']} "
            f"| {r['n_tasks']} |"
        )


if __name__ == "__main__":
    main()
