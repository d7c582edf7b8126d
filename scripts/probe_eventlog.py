"""Stage-level attribution probe (guide §7.1 empirically, via the event
log since spark.ui is disabled in this sandbox): run named queries()
entries with spark.eventLog enabled, then parse the log into a per-stage
cost table — wall seconds, task time, shuffle read/write bytes, input
bytes, peak task count — attributed to the entry via job descriptions.

Usage: python scripts/probe_eventlog.py SF_DIR OUT.jsonl entry1,entry2,...

Each OUT.jsonl row: {"query": name, "sec": wall, "stages": [
  {"stage": id, "name": ..., "sec": ..., "task_sec": ..., "tasks": n,
   "shuffle_read_mb": ..., "shuffle_write_mb": ..., "input_mb": ...,
   "spill_mb": ...} ... ]} sorted by task_sec descending.

This is a PROBE harness (measurement only, guide §1): session defaults
otherwise identical to scripts/bench_registry.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from db_loganalyzer_spark.session import get_spark

EVDIR = "/tmp/spark-events-r14"


def _read_lines(path: str):
    """Yield event-log JSON lines from either a single-file log or a
    Spark 4 rolling (eventLog dir + zstd parts) layout."""
    import glob
    import subprocess

    if os.path.isdir(path):
        parts = sorted(
            glob.glob(os.path.join(path, "events_*")),
            key=lambda p: int(os.path.basename(p).split("_")[1]),
        )
    else:
        parts = [path]
    for p in parts:
        if p.endswith(".zstd"):
            # check=False: an in-progress log has a truncated final
            # frame; zstd exits nonzero but emits everything it decoded
            out = subprocess.run(
                ["zstd", "-dc", p], capture_output=True, check=False
            ).stdout
            yield from out.decode("utf-8", "replace").splitlines()
        else:
            yield from open(p)


def parse_eventlog(path: str):
    """One pass over a Spark JSON event log -> per-entry stage tables.

    Attribution: SparkListenerJobStart carries the job description
    property (set per entry) and its stage IDs; stage submit/complete
    events carry timing; task-end events accumulate metrics (stage
    completion summaries do not include executor run time)."""
    stage_of_entry: dict[int, str] = {}
    stages: dict[int, dict] = {}
    for line in _read_lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        et = ev.get("Event")
        if et == "SparkListenerJobStart":
            desc = (ev.get("Properties") or {}).get(
                "spark.job.description", ""
            )
            for sid in ev.get("Stage IDs", []):
                stage_of_entry.setdefault(sid, desc)
        elif et == "SparkListenerStageSubmitted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            stages.setdefault(sid, {
                "stage": sid,
                "name": si.get("Stage Name", "")[:120],
                "submit_ms": si.get("Submission Time"),
                "task_ms": 0.0, "tasks": 0,
                "sread": 0, "swrite": 0, "input": 0, "spill": 0,
                "fetch_wait_ms": 0.0, "gc_ms": 0.0,
            })
        elif et == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            st = stages.get(sid)
            tm = ev.get("Task Metrics") or {}
            if st is None or not tm:
                continue
            st["tasks"] += 1
            st["task_ms"] += tm.get("Executor Run Time", 0)
            st["gc_ms"] += tm.get("JVM GC Time", 0)
            sr = tm.get("Shuffle Read Metrics") or {}
            st["sread"] += sr.get("Remote Bytes Read", 0) + sr.get(
                "Local Bytes Read", 0
            )
            st["fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)
            sw = tm.get("Shuffle Write Metrics") or {}
            st["swrite"] += sw.get("Shuffle Bytes Written", 0)
            im = tm.get("Input Metrics") or {}
            st["input"] += im.get("Bytes Read", 0)
            st["spill"] += tm.get("Disk Bytes Spilled", 0)
        elif et == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            st = stages.get(si["Stage ID"])
            if st is not None:
                sub = si.get("Submission Time") or st.get("submit_ms")
                comp = si.get("Completion Time")
                if sub and comp:
                    st["wall_ms"] = comp - sub
    out: dict[str, list] = {}
    for sid, st in stages.items():
        entry = stage_of_entry.get(sid, "?")
        out.setdefault(entry, []).append({
            "stage": sid,
            "name": st["name"],
            "sec": round(st.get("wall_ms", 0) / 1000.0, 2),
            "task_sec": round(st["task_ms"] / 1000.0, 2),
            "tasks": st["tasks"],
            "gc_sec": round(st["gc_ms"] / 1000.0, 2),
            "fetch_wait_sec": round(st["fetch_wait_ms"] / 1000.0, 2),
            "shuffle_read_mb": round(st["sread"] / 1e6, 1),
            "shuffle_write_mb": round(st["swrite"] / 1e6, 1),
            "input_mb": round(st["input"] / 1e6, 1),
            "spill_mb": round(st["spill"] / 1e6, 1),
        })
    for entry in out:
        out[entry].sort(key=lambda s: -s["task_sec"])
    return out


def main():
    sf_dir, out_path, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(
        "probe-eventlog",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
        },
    )
    app_id = spark.sparkContext.applicationId
    qs = entry_mod.queries()
    walls: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls[name] = round(time.time() - t0, 2)
        except Exception as e:
            walls[name] = -1.0
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}")
        spark.sparkContext.setJobDescription(None)
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        print(f"{name}: {walls[name]} s", flush=True)
    spark.stop()
    time.sleep(2)
    log = os.path.join(EVDIR, app_id)
    if not os.path.exists(log):  # Spark 4 rolling layout
        log = os.path.join(EVDIR, f"eventlog_v2_{app_id}")
    tables = parse_eventlog(log)
    with open(out_path, "w") as out:
        for name in names:
            rec = {
                "query": name,
                "sec": walls.get(name),
                "stages": tables.get(name, [])[:25],
            }
            out.write(json.dumps(rec) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
