#!/usr/bin/env python
"""Per-job profiler for a single declared query (guide §1: measure
first). Runs one query from the inventory with the Spark event log
enabled, then parses the log into a per-job wall-clock decomposition
(job id, duration, #stages, #tasks, call site) so optimization targets
the jobs that actually cost, not the ones that look expensive.

Usage: python tools/profile_query.py <query_name> [sf_dir] [--twice]
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") \
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    twice = "--twice" in sys.argv
    log_dir = "/tmp/spark-events-profile"
    import shutil
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    from messdb_spark.queries import QUERIES
    from messdb_spark.session import _DEFAULTS

    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    b = (SparkSession.builder.appName("profile").master(f"local[{cpus}]")
         .config("spark.eventLog.enabled", "true")
         .config("spark.eventLog.dir", log_dir)
         .config("spark.eventLog.compress", "false")
         .config("spark.eventLog.rolling.enabled", "false")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.driver.memory", "8g"))
    for k, v in _DEFAULTS.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # warmup at tiny SF mirrors bench.py methodology
    try:
        QUERIES[name].fn(spark, "/root/testdata/sf0.001").count()
    except Exception as e:  # noqa: BLE001
        print(f"# warmup failed: {e}", file=sys.stderr)

    runs = 2 if twice else 1
    marks = []
    for i in range(runs):
        t0 = time.perf_counter()
        n = QUERIES[name].fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        marks.append((time.time(), dt))
        print(f"# run {i}: {dt:.3f}s ({n} rows)")
    spark.stop()

    paths = [p for p in glob.glob(os.path.join(log_dir, "*"))
             if not p.endswith(".inprogress")] or \
        glob.glob(os.path.join(log_dir, "*"))
    log_files: list[str] = []
    for p in paths:
        if os.path.isdir(p):  # Spark 4 rolling event-log directory
            log_files.extend(sorted(
                q for q in glob.glob(os.path.join(p, "*"))
                if os.path.isfile(q) and "appstatus" not in q))
        else:
            log_files.append(p)

    def _lines():
        for lf in log_files:
            with open(lf) as f:
                yield from f

    jobs: dict[int, dict] = {}
    sql_execs: dict[int, dict] = {}
    if True:
        for line in _lines():
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "stages": len(ev.get("Stage Infos", [])),
                    "tasks": sum(s.get("Number of Tasks", 0)
                                 for s in ev.get("Stage Infos", [])),
                    "site": props.get("callSite.short", ""),
                    "desc": props.get("spark.job.description", ""),
                    "sqlid": props.get("spark.sql.execution.id", ""),
                }
            elif e == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j:
                    j["end"] = ev["Completion Time"]
            elif e == "org.apache.spark.sql.execution.ui." \
                      "SparkListenerSQLExecutionStart":
                sql_execs[ev["executionId"]] = {"desc": ev.get("description", "")}

    rows = []
    for jid, j in sorted(jobs.items()):
        if "end" not in j:
            continue
        dur = (j["end"] - j["start"]) / 1000.0
        rows.append((jid, dur, j))
    total = sum(r[1] for r in rows)
    print(f"\n== {name}: {len(rows)} jobs, {total:.2f}s summed job time ==")
    for jid, dur, j in rows:
        label = j["desc"] or j["site"]
        print(f"job {jid:4d}  {dur:8.3f}s  stages={j['stages']:2d} "
              f"tasks={j['tasks']:4d}  {label[:90]}")
    # top call sites aggregated
    agg: dict[str, list[float]] = {}
    for _jid, dur, j in rows:
        agg.setdefault(j["desc"] or j["site"], []).append(dur)
    print("\n== by call site ==")
    for site, ds in sorted(agg.items(), key=lambda kv: -sum(kv[1])):
        print(f"{sum(ds):8.3f}s  n={len(ds):3d}  {site[:90]}")


if __name__ == "__main__":
    main()
