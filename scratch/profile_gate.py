"""Profile one registry query: per-Spark-job wall-clock breakdown.

Usage: python scratch/profile_gate.py <query_name> [sf_dir]

Runs the query once warm + once timed with spark.eventLog enabled,
then parses the event log for JobStart/JobEnd and prints the jobs of
the timed run sorted by duration, with call sites — so we can see
which of a control-plane gate's many actions actually cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_datalake_framework_ingestion_spark.plans import REGISTRY  # noqa: E402
from aws_datalake_framework_ingestion_spark.session import get_session  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    evdir = "/tmp/spark-events"
    os.makedirs(evdir, exist_ok=True)
    for f in os.listdir(evdir):
        os.unlink(os.path.join(evdir, f))
    spark = get_session(
        app_name=f"profile_{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spec = REGISTRY[name]
    t0 = time.perf_counter()
    n = spec.fn(spark, sf_dir).count()  # warm
    warm = time.perf_counter() - t0
    from aws_datalake_framework_ingestion_spark.caching import release_caches

    release_caches()
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)
    # marker so we can find where the timed run starts in the log
    spark.sparkContext.setJobGroup("timed", "timed-run-marker")
    t0 = time.perf_counter()
    n = spec.fn(spark, sf_dir).count()
    timed = time.perf_counter() - t0
    print(f"# {name}: warm {warm:.3f}s timed {timed:.3f}s rows={n}")
    spark.stop()

    # parse the event log (plain single-file format)
    import glob

    cands = [
        p
        for p in glob.glob(f"{evdir}/**", recursive=True)
        if os.path.isfile(p) and "appstatus" not in p
    ]
    jobs = {}
    order = []
    fh_lines = []
    for p in cands:
        with open(p, errors="replace") as fh:
            fh_lines.extend(fh.readlines())
    if True:
        for line in fh_lines:
            try:
                ev = json.loads(line)
            except Exception:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "group": props.get("spark.jobGroup.id", ""),
                    "callsite": props.get("callSite.short", ""),
                    "desc": props.get("spark.job.description", ""),
                    "nstages": len(ev.get("Stage Infos", [])),
                    "ntasks": sum(
                        s.get("Number of Tasks", 0)
                        for s in ev.get("Stage Infos", [])
                    ),
                }
                order.append(jid)
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["dur"] = (
                        ev["Completion Time"] - jobs[jid]["start"]
                    ) / 1000.0
    timed_jobs = [
        (jid, j) for jid, j in jobs.items() if j.get("group") == "timed"
    ]
    total = sum(j.get("dur", 0) for _, j in timed_jobs)
    print(f"# timed-run jobs: {len(timed_jobs)}, sum of job walls {total:.3f}s")
    # gaps between jobs = driver-side work (planning, FS ops, py4j)
    prev_end = None
    rows = []
    for jid, j in sorted(timed_jobs):
        gap = ""
        if prev_end is not None:
            g = (j["start"] - prev_end) / 1000.0
            if g > 0.05:
                gap = f"  <-- gap {g:.2f}s before"
        prev_end = j["start"] + j.get("dur", 0) * 1000
        rows.append(
            f"job {jid:3d} {j.get('dur', 0):7.3f}s stages={j['nstages']} "
            f"tasks={j['ntasks']:4d} {j['callsite'][:60]:60s} "
            f"{(j['desc'] or '')[:50]}{gap}"
        )
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
