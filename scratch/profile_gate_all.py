"""Like profile_gate.py but attributes ALL Spark jobs in the timed
run's wall-clock window (streaming queries launch jobs from their own
threads, outside the job group), plus driver gaps.

Usage: python scratch/profile_gate_all.py <query> [sf_dir]
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
    evdir = "/tmp/spark-events-all"
    os.makedirs(evdir, exist_ok=True)
    import shutil

    for f in os.listdir(evdir):
        p = os.path.join(evdir, f)
        shutil.rmtree(p) if os.path.isdir(p) else os.unlink(p)
    spark = get_session(
        app_name=f"profileall_{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
        },
    )
    spec = REGISTRY[name]
    t0 = time.perf_counter()
    n = spec.fn(spark, sf_dir).count()  # warm
    warm = time.perf_counter() - t0
    from aws_datalake_framework_ingestion_spark.caching import release_caches

    release_caches()
    spark.catalog.clearCache()
    wall0 = time.time() * 1000
    t0 = time.perf_counter()
    n = spec.fn(spark, sf_dir).count()
    timed = time.perf_counter() - t0
    wall1 = time.time() * 1000
    print(f"# {name}: warm {warm:.3f}s timed {timed:.3f}s rows={n}")
    spark.stop()

    import glob

    jobs = {}
    for p in glob.glob(f"{evdir}/**", recursive=True):
        if not os.path.isfile(p) or "appstatus" in p:
            continue
        for line in open(p, errors="replace"):
            try:
                ev = json.loads(line)
            except Exception:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "callsite": props.get("callSite.short", ""),
                    "desc": (props.get("spark.job.description") or "")[:60],
                    "ntasks": sum(
                        s.get("Number of Tasks", 0)
                        for s in ev.get("Stage Infos", [])
                    ),
                }
            elif e == "SparkListenerJobEnd" and ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["dur"] = (
                    ev["Completion Time"] - jobs[ev["Job ID"]]["start"]
                ) / 1000.0
    window = [
        (jid, j)
        for jid, j in sorted(jobs.items())
        if wall0 <= j["start"] <= wall1
    ]
    total = sum(j.get("dur", 0) for _, j in window)
    print(f"# jobs in window: {len(window)}, sum walls {total:.3f}s")
    prev_end = None
    for jid, j in window:
        gap = ""
        if prev_end is not None:
            g = (j["start"] - prev_end) / 1000.0
            if g > 0.05:
                gap = f"  <-- gap {g:.2f}s"
        prev_end = j["start"] + j.get("dur", 0) * 1000
        print(
            f"job {jid:4d} {j.get('dur', 0):7.3f}s tasks={j['ntasks']:4d} "
            f"{j['callsite'][:46]:46s} {j['desc'][:40]}{gap}"
        )


if __name__ == "__main__":
    main()
