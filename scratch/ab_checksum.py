"""Interleaved A/B of spark.sql.streaming.checkpoint.fileChecksum
.enabled on the two streaming gates the r14 VERDICT flagged (item 4):
the conf is runtime-settable, so both arms run in ONE session,
alternating, best-of-N.

Usage: SPARK_GRAFT_CPUS=32 python scratch/ab_checksum.py [rounds]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_datalake_framework_ingestion_spark.caching import release_caches
from aws_datalake_framework_ingestion_spark.plans import REGISTRY
from aws_datalake_framework_ingestion_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CONF = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
QUERIES = ["stream_exec_interval_join", "stream_exec_tumbling_hour"]


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_session(app_name="ab_checksum")
    for q in QUERIES:
        fn = REGISTRY[q].fn
        fn(spark, SF_DIR).count()  # warm
        release_caches()
        spark.catalog.clearCache()
        times = {"off": [], "on": []}
        for r in range(rounds):
            for mode in ("off", "on"):
                spark.conf.set(CONF, "true" if mode == "on" else "false")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).count()
                dt = time.perf_counter() - t0
                release_caches()
                spark.catalog.clearCache()
                times[mode].append(dt)
                print(f"{q} round {r} checksum={mode}: {dt:.3f}s "
                      f"load={os.getloadavg()[0]:.1f}", flush=True)
        spark.conf.set(CONF, "false")
        for mode, ts in times.items():
            ts = sorted(ts)
            print(f"== {q} checksum={mode}: best {ts[0]:.3f} med "
                  f"{ts[len(ts)//2]:.3f} all {[round(t,2) for t in ts]}",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
