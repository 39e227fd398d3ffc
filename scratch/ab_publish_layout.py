"""Interleaved A/B of the publish file-layout policy (VERDICT r14
item 2): run the ANN append gate (build + 2 delta appends + read-back
+ recall queries — the full append+read ROUND TRIP) under
SPARK_GRAFT_PUBLISH_REBALANCE = always (r14 shipped) vs auto (r15
size-conditional) vs never, alternating within one session so a host
phase hits all modes alike.

Usage: SPARK_GRAFT_CPUS=32 python scratch/ab_publish_layout.py [rounds] [query]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_datalake_framework_ingestion_spark.caching import release_caches
from aws_datalake_framework_ingestion_spark.plans import REGISTRY
from aws_datalake_framework_ingestion_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MODES = ["always", "auto", "never"]


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    qname = sys.argv[2] if len(sys.argv) > 2 else "ns_ann_index_append"
    fn = REGISTRY[qname].fn
    spark = get_session(app_name="ab_publish_layout")
    rows = {}
    for mode in MODES:  # digest + warm per mode
        os.environ["SPARK_GRAFT_PUBLISH_REBALANCE"] = mode
        rows[mode] = sorted(map(tuple, fn(spark, SF_DIR).collect()))
        release_caches()
        spark.catalog.clearCache()
    print("rows identical:", len({str(v) for v in rows.values()}) == 1, flush=True)
    assert len({str(v) for v in rows.values()}) == 1, rows

    times = {m: [] for m in MODES}
    for r in range(rounds):
        for mode in MODES:
            os.environ["SPARK_GRAFT_PUBLISH_REBALANCE"] = mode
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            dt = time.perf_counter() - t0
            release_caches()
            spark.catalog.clearCache()
            times[mode].append(dt)
            print(f"round {r} {mode}: {dt:.3f}s load={os.getloadavg()[0]:.1f}", flush=True)
    os.environ.pop("SPARK_GRAFT_PUBLISH_REBALANCE", None)
    print("\n=== best / median ===")
    for mode, ts in times.items():
        ts = sorted(ts)
        print(f"{mode:8s} best {ts[0]:.3f}  med {ts[len(ts)//2]:.3f}  all {[round(t,2) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
