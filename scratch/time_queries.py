"""Time registry queries isolated, bench-methodology (warm + best-of-N
count, caches cleared between runs).

Usage: python scratch/time_queries.py q1 q2 ... [--runs N] [--sf DIR]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_datalake_framework_ingestion_spark.caching import release_caches
from aws_datalake_framework_ingestion_spark.plans import REGISTRY
from aws_datalake_framework_ingestion_spark.session import get_session


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=")[1])
        if a.startswith("--sf="):
            sf_dir = a.split("=")[1]
    spark = get_session(app_name="time_queries")
    for name in args:
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).count()
        release_caches()
        spark.catalog.clearCache()
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
            release_caches()
            spark.catalog.clearCache()
        print(
            f"{name}: best {min(samples):.3f}s med "
            f"{sorted(samples)[len(samples)//2]:.3f}s "
            f"all {[round(t, 3) for t in samples]} rows={n} "
            f"load={os.getloadavg()[0]:.1f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
