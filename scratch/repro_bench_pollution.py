"""Reproduce the mid-bench inflation of iterative queries: run the
first N headline queries (warm+timed like bench.py), then time
graph_pagerank best-of-3.  Compare N values to find the polluter.

Usage: python scratch/repro_bench_pollution.py N [target]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from aws_datalake_framework_ingestion_spark.caching import release_caches  # noqa: E402
from aws_datalake_framework_ingestion_spark.plans import REGISTRY  # noqa: E402
from aws_datalake_framework_ingestion_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    n = int(sys.argv[1])
    target = sys.argv[2] if len(sys.argv) > 2 else "graph_pagerank"
    spark = get_session(app_name=f"repro_pollution_{n}")
    overrides = bench._bench_overrides()
    prefix = [q for q in bench.HEADLINE if q not in bench.PIPELINE_GATES][:n]
    t_all0 = time.perf_counter()
    for name in prefix:
        fn = overrides.get(name, REGISTRY[name].fn)
        fn(spark, SF_DIR).count()  # warm
        release_caches()
        spark.catalog.clearCache()
        fn(spark, SF_DIR).count()  # one timed-style run
        release_caches()
        spark.catalog.clearCache()
    print(f"prefix of {n} queries ran in {time.perf_counter()-t_all0:.1f}s")
    fn = overrides.get(target, REGISTRY[target].fn)
    fn(spark, SF_DIR).count()
    release_caches()
    spark.catalog.clearCache()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        ts.append(time.perf_counter() - t0)
        release_caches()
        spark.catalog.clearCache()
    print(
        f"{target} after {n} queries: best {min(ts):.3f}s "
        f"all {[round(t, 2) for t in ts]}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
