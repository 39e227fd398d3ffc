"""Reproduce the r14 mid-session bench degradation.

Usage: python scratch/repro_aging.py PRE... -- TARGET [runs]

Runs each PRE query once (warm) in registry-bench fashion, then runs
TARGET `runs` times (default 5) printing each sample.  A fresh session
per invocation, bench confs.  Lets us bisect which predecessor query
poisons the session for everything after it.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_datalake_framework_ingestion_spark.caching import release_caches  # noqa: E402
from aws_datalake_framework_ingestion_spark.plans import REGISTRY  # noqa: E402
from aws_datalake_framework_ingestion_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    if "--" in args:
        i = args.index("--")
        pre, rest = args[:i], args[i + 1 :]
    else:
        pre, rest = [], args
    target = rest[0]
    runs = int(rest[1]) if len(rest) > 1 else 5

    import bench as B

    overrides = B._bench_overrides()
    spark = get_session(app_name="repro_aging")

    def run(name: str) -> float:
        spec = REGISTRY[name]
        fn = overrides.get(name, spec.fn)
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        dt = time.perf_counter() - t0
        release_caches()
        spark.catalog.clearCache()
        return dt

    for name in pre:
        dt = run(name)
        print(f"pre  {name}: {dt:.2f}s", flush=True)
    samples = []
    for i in range(runs):
        dt = run(target)
        samples.append(dt)
        print(f"tgt  {target} run{i}: {dt:.2f}s", flush=True)
    print(
        f"# TARGET {target} best={min(samples):.2f}s "
        f"worst={max(samples):.2f}s after pre=[{','.join(pre)}]",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
