"""Attribute graph_cc's sf0.1 wall time: edge build (lineitem
self-join + pair agg) vs the min-label contraction loop.

VERDICT r7 item 4: graph_cc drifted 5.9 → ~7.8-8.1 s best-of-3 over
two rounds on UNCHANGED code, with both r7 measurements adjacent to
heavy batteries.  The r4 note says the edge build dominates variance;
this script measures each half best-of-N on a quiet host so the
band can be documented (or a real regression isolated).

Run from /root/repo on an otherwise idle machine:
    python3 scratch/adjudicate_graph_cc.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.getcwd())

from pyspark.sql import functions as F  # noqa: E402

from aws_datalake_framework_ingestion_spark.caching import release_caches  # noqa: E402
from aws_datalake_framework_ingestion_spark.session import get_session  # noqa: E402
from aws_datalake_framework_ingestion_spark.tables import load  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))


def edge_build(spark):
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    l2 = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("p2"))
    return (
        li.join(l2, "l_orderkey")
        .where(F.col("l_partkey") < F.col("p2"))
        .groupBy(F.col("l_partkey").alias("a"), F.col("p2").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("a", "b")
    )


def full_cc(spark):
    from aws_datalake_framework_ingestion_spark.plans import REGISTRY

    return REGISTRY["graph_cc"].fn(spark, SF)


def timed(label, fn, spark):
    fn(spark).count()  # warm
    release_caches()
    spark.catalog.clearCache()
    samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn(spark).count()
        samples.append(time.perf_counter() - t0)
        release_caches()
        spark.catalog.clearCache()
    best, worst = min(samples), max(samples)
    print(
        f"{label}: best {best:.2f}s  worst {worst:.2f}s  "
        f"all {[round(s, 2) for s in samples]}"
    )
    return best


def main() -> None:
    spark = get_session(app_name="adjudicate_graph_cc")
    e = timed("edge_build ", edge_build, spark)
    c = timed("graph_cc   ", full_cc, spark)
    print(f"contraction loop ≈ {c - e:.2f}s (full − edge build)")
    spark.stop()


if __name__ == "__main__":
    main()
