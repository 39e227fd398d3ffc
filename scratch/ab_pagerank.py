"""A/B pagerank_int variants on one session: window-outdeg (current)
vs groupBy+join outdeg (r13) vs window-outdeg with eager persist.

Usage: python scratch/ab_pagerank.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from aws_datalake_framework_ingestion_spark.caching import release_caches, track
from aws_datalake_framework_ingestion_spark.session import get_session
from aws_datalake_framework_ingestion_spark.tables import load


def build_edges(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("a"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("b"),
        )
        .distinct()
    )
    return pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))


def pr_core(ed: DataFrame, ranks: DataFrame, iters=5, scale=10**9, damp_pct=85):
    base = (100 - damp_pct) * scale // 100
    for i in range(iters):
        contrib = ed.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), F.expr("r div outdeg").alias("c"))
        ranks = contrib.groupBy("node").agg(
            (F.lit(base) + F.expr(f"({damp_pct} * sum(c)) div 100")).alias("r")
        )
        if (i + 1) % 3 == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def v_window(spark, sf_dir):
    edges = build_edges(spark, sf_dir)
    ed = track(
        edges.withColumn("outdeg", F.count(F.lit(1)).over(W.partitionBy("src"))).persist()
    )
    ranks = (
        ed.select("src").distinct()
        .select(F.col("src").alias("node"), F.lit(10**9).cast("long").alias("r"))
    )
    return pr_core(ed, ranks)


def v_join(spark, sf_dir):
    edges = build_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = track(edges.join(deg, "src").persist())
    ranks = deg.select(F.col("src").alias("node"), F.lit(10**9).cast("long").alias("r"))
    return pr_core(ed, ranks)


def v_window_eager(spark, sf_dir):
    edges = build_edges(spark, sf_dir)
    ed = track(
        edges.withColumn("outdeg", F.count(F.lit(1)).over(W.partitionBy("src"))).persist()
    )
    ed.count()  # eager materialize the cache before iterating
    ranks = (
        ed.select("src").distinct()
        .select(F.col("src").alias("node"), F.lit(10**9).cast("long").alias("r"))
    )
    return pr_core(ed, ranks)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_session(app_name="ab_pagerank")
    sc = spark.sparkContext
    variants = {"window": v_window, "join": v_join, "window_eager": v_window_eager}
    # warm each once
    sums = {}
    for name, fn in variants.items():
        fn(spark, sf_dir).count()
        release_caches()
        spark.catalog.clearCache()
    res = {n: [] for n in variants}
    jobs = {n: 0 for n in variants}
    for r in range(runs):
        for name, fn in variants.items():
            j0 = len(sc.statusTracker().getJobIdsForGroup(None))
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            s = df.agg(F.sum("r")).collect()[0][0]
            sums.setdefault(name, s)
            assert sums[name] == s
            res[name].append(dt)
            release_caches()
            spark.catalog.clearCache()
    for name, ts in res.items():
        print(
            f"{name:14s} best {min(ts):6.3f}s spread {max(ts)-min(ts):6.3f}s "
            f"all {[round(t,2) for t in ts]} sum_r={sums[name]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
