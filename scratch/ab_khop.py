"""Isolated interleaved A/B of khop_reach shapes (VERDICT r14 item 1).

Five shapes of the same 3-hop BFS over the sf0.1 trade graph:
  plain          — r13: no caches, fully unrolled plan
  edges_persist  — persist the edge relation only (no repartition)
  edges_repart   — repartition("src").persist() the edges (no nxt caches)
  nxt_only       — per-hop frontier persist only (no edge cache)
  full           — r14 shipped shape (edges repartition+persist + nxt persist)

Interleaved best-of-N timed .count() per shape per round (so a host
phase hits all shapes alike), caches released between runs, digest
(bit_xor(xxhash64(node,hop)), sum(node), sum(hop), count) checked
identical across shapes.

Usage: SPARK_GRAFT_CPUS=32 python scratch/ab_khop.py [rounds]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_datalake_framework_ingestion_spark.caching import release_caches, track
from aws_datalake_framework_ingestion_spark.session import get_session
from aws_datalake_framework_ingestion_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def base_rels(spark):
    o = load(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("a"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("b"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    seeds = (
        pairs.where(F.col("a") % 200 == 0).select(F.col("a").alias("node")).distinct()
    )
    return edges, seeds


def khop(edges, seeds, k=3, cache_edges="none", cache_nxt=False):
    if cache_edges == "persist":
        edges = track(edges.persist())
    elif cache_edges == "repart":
        edges = track(edges.repartition("src").persist())
    reach = seeds.select("node", F.lit(0).cast("int").alias("hop"))
    frontier = reach.select("node")
    for h in range(1, k + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(reach.select("node"), "node", "left_anti")
        )
        if cache_nxt:
            nxt = track(nxt.persist())
        reach = reach.unionAll(
            nxt.select("node", F.lit(h).cast("int").alias("hop"))
        )
        frontier = nxt
    return reach


SHAPES = {
    "plain": dict(cache_edges="none", cache_nxt=False),
    "edges_persist": dict(cache_edges="persist", cache_nxt=False),
    "edges_repart": dict(cache_edges="repart", cache_nxt=False),
    "nxt_only": dict(cache_edges="none", cache_nxt=True),
    "full": dict(cache_edges="repart", cache_nxt=True),
}


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_session(app_name="ab_khop")
    # digest check once per shape
    digests = {}
    for name, kw in SHAPES.items():
        edges, seeds = base_rels(spark)
        df = khop(edges, seeds, **kw)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("node").alias("sn"),
            F.sum("hop").alias("sh"),
            F.bit_xor(F.xxhash64("node", "hop")).alias("dg"),
        ).collect()[0]
        digests[name] = tuple(row)
        release_caches()
        spark.catalog.clearCache()
    print("digests:", digests, flush=True)
    assert len(set(digests.values())) == 1, "DIGEST MISMATCH"

    times = {k: [] for k in SHAPES}
    # warm each shape once
    for name, kw in SHAPES.items():
        edges, seeds = base_rels(spark)
        khop(edges, seeds, **kw).count()
        release_caches()
        spark.catalog.clearCache()
    for r in range(rounds):
        for name, kw in SHAPES.items():
            t0 = time.perf_counter()
            edges, seeds = base_rels(spark)
            khop(edges, seeds, **kw).count()
            dt = time.perf_counter() - t0
            release_caches()
            spark.catalog.clearCache()
            times[name].append(dt)
            print(f"round {r} {name}: {dt:.3f}s load={os.getloadavg()[0]:.1f}", flush=True)
    print("\n=== best / median ===")
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name:14s} best {ts[0]:.3f}  med {ts[len(ts)//2]:.3f}  all {[round(t,2) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
