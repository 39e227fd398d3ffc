"""Adversarial-skew battery, round 13 (VERDICT r11 item 6 / r12
item 4).  Two iterations were needed — the first (see
skew_battery_r13.log + BASELINE.md) found that (a) a 10%-hot key on
60M rows is NOT pathological at 32 cores (the 6M-row hot task is
seconds of linear probe, cheaper than salting's 8x build-side
replication), and (b) the sf10 derived documents corpus is
near-dup-quadratic BY CONSTRUCTION (~100 mutated replicas per base
doc -> 25-40M legitimate candidate pairs), which swamps any planted
hot-bucket signal.  This version makes the adversary actually
adversarial:

1. JOIN SKEW — 50% of sf10 lineitem (30M of 60M rows) on ONE
   l_orderkey.  Measures: plain join on the UNSKEWED table
   (reference wall), plain on skewed with AQE skew-split on / off,
   salted (8 sub-keys) on skewed.  Expect: plain/skew-off degrades
   toward the one-task wall; salted holds near the reference;
   correctness pinned by bit-equal aggregates across all plans.
2. LSH HOT BUCKET — base corpus = sf0.1's 5,000 mutually-dissimilar
   docs (the sf10 derived corpus masks the signal, see above) plus a
   planted block of N IDENTICAL docs: every band hashes the block
   into one bucket, the canonical boilerplate pathology.  capped
   (default max_bucket_size=1000 -> star candidates) vs uncapped
   (quadratic bucket join) at N=5k; capped additionally held at
   N=50k where uncapped is ~1.25e9 candidate pairs by construction
   (extrapolated, not run).  Contract: capped pairs still cluster
   the block into ONE group.
3. CC HOT COMPONENT — min-label propagation on a 1-hub/500k-leaf
   star + 500k background edges vs a same-edge-count random graph:
   the hot label key must stay in-band (AQE skew split + early-stop).

Run AFTER other JVMs are quiet:  python3 scratch/skew_battery.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF10 = "/root/repo/scratch/sf10"
SF01 = "/root/testdata/sf0.1"
SKEW = "/root/repo/scratch/sf10skew"


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    w = time.perf_counter() - t0
    print(f"# {label}: {w:.2f}s", flush=True)
    return w, out


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    os.chdir("/root/repo")
    spark = (
        SparkSession.builder.master("local[24]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from aws_datalake_framework_ingestion_spark.operators import dedup as D
    from aws_datalake_framework_ingestion_spark.operators.skew import salted_join
    from aws_datalake_framework_ingestion_spark.plans._util import dec_sum

    # ---------- derive skewed variants (idempotent) ------------------
    li_skew_p = f"{SKEW}/lineitem_hot50.parquet"
    if not os.path.isdir(li_skew_p):
        li = spark.read.parquet(f"{SF10}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_extendedprice"
        )
        hot = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(2)) == 0
        li.withColumn(
            "l_orderkey", F.when(hot, F.lit(1)).otherwise(F.col("l_orderkey"))
        ).repartition(64).write.mode("overwrite").parquet(li_skew_p)

    base_docs = spark.read.parquet(f"{SF01}/documents.parquet").select(
        "doc_id", "text"
    )
    docs_hot = {}
    for n_hot in (5_000, 50_000):
        p = f"{SKEW}/docs_base5k_hot{n_hot}.parquet"
        docs_hot[n_hot] = p
        if not os.path.isdir(p):
            block = spark.range(n_hot).select(
                (F.col("id") + 1_000_000).alias("doc_id"),
                F.lit(
                    "the quick brown fox jumps over the lazy dog again "
                    "and again in identical boilerplate shared across "
                    "the planted block of this adversarial corpus"
                ).alias("text"),
            )
            base_docs.unionByName(block).repartition(16).write.mode(
                "overwrite"
            ).parquet(p)

    # ---------- 1. join skew -----------------------------------------
    li_plain = spark.read.parquet(f"{SF10}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    li_skew = spark.read.parquet(li_skew_p)
    orders = spark.read.parquet(f"{SF10}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )

    def agg(df):
        return (
            df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"), dec_sum("l_extendedprice", "t"))
            .collect()
        )

    walls, results = {}, {}
    walls["reference (unskewed, plain)"], _ = timed(
        "join reference unskewed plain",
        lambda: agg(li_plain.join(orders, "l_orderkey")),
    )
    for skew_split in (False, True):
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_split).lower()
        )
        tag = "aqe-skew-on" if skew_split else "aqe-skew-off"
        walls[f"plain/{tag}"], results[f"plain/{tag}"] = timed(
            f"join plain   [{tag}]",
            lambda: agg(li_skew.join(orders, "l_orderkey")),
        )
        walls[f"salted/{tag}"], results[f"salted/{tag}"] = timed(
            f"join salted  [{tag}]",
            lambda: agg(
                salted_join(
                    li_skew, orders, on=["l_orderkey"], salt=8,
                    salt_cols=["l_orderkey", "l_linenumber"],
                )
            ),
        )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    canon = sorted(map(tuple, results["plain/aqe-skew-on"]))
    join_ok = all(sorted(map(tuple, r)) == canon for r in results.values())
    print(f"join correctness (4 skewed plans bit-equal): {join_ok}",
          flush=True)

    # ---------- 2. LSH hot bucket ------------------------------------
    d5 = spark.read.parquet(docs_hot[5_000])
    d50 = spark.read.parquet(docs_hot[50_000])
    w_cap5, pairs_cap5 = timed(
        "minhash capped   @5k-hot",
        lambda: D.minhash_lsh_candidates(d5, threshold=0.5).count(),
    )
    w_uncap5, pairs_uncap5 = timed(
        "minhash UNCAPPED @5k-hot",
        lambda: D.minhash_lsh_candidates(
            d5, threshold=0.5, max_bucket_size=None
        ).count(),
    )
    w_cap50, pairs_cap50 = timed(
        "minhash capped   @50k-hot",
        lambda: D.minhash_lsh_candidates(d50, threshold=0.5).count(),
    )
    capped_pairs = D.minhash_lsh_candidates(d5, threshold=0.5)
    clusters = (
        D.dedup_clusters(
            capped_pairs.where(
                (F.col("doc_a") >= 1_000_000) | (F.col("doc_b") >= 1_000_000)
            ).select(
                F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
            ),
            a_col="a",
            b_col="b",
            max_iters=100,
        )
        .where(F.col("doc_id") >= 1_000_000)
        .select("cluster_id")
        .distinct()
        .count()
    )
    print(
        f"cap contract: hot block clusters = {clusters} (want 1); "
        f"pairs capped@5k={pairs_cap5} uncapped@5k={pairs_uncap5} "
        f"capped@50k={pairs_cap50}",
        flush=True,
    )

    # ---------- 3. CC hot component ----------------------------------
    hub = spark.range(1, 500_001).select(
        F.lit(0).alias("a"), F.col("id").alias("b")
    )
    bg = spark.range(500_001, 1_000_001).select(
        F.col("id").alias("a"),
        (F.pmod(F.xxhash64("id"), F.lit(400_000)) + F.lit(1_000_001)).alias("b"),
    )
    star = hub.unionByName(bg).repartition(64).persist()
    star.count()
    rand = (
        spark.range(1, 1_000_001)
        .select(
            F.col("id").alias("a"),
            (F.pmod(F.xxhash64("id"), F.lit(999_983)) + F.lit(1_000_001)).alias("b"),
        )
        .repartition(64)
        .persist()
    )
    rand.count()
    w_star, n_star = timed(
        "cc star (1 hub x 500k + 500k bg)",
        lambda: D.dedup_clusters(star, a_col="a", b_col="b", max_iters=100)
        .select("cluster_id").distinct().count(),
    )
    w_rand, n_rand = timed(
        "cc random (same edge count)",
        lambda: D.dedup_clusters(rand, a_col="a", b_col="b", max_iters=100)
        .select("cluster_id").distinct().count(),
    )
    print(f"cc components: star={n_star} rand={n_rand}", flush=True)

    # Bars (v3): the 5k-hot WALLS don't separate (the boilerplate doc
    # is short, so verifying 12.5M jaccard-1 pairs is cheap — measured
    # 6.48 vs 6.44 s); the cap's signal is the OUTPUT CARDINALITY
    # (linear star vs quadratic enumeration) and the wall holding at
    # the 50k pathological size, where uncapped is ~20e9 pre-distinct
    # candidate rows by construction (16 bands x C(50k,2) x 2) and is
    # not runnable on this host.
    ok = (
        join_ok
        and clusters == 1
        and walls["salted/aqe-skew-off"] < walls["plain/aqe-skew-off"]
        and pairs_cap5 * 100 < pairs_uncap5  # linear vs quadratic output
        and w_cap50 < 3 * max(w_cap5, 10.0)  # cap holds at 10x hot size
        and w_star < 3 * w_rand + 30
    )
    print("SKEW BATTERY " + ("OK" if ok else "CHECK FAILED"), flush=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
