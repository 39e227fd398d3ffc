"""Interleaved A/B of the PPJoin POSITIONAL filter (VERDICT r14
item 6): prefix_filter_jaccard_pairs with the positional upper-bound
predicate ON (r14 shipped) vs OFF (prefix filter only), at sf0.1 and
the derived sf1, same session, outputs checked identical.

Usage: SPARK_GRAFT_CPUS=32 python scratch/ab_ppjoin.py [rounds] [sf_dir]
"""
import os
import sys
import time
from fractions import Fraction
from math import floor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_datalake_framework_ingestion_spark.caching import release_caches
from aws_datalake_framework_ingestion_spark.operators.dedup import (
    _verify_jaccard,
    doc_shingle_hashes,
)
from aws_datalake_framework_ingestion_spark.session import get_session
from aws_datalake_framework_ingestion_spark.tables import load


def pairs(df, threshold=0.6, positional_on=True, id_col="doc_id", k=3):
    num = floor(Fraction(threshold) * 1000)
    sh = doc_shingle_hashes(df, id_col, "text", k)
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
    s2 = sh.join(freq, "sh")
    perdoc = s2.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("_df", "sh"))).alias("_toks"),
        F.count(F.lit(1)).alias("_n"),
    )
    plen = (F.col("_n") - F.expr(f"({num} * _n + 999) div 1000") + 1).cast("int")
    arrs = perdoc.select(
        F.col(id_col),
        F.transform(F.col("_toks"), lambda x: x["sh"]).alias("sh_arr"),
        F.slice(F.col("_toks"), F.lit(1), plen).alias("_prefix"),
        F.col("_n"),
    ).persist()
    pref = arrs.select(
        F.col(id_col), F.col("_n"),
        F.posexplode(F.col("_prefix")).alias("_i", "_p"),
    ).select(F.col(id_col), F.col("_n"), F.col("_i"), F.col("_p.sh").alias("sh"))
    a = pref.select(F.col(id_col).alias("doc_a"), F.col("_n").alias("_na"),
                    F.col("_i").alias("_ia"), "sh")
    b = pref.select(F.col(id_col).alias("doc_b"), F.col("_n").alias("_nb"),
                    F.col("_i").alias("_ib"), "sh")
    ub = F.lit(1) + F.least(F.col("_na") - F.col("_ia") - 1,
                            F.col("_nb") - F.col("_ib") - 1)
    positional = ub * (1000 + num) >= num * (F.col("_na") + F.col("_nb"))
    cond = (F.col("doc_a") < F.col("doc_b"))
    if positional_on:
        cond = cond & positional
    cand = a.join(b, "sh").where(cond).select("doc_a", "doc_b").distinct()
    return _verify_jaccard(arrs.select(id_col, "sh_arr"), cand, id_col, threshold)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_session(app_name="ab_ppjoin")
    docs = load(spark, sf_dir, "documents")
    outs = {}
    for name, on in (("pos_on", True), ("pos_off", False)):
        outs[name] = sorted(map(tuple, pairs(docs, positional_on=on).collect()))
        release_caches()
        spark.catalog.clearCache()
    assert outs["pos_on"] == outs["pos_off"], "OUTPUT MISMATCH"
    print(f"outputs identical: {len(outs['pos_on'])} pairs", flush=True)
    times = {"pos_on": [], "pos_off": []}
    for r in range(rounds):
        for name, on in (("pos_on", True), ("pos_off", False)):
            t0 = time.perf_counter()
            pairs(docs, positional_on=on).count()
            dt = time.perf_counter() - t0
            release_caches()
            spark.catalog.clearCache()
            times[name].append(dt)
            print(f"round {r} {name}: {dt:.3f}s load={os.getloadavg()[0]:.1f}",
                  flush=True)
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"== {sf_dir} {name}: best {ts[0]:.3f} med {ts[len(ts)//2]:.3f} "
              f"all {[round(t,2) for t in ts]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
