"""A/B bm25_topk shapes: HEAD (4 tokenize passes), dl-from-tf
(no materialization), persisted-tf (tokenize once).

Usage: python scratch/ab_bm25.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from aws_datalake_framework_ingestion_spark.caching import release_caches, track
from aws_datalake_framework_ingestion_spark.operators.text import _toks
from aws_datalake_framework_ingestion_spark.session import get_session
from aws_datalake_framework_ingestion_spark.tables import load

K1, B, K = 1.2, 0.75, 3


def _core(df, tf, dl, query_pred, id_col="doc_id", text_col="text"):
    dft = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.col("dl").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_dl"),
    )
    q = (
        df.filter(query_pred)
        .select(
            F.col(id_col).alias("q_id"),
            F.explode(_toks(F.col(text_col))).alias("token"),
        )
        .distinct()
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
    )
    tfnorm = (F.col("tf") * (K1 + 1.0)) / (
        F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.col("avg_dl"))
    )
    term = F.round(idf * tfnorm, 6).cast("decimal(18,6)")
    scored = (
        F.broadcast(q)
        .join(tf, "token")
        .filter(F.col(id_col) != F.col("q_id"))
        .join(F.broadcast(dft), "token")
        .join(dl, id_col)
        .join(F.broadcast(stats))
        .groupBy("q_id", id_col)
        .agg(F.sum(term).cast("double").alias("bm25"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("bm25").desc(), F.col(id_col))
    return scored.withColumn("rn", F.row_number().over(w).cast("int")).filter(
        F.col("rn") <= K
    )


def v_head(spark, sf_dir):
    df = load(spark, sf_dir, "documents")
    tok = df.select(F.col("doc_id"), F.explode(_toks(F.col("text"))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    return _core(df, tf, dl, F.col("doc_id") < 5)


def v_dl_from_tf(spark, sf_dir):
    df = load(spark, sf_dir, "documents")
    tok = df.select(F.col("doc_id"), F.explode(_toks(F.col("text"))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    return _core(df, tf, dl, F.col("doc_id") < 5)


def v_persist_tf(spark, sf_dir):
    df = load(spark, sf_dir, "documents")
    tok = df.select(F.col("doc_id"), F.explode(_toks(F.col("text"))).alias("token"))
    tf = track(
        tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf")).persist()
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    return _core(df, tf, dl, F.col("doc_id") < 5)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_session(app_name="ab_bm25")
    variants = {
        "head": v_head,
        "dl_from_tf": v_dl_from_tf,
        "persist_tf": v_persist_tf,
    }
    digests = {}
    for name, fn in variants.items():
        df = fn(spark, sf_dir)
        dg = df.agg(
            F.count(F.lit(1)),
            F.sum(F.hash("q_id", "doc_id", F.col("bm25").cast("string"), "rn")),
        ).collect()[0]
        digests[name] = tuple(dg)
        release_caches()
        spark.catalog.clearCache()
    assert len(set(digests.values())) == 1, digests
    res = {n: [] for n in variants}
    for r in range(runs):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            res[name].append(time.perf_counter() - t0)
            release_caches()
            spark.catalog.clearCache()
    for name, ts in res.items():
        print(
            f"{name:12s} best {min(ts):6.3f}s spread {max(ts)-min(ts):6.3f}s "
            f"all {[round(t,2) for t in ts]} digest={digests[name]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
