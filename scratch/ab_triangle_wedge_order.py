"""A/B adjudication of the r11 wedge-order pre-filter in
triangle_count (VERDICT r10 item 4): OLD emits each wedge in both leg
orders and lets the bloom probe + closing join discard the
non-closing order; NEW carries (deg, id) onto the legs and emits only
the closing order (half the pre-probe wedge volume).

Both variants share the identical orientation/word-filter build; the
only difference is the wedge join predicate.  Alternating best-of-N
on the sf1 co-purchase graph, counts asserted equal (and equal to the
committed operator's result).

Run:  python3 scratch/ab_triangle_wedge_order.py [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF1 = os.path.join("/root/repo", "scratch", "sf1")
FILTER_BITS = 1 << 28


def build(spark, variant: str):
    from pyspark.sql import functions as F

    li = (
        spark.read.parquet(os.path.join(SF1, "lineitem.parquet"))
        .select("l_orderkey", "l_partkey")
    )
    l2 = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("p2"))
    edges = (
        li.join(l2, "l_orderkey")
        .where(F.col("l_partkey") < F.col("p2"))
        .select(F.col("l_partkey").alias("a"), F.col("p2").alias("b"))
        .distinct()
    )
    e = edges.persist()
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = (
        und.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
        .withColumnRenamed("a", "v")
    )
    du = deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da")
    dv = deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db")
    oriented = (
        und.join(du, "a")
        .join(dv, "b")
        .where(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
        )
    )
    if variant == "new":
        o = oriented.select(
            F.col("a").alias("u"), F.col("b").alias("v"),
            F.col("db").alias("dv"),
        ).persist()
    else:
        o = oriented.select(
            F.col("a").alias("u"), F.col("b").alias("v")
        ).persist()

    mask = FILTER_BITS - 1
    p1 = F.xxhash64("u", "v").bitwiseAND(F.lit(mask))
    p2c = F.xxhash64("u", "v", F.lit(1)).bitwiseAND(F.lit(mask))
    pos = o.select(p1.alias("p")).unionAll(o.select(p2c.alias("p")))
    words = (
        pos.select(
            F.shiftright("p", 6).alias("w"),
            F.expr("shiftleft(1L, cast(p & 63 as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("bits"))
        .persist()
    )

    q1 = F.xxhash64("x", "y").bitwiseAND(F.lit(mask))
    q2 = F.xxhash64("x", "y", F.lit(1)).bitwiseAND(F.lit(mask))
    b1 = words.select(F.col("w").alias("_w1"), F.col("bits").alias("_b1"))
    b2 = words.select(F.col("w").alias("_w2"), F.col("bits").alias("_b2"))
    if variant == "new":
        w1 = o.select(F.col("u"), F.col("v").alias("x"), F.col("dv").alias("dx"))
        w2 = o.select(F.col("u"), F.col("v").alias("y"), F.col("dv").alias("dy"))
        pre = w1.join(w2, "u").where(
            (F.col("dx") < F.col("dy"))
            | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
        )
    else:
        w1 = o.select(F.col("u"), F.col("v").alias("x"))
        w2 = o.select(F.col("u"), F.col("v").alias("y"))
        pre = w1.join(w2, "u").where(F.col("x") != F.col("y"))
    wedges = (
        pre.select("x", "y", q1.alias("_q1"), q2.alias("_q2"))
        .join(F.broadcast(b1), F.shiftright("_q1", 6) == F.col("_w1"))
        .where(F.expr("(_b1 >> cast(_q1 & 63 as int)) & 1 = 1"))
        .join(F.broadcast(b2), F.shiftright("_q2", 6) == F.col("_w2"))
        .where(F.expr("(_b2 >> cast(_q2 & 63 as int)) & 1 = 1"))
        .select("x", "y")
    )
    closing = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = wedges.join(closing, ["x", "y"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    return tri, (e, o, words)


def main(rounds: int = 3) -> None:
    from pyspark.sql import SparkSession

    os.chdir("/root/repo")
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, list[float]] = {"old": [], "new": []}
    counts = set()
    for r in range(rounds):
        for variant in ("old", "new") if r % 2 == 0 else ("new", "old"):
            tri, cached = build(spark, variant)
            t0 = time.perf_counter()
            n = tri.collect()[0][0]
            dt = time.perf_counter() - t0
            counts.add(n)
            results[variant].append(round(dt, 2))
            for df in cached:
                df.unpersist()
            print(f"round {r} {variant}: {dt:.2f}s n={n}", flush=True)
    assert len(counts) == 1, f"count mismatch: {counts}"
    for v, ts in results.items():
        print(f"{v}: best {min(ts):.2f}s all {ts}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
