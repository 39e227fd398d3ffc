"""Distributed global ranking / equi-depth bucketing.

A bare ``row_number() OVER (ORDER BY ...)`` collapses to ONE window
partition in Spark — the classic scale cliff (fine in an oracle,
fatal on 6B rows).  ``global_rank`` produces the identical ranks with
no single-partition stage:

1. range-repartition on the order keys (Spark's distributed sort
   exchange — boundaries come from a sampled sketch, so the SPLIT is
   nondeterministic run to run, but ranks depend only on the total
   order, which is made unique by the caller's tie-break columns);
2. per-partition local row_number (window partitioned by
   ``spark_partition_id()`` — every partition ranks in parallel);
3. per-partition counts → driver (one tiny collect, #partitions
   rows) → broadcast prefix offsets → global rank = offset + local.

This is the standard parallel-ranking construction (count-prefix over
range-partitioned runs); at 100 TB the only non-linear piece is the
range exchange, which a sort would pay anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[str | Column],
    rank_col: str = "rk",
    num_partitions: int = 32,
) -> DataFrame:
    """Append a 1-based global row_number ``rank_col`` under the TOTAL
    order given by ``order_cols`` (callers must include tie-break
    columns that make the order unique, or ranks within ties follow
    the physical order)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    # PERSIST the ranged relation: repartitionByRange draws a fresh
    # RANDOM sample of boundaries on every execution, so the
    # size-collect below and the caller's final action must see the
    # SAME physical partitioning or the prefix offsets are wrong
    # (same hazard as sinks.write_zordered documents).
    part = (
        df.repartitionByRange(num_partitions, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    local = F.row_number().over(W.partitionBy("_pid").orderBy(*cols))
    part = part.withColumn("_local", local)
    sizes = {
        r["_pid"]: r["n"]
        for r in part.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off = F.when(F.lit(False), F.lit(0))
    for pid, o in offsets.items():
        off = off.when(F.col("_pid") == pid, F.lit(o))
    return part.withColumn(
        rank_col, (off.cast("long") + F.col("_local")).cast("long")
    ).drop("_pid", "_local")


def equi_depth_buckets(
    df: DataFrame,
    order_cols: list[str | Column],
    k: int = 10,
    bucket_col: str = "bucket",
    num_partitions: int = 32,
) -> DataFrame:
    """Assign SQL-``ntile(k)`` buckets under a total order without a
    single-partition window: global_rank + the exact ntile split
    (first N mod k buckets take ceil(N/k) rows).  The row count N is
    one driver scalar — the same legitimate model-state collect as a
    watermark probe."""
    ranked = global_rank(df, order_cols, rank_col="_rk", num_partitions=num_partitions)
    n = df.count()
    q, r = divmod(n, k)
    boundary = r * (q + 1)
    # BIGINT `div` (never float division — a last-ULP rounding at a
    # bucket boundary would misplace a row); q/r/boundary are trusted
    # driver ints, no injection surface
    bucket = F.expr(
        f"CAST(CASE WHEN _rk <= {boundary} "
        f"THEN (_rk - 1) div {q + 1} "
        f"ELSE {r} + (_rk - {boundary} - 1) div {max(q, 1)} "
        f"END + 1 AS INT)"
    )
    return ranked.withColumn(bucket_col, bucket).drop("_rk")
