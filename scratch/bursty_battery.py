"""Bursty-density battery for the chunked-frame family (round 14,
VERDICT r13 item 4).

chunked_range_sums / chunked_range_assoc partition the trailing-frame
computation by (series, 24 h chunk).  A flash crowd that lands MOST of
one series' rows inside a single 24 h chunk serializes that chunk's
cumulative/two-stacks scan into ONE task — linear (add-only prefix /
amortized-O(1) stack pops), not quadratic like the WindowExec rebuild,
so the r13 design argument says it should degrade by at most the
hot-task's share of the corpus.  This battery MEASURES it instead of
arguing it (the r13 skew battery's lesson):

* corpus A (uniform): scratch/sf10 events as generated — 10M rows, 5
  series, ~uniform over ~2 years.
* corpus B (bursty): same rows, but 80% of the 'signup' series
  (event_id % 5 != 0 → ~1.62M rows) remapped into ONE 24 h window
  (day-of-min-ts + old-ts mod 24 h, sub-day spread preserved; the
  timestamp unit is taken from the source file — µs in the derived
  sf10 corpus, NANOS in the driver's original testdata).

Measured: wall of the two chunked-frame consumers
(ts_rolling_zscore_outliers = prefix-subtraction sums,
ts_rolling_extrema_24h = two-stacks assoc) on A vs B, plus a
correctness pin on a 1%-slice of B: chunked_range_sums must stay
bit-equal to the direct single-partition RANGE window on the bursty
distribution (frame ties and the hot chunk included).

Run AFTER other JVMs are quiet:  python3 scratch/bursty_battery.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF10 = "/root/repo/scratch/sf10"
BURST = "/root/repo/scratch/sf10burst"
DAY_NS = 86_400 * 10**9


def build_burst_corpus() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(SF10, "events.parquet")
    dst = os.path.join(BURST, "events.parquet")
    if os.path.isdir(dst) and any(
        n.endswith(".parquet") for n in os.listdir(dst)
    ):
        print("# burst corpus already built", flush=True)
        return
    os.makedirs(dst, exist_ok=True)
    parts = sorted(
        n for n in os.listdir(src) if n.endswith(".parquet")
    )
    # unit-aware day width: the derived sf10 events carry
    # microsecond timestamps (pyarrow coerced NANOS -> us on the
    # derived write; the ORIGINAL driver testdata stays NANOS)
    ts_type = pq.read_schema(os.path.join(src, parts[0])).field("ts").type
    day_w = {"s": 86_400, "ms": 86_400 * 10**3, "us": 86_400 * 10**6,
             "ns": DAY_NS}[ts_type.unit]
    # hot day = the corpus' first full day (scan min ts first)
    min_ts = None
    for n in parts:
        t = pq.read_table(os.path.join(src, n), columns=["ts"])
        lo = pa.compute.min(t["ts"]).cast(pa.int64()).as_py()
        min_ts = lo if min_ts is None else min(min_ts, lo)
    day0 = min_ts - (min_ts % day_w) + day_w  # first full day start
    for n in parts:
        t = pq.read_table(os.path.join(src, n))
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False).copy()
        et = t["event_type"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        hot = (et == "signup") & (eid % 5 != 0)
        ts[hot] = day0 + (ts[hot] % day_w)
        cols = {c: t[c] for c in t.column_names}
        cols["ts"] = pa.array(ts).cast(ts_type)
        pq.write_table(pa.table(cols, schema=t.schema), os.path.join(dst, n))
        print(f"# wrote {n}: {int(hot.sum())} rows burst", flush=True)


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    w = time.perf_counter() - t0
    print(f"# {label}: {w:.2f}s ({out} rows)", flush=True)
    return w


def main() -> int:
    os.chdir("/root/repo")
    build_burst_corpus()

    from aws_datalake_framework_ingestion_spark.plans import REGISTRY
    from aws_datalake_framework_ingestion_spark.session import get_session

    spark = get_session(app_name="bursty_battery")
    zs = REGISTRY["ts_rolling_zscore_outliers"].fn
    ex = REGISTRY["ts_rolling_extrema_24h"].fn

    for fn, name in ((zs, "zscore_sums"), (ex, "extrema_assoc")):
        fn(spark, SF10).count()  # warm codegen once per plan shape
        a = timed(f"{name} uniform sf10", lambda: fn(spark, SF10).count())
        b = timed(f"{name} BURSTY sf10", lambda: fn(spark, BURST).count())
        print(
            f"# {name}: bursty/uniform = {b / a:.2f}x",
            flush=True,
        )

    # correctness pin: 1% slice of the bursty corpus (hot chunk
    # included) — chunked_range_sums vs the direct single-partition
    # RANGE window, bit-equal decimal sums
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from aws_datalake_framework_ingestion_spark.operators.temporal import (
        chunked_range_sums,
    )
    from aws_datalake_framework_ingestion_spark.tables import load

    ev = (
        load(spark, BURST, "events")
        .where(F.col("event_id") % 100 == 0)
        .select(
            "event_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("_us"),
            F.col("value").cast("decimal(20,6)").alias("_v"),
        )
    )
    width = 24 * 3600 * 1_000_000 - 1
    got = chunked_range_sums(
        ev,
        ["event_type"],
        "_us",
        width,
        {"s": F.col("_v"), "c": F.lit(1).cast("long")},
        ["event_id"],
    ).select("event_id", "s", "c")
    w = (
        W.partitionBy("event_type")
        .orderBy("_us")
        .rangeBetween(-width, 0)
    )
    want = ev.select(
        "event_id",
        F.sum("_v").over(w).alias("s2"),
        F.sum(F.lit(1).cast("long")).over(w).alias("c2"),
    )
    n_diff = (
        got.join(want, "event_id")
        .where(
            (F.col("s") != F.col("s2")) | (F.col("c") != F.col("c2"))
        )
        .count()
    )
    n = got.count()
    print(f"# slice equivalence: {n} rows, {n_diff} diffs", flush=True)
    assert n_diff == 0 and n > 0
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
