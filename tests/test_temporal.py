"""Semantic tests for the temporal joins (operators/temporal.py):
as-of join and bucketized range join, each checked against a
brute-force reimplementation on a hand-built frame (boundary
conditions: equal timestamps, no-match rows, multi-key)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from aws_datalake_framework_ingestion_spark.operators import temporal as TP


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),  # exact tie with right
            (2, "u1", _ts("2024-01-01 10:30:00")),
            (3, "u1", _ts("2024-01-01 09:00:00")),  # before any right row
            (4, "u2", _ts("2024-01-01 10:05:00")),
            (5, "u3", _ts("2024-01-01 12:00:00")),  # key with no right rows
        ],
        "id long, user string, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 10:00:00"), 100.0),
            ("u1", _ts("2024-01-01 10:20:00"), 200.0),
            ("u2", _ts("2024-01-01 10:04:59"), 300.0),
        ],
        "user string, ts timestamp_ntz, val double",
    )
    return left, right


def test_asof_backward_inclusive(spark, frames):
    left, right = frames
    out = {
        r["id"]: (r["asof_ts"], r["asof_val"])
        for r in TP.asof_join(
            left, right, ts_col="ts", by=["user"], value_cols=["val"]
        ).collect()
    }
    assert len(out) == 5
    assert out[1] == (_ts("2024-01-01 10:00:00"), 100.0)  # ts == match (inclusive)
    assert out[2] == (_ts("2024-01-01 10:20:00"), 200.0)  # latest ≤
    assert out[3] == (None, None)  # nothing before
    assert out[4] == (_ts("2024-01-01 10:04:59"), 300.0)
    assert out[5] == (None, None)  # unseen key


def test_asof_keeps_left_payload_and_count(spark, frames):
    left, right = frames
    out = TP.asof_join(left, right, ts_col="ts", by=["user"], value_cols=["val"])
    assert out.count() == left.count()
    assert set(out.columns) == {"user", "ts", "id", "asof_ts", "asof_val"}


def test_range_join_matches_bruteforce(spark):
    """Bucketized candidates + exact predicate == the naive inequality
    join, including pairs that straddle a bucket boundary."""
    rows = [
        (i, f"u{i % 3}", _ts("2024-01-01 00:00:00") + dt.timedelta(minutes=7 * i))
        for i in range(60)
    ]
    ev = spark.createDataFrame(rows, "id long, user string, ts timestamp_ntz")
    got = {
        (r["id"], r["r_id"])
        for r in TP.range_join(
            ev, ev.select("user", "ts", "id"), key="user", window_seconds=3600
        ).collect()
    }
    data = [(i, u, t) for i, u, t in rows]
    want = {
        (i1, i2)
        for (i1, u1, t1) in data
        for (i2, u2, t2) in data
        if u1 == u2 and t1 < t2 <= t1 + dt.timedelta(hours=1)
    }
    assert got == want


def test_range_join_left_restores_unmatched(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 00:00:00")), (2, "b", _ts("2024-01-01 00:00:00"))],
        "id long, user string, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01 00:10:00"), 9)],
        "user string, ts timestamp_ntz, rid long",
    )
    out = TP.range_join(
        left, right, key="user", window_seconds=3600, how="left", left_id="id"
    )
    rows = {r["id"]: r["r_rid"] for r in out.collect()}
    assert rows == {1: 9, 2: None}
    with pytest.raises(ValueError):
        TP.range_join(left, right, key="user", how="left")
    with pytest.raises(ValueError):
        TP.range_join(left, right, key="user", how="full")


def test_chunked_range_agg_equals_global_window(spark):
    """chunked_range_agg must reproduce the single-partition
    RANGE-frame window BIT-FOR-BIT — including boundary ties (rows at
    exact chunk-edge instants), duplicate timestamps, pre-epoch
    (negative) order values, series shorter than one chunk, and a
    chunk width wider than the frame."""
    import random

    from pyspark.sql import Window as W

    from aws_datalake_framework_ingestion_spark.operators.temporal import (
        chunked_range_agg,
    )

    rng = random.Random(13)
    width = 100  # frame width in order-units
    rows = []
    rid = 0
    for series in ("a", "b", "c"):
        base = {"a": -350, "b": 0, "c": 40}[series]  # 'a' spans negatives
        n = {"a": 120, "b": 57, "c": 3}[series]
        for _ in range(n):
            # cluster points so frames hold many rows; force exact
            # chunk-boundary hits (multiples of width) and ties
            us = base + rng.choice(
                [rng.randrange(-400, 900), rng.randrange(-4, 5) * width]
            )
            rows.append((rid, series, us, rng.randrange(-50, 50) / 4.0))
            rid += 1
    rows.append((rid, "b", rows[-1][2], 1.25))  # exact duplicate ts
    df = spark.createDataFrame(
        rows, "id long, series string, us long, value double"
    ).localCheckpoint()  # pin: both plans must see identical input

    def aggs(win):
        return {
            "n": F.count(F.lit(1)).over(win),
            "s1": F.sum(F.col("value").cast("decimal(18,6)")).over(win),
            "mx": F.max("value").over(win),
        }

    gw = (
        W.partitionBy("series").orderBy("us").rangeBetween(-width, 0)
    )
    want = sorted(
        map(tuple, df.withColumns(aggs(gw)).collect())
    )
    for chunk_w in (width, 3 * width):
        got = sorted(
            map(
                tuple,
                chunked_range_agg(
                    df, ["series"], "us", width, aggs,
                    chunk_width_us=chunk_w,
                ).collect(),
            )
        )
        assert got == want, f"chunk_width={chunk_w}"

    with pytest.raises(ValueError):
        chunked_range_agg(df, ["series"], "us", width, aggs,
                          chunk_width_us=width - 1)


def test_chunked_range_sums_equals_global_window(spark):
    """The prefix-subtraction fast path (chunked_range_sums) must be
    bit-identical to the direct single-partition RANGE frame for
    subtractable aggregates — decimal sums and counts — across chunk
    boundaries, exact-boundary ties, duplicate timestamps, negative
    order values, and phantoms probing before a partition's first
    row."""
    import random

    from pyspark.sql import Window as W

    from aws_datalake_framework_ingestion_spark.operators.temporal import (
        chunked_range_sums,
    )

    rng = random.Random(31)
    width = 100
    rows = []
    rid = 0
    for series in ("a", "b", "c"):
        base = {"a": -350, "b": 0, "c": 40}[series]
        n = {"a": 120, "b": 57, "c": 3}[series]
        for _ in range(n):
            us = base + rng.choice(
                [rng.randrange(-400, 900), rng.randrange(-4, 5) * width]
            )
            rows.append((rid, series, us, rng.randrange(-50, 50) / 4.0))
            rid += 1
    rows.append((rid, "b", rows[-1][2], 1.25))
    df = spark.createDataFrame(
        rows, "id long, series string, us long, value double"
    ).localCheckpoint()

    gw = W.partitionBy("series").orderBy("us").rangeBetween(-width, 0)
    want = sorted(
        map(
            tuple,
            df.select(
                "id",
                F.count(F.lit(1)).over(gw).alias("n"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .over(gw)
                .alias("s1"),
            ).collect(),
        )
    )
    for chunk_w in (width, 3 * width):
        got = sorted(
            map(
                tuple,
                chunked_range_sums(
                    df,
                    ["series"],
                    "us",
                    width,
                    {
                        "n": F.lit(1).cast("long"),
                        "s1": F.col("value").cast("decimal(18,6)"),
                    },
                    key_cols=["id"],
                    chunk_width_us=chunk_w,
                )
                .select(
                    "id", "n", F.col("s1").cast("decimal(28,6)").alias("s1")
                )
                .collect(),
            )
        )
        assert got == want, f"chunk_width={chunk_w}"

    with pytest.raises(ValueError):
        chunked_range_sums(
            df, ["series"], "us", width,
            {"n": F.lit(1).cast("long")}, key_cols=["id"],
            chunk_width_us=width - 1,
        )


def test_chunked_range_assoc_equals_global_window(spark):
    """The two-stacks prefix/suffix path (chunked_range_assoc) must
    be bit-identical to the direct single-partition RANGE frame for
    associative aggregates — max, min, count AND decimal sums (no
    inverse used) — across chunk boundaries, exact-boundary ties,
    duplicate timestamps, negative order values, and phantoms probing
    empty previous chunks."""
    import random

    from pyspark.sql import Window as W

    from aws_datalake_framework_ingestion_spark.operators.temporal import (
        chunked_range_assoc,
    )

    rng = random.Random(47)
    width = 100
    rows = []
    rid = 0
    for series in ("a", "b", "c"):
        base = {"a": -350, "b": 0, "c": 40}[series]
        n = {"a": 120, "b": 57, "c": 3}[series]
        for _ in range(n):
            us = base + rng.choice(
                [rng.randrange(-400, 900), rng.randrange(-4, 5) * width]
            )
            rows.append((rid, series, us, rng.randrange(-50, 50) / 4.0))
            rid += 1
    rows.append((rid, "b", rows[-1][2], 1.25))
    df = spark.createDataFrame(
        rows, "id long, series string, us long, value double"
    ).localCheckpoint()

    gw = W.partitionBy("series").orderBy("us").rangeBetween(-width, 0)
    want = sorted(
        map(
            tuple,
            df.select(
                "id",
                F.max("value").over(gw).alias("hi"),
                F.min("value").over(gw).alias("lo"),
                F.count(F.lit(1)).over(gw).alias("n"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .over(gw)
                .cast("decimal(28,6)")
                .alias("s"),
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            chunked_range_assoc(
                df,
                ["series"],
                "us",
                width,
                {
                    "hi": (F.col("value"), F.max, F.greatest),
                    "lo": (F.col("value"), F.min, F.least),
                    "n": (
                        F.lit(1),
                        F.count,
                        lambda a, b: F.coalesce(a, F.lit(0))
                        + F.coalesce(b, F.lit(0)),
                    ),
                    "s": (
                        F.col("value").cast("decimal(18,6)"),
                        F.sum,
                        lambda a, b: F.when(
                            a.isNull() & b.isNull(), F.lit(None)
                        ).otherwise(
                            F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))
                        ),
                    ),
                },
                key_cols=["id"],
            )
            .select(
                "id", "hi", "lo",
                F.col("n").cast("long").alias("n"),
                F.col("s").cast("decimal(28,6)").alias("s"),
            )
            .collect(),
        )
    )
    assert got == want
