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
