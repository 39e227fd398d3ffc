"""Snapshot-versioned datasets (sources/versioned.py): immutable
version dirs + pointer flip — time travel, rollback, retention."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aws_datalake_framework_ingestion_spark.sources import versioned as V


def _vals(df):
    return sorted(r[0] for r in df.select("v").collect())


def test_write_read_latest_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "ds")
    assert V.latest_version(spark, path) == 0
    with pytest.raises(FileNotFoundError):
        V.read_version(spark, path)

    assert V.write_version(spark, spark.range(0, 3).select(F.col("id").alias("v")), path) == 1
    assert V.write_version(spark, spark.range(10, 15).select(F.col("id").alias("v")), path) == 2
    assert V.write_version(spark, spark.range(20, 22).select(F.col("id").alias("v")), path) == 3

    assert V.latest_version(spark, path) == 3
    assert _vals(V.read_version(spark, path)) == [20, 21]
    # time travel: old snapshots intact after later writes
    assert _vals(V.read_version(spark, path, 1)) == [0, 1, 2]
    assert _vals(V.read_version(spark, path, 2)) == [10, 11, 12, 13, 14]
    with pytest.raises(FileNotFoundError, match="available"):
        V.read_version(spark, path, 9)


def test_rollback_preserves_history_and_next_write_advances(spark, tmp_path):
    path = str(tmp_path / "rb")
    for lo in (0, 10, 20):
        V.write_version(
            spark, spark.range(lo, lo + 2).select(F.col("id").alias("v")), path
        )
    assert V.rollback(spark, path, 1) == 1
    # pointer reads the old snapshot...
    assert _vals(V.read_version(spark, path)) == [0, 1]
    # ...but the rolled-back-from snapshots still exist
    assert _vals(V.read_version(spark, path, 3)) == [20, 21]
    # and the next write does NOT overwrite v2/v3: it becomes v4
    n = V.write_version(
        spark, spark.range(30, 31).select(F.col("id").alias("v")), path
    )
    assert n == 4
    assert _vals(V.read_version(spark, path, 2)) == [10, 11]
    with pytest.raises(FileNotFoundError):
        V.rollback(spark, path, 99)


def test_vacuum_keeps_pointer_and_window(spark, tmp_path):
    path = str(tmp_path / "vac")
    for lo in (0, 10, 20, 30):
        V.write_version(
            spark, spark.range(lo, lo + 2).select(F.col("id").alias("v")), path
        )
    V.rollback(spark, path, 1)
    # keep_last=1 would reap v1..v3, but v1 is pinned by the pointer
    gone = V.vacuum_versions(spark, path, keep_last=1)
    assert gone == [2, 3]
    assert sorted(V._version_dirs(spark, path)) == [1, 4]
    assert _vals(V.read_version(spark, path)) == [0, 1]  # pointer intact
    assert not os.path.exists(os.path.join(path, "v=00002"))
    with pytest.raises(ValueError):
        V.vacuum_versions(spark, path, keep_last=0)
