"""Sinks (SURVEY.md §2.2): partitioned parquet/csv/json writers and
the single-file landing mode.

The reference's only data sink is `repartition(1).write.csv`
(dataIngestionUtils.py:117-118) — a full shuffle into one task.  The
engine default is partitioned parquet; single-file mode uses
coalesce(1) (no shuffle) and exists only for artifact-compatibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K1/K5: CSV landing/export, header on, distributed."""
    df.write.mode(mode).option("header", True).csv(path)


def write_single_file(df: DataFrame, path: str, fmt: str = "csv") -> None:
    """K1 single-artifact mode (reference repartition(1), :118) via
    coalesce — one output task without the round-robin shuffle."""
    w = df.coalesce(1).write.mode("overwrite")
    if fmt == "csv":
        w.option("header", True).csv(path)
    elif fmt == "json":
        w.json(path)
    else:
        w.parquet(path)


def compact_parquet(
    spark,
    path: str,
    target_files: int | None = None,
    target_mb: int = 128,
) -> int:
    """Small-file compaction — the OSS analog of Delta OPTIMIZE and the
    parquet-level version of the reference's stream-merge motivation
    (many tiny S3 objects → few right-sized files, SURVEY.md §4.1).

    Rewrites the dataset into ``target_files`` (default: sized so each
    file is ~``target_mb``) via coalesce, staged + atomically swapped
    so readers never see a partial dataset.  Returns the file count.
    """
    import math
    import os
    import shutil
    import uuid

    df = spark.read.parquet(path)
    if target_files is None:
        total = sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        target_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    tmp = f"{path.rstrip('/')}.compact.{uuid.uuid4().hex[:8]}"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    old = f"{path.rstrip('/')}.old.{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return target_files


def write_bucketed(
    df,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table — the co-located-join layout (SURVEY §7):
    rows are hash-partitioned into ``n_buckets`` files by
    ``bucket_cols`` AT WRITE TIME, so later equi-joins/aggregations on
    those columns read pre-shuffled data and plan with ZERO Exchange
    (see tests/test_bucketing.py for the plan proof).

    At 100 TB this is the difference between re-shuffling the fact
    table on every join and paying the shuffle once at ingestion: two
    tables bucketed the same way sort-merge-join with no network at
    all.  Requires saveAsTable (bucket metadata lives in the session
    catalog / metastore)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table, format="parquet")
