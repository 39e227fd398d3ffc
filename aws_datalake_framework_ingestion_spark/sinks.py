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
