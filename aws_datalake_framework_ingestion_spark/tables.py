"""Testdata table registry + schema-normalizing loaders.

The driver's tables (TESTDATA.md / FIXTURES.md) are one parquet file
each.  Loading rules:

* ``events.ts`` is parquet TIMESTAMP(NANOS); with
  ``spark.sql.legacy.parquet.nanosAsLong`` Spark reads it as a ns-epoch
  long.  We convert to microsecond TIMESTAMP_NTZ (``ts div 1000``) —
  byte-identical to DuckDB's ``CAST(ts AS TIMESTAMP)`` truncation, and
  NTZ so values are independent of the session time zone.
* Everything else is read as-is; parquet µs/ms timestamps arrive as
  TIMESTAMP_NTZ already.

At 100 TB these would be partitioned datasets, not single files; the
loader takes any directory produced by ``spark.write.parquet`` too —
nothing here assumes a single file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import prep

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


# (appId, sf_dir, name) → DataFrame.  DataFrames are immutable plans,
# so memoizing kills the repeated parquet-footer/schema round trips
# (~0.3-0.7s per load at bench) without any semantic change; keyed by
# applicationId so a restarted session never sees stale plans.
_LOADS: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one named table with schema normalization applied."""
    prep(spark)
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    if key in _LOADS:
        return _LOADS[key]
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)")
        )
    _LOADS[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL surface)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
