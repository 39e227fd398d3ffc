"""Shared helpers for query plan modules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load, register_views


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load(spark, sf_dir, name)


def dec_sum(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent exact sum of a double expression.

    Double addition is non-associative, so a sum's low bits depend on
    partition/merge order — a hash-parity hazard after shuffles (joins,
    wide aggs).  Casting each addend to DECIMAL(18, scale) first makes
    the sum exact and order-free; both Spark and DuckDB round the cast
    identically, and the final decimal→double cast also matches
    (verified empirically).  The result surfaces as DOUBLE because
    DuckDB's pandas conversion renders DECIMAL as float64.  The oracle
    side must mirror:  CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def sql_both(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Run identical SQL text on Spark (over registered temp views).

    The same string doubles as the DuckDB oracle — zero-drift parity
    for queries expressible in the common SQL dialect subset.
    """
    register_views(spark, sf_dir)
    return spark.sql(sql)
