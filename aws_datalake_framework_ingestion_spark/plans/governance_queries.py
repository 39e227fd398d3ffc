"""Governance-stage queries: data-quality profiling and masking.

The reference pipeline runs ingest → quality-check → mask → publish
(`airflow/template/dl_fmwrk_dag_template.py:113`), but the dq and mask
stages are opaque Glue job submissions (`:60-82`) with their statuses
tracked in the run ledger (`dataIngestionUtils.py:240-242`).  The
engine implements them as real operators (`pipeline.quality_check`,
`pipeline.mask`); these queries expose the same computations as
oracle-checked surface so the stage semantics are verified against
DuckDB, not just unit-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query
from ._util import T


@query(
    "dq_profile_orders",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS nulls_custkey,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS distinct_orderkey,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS distinct_status,
           min(o_orderdate) AS min_orderdate,
           max(o_orderdate) AS max_orderdate,
           CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS nonpositive_price
    FROM orders
    """,
    tags=("governance", "dq", "agg"),
)
def dq_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dq_validation stage as a query: row count, null counts,
    key-uniqueness cardinality, domain cardinality, date bounds, and a
    range check — ONE aggregation pass over the table (the
    pipeline.quality_check contract: never one job per check).  At
    100 TB this is a single scan with partial aggregation; every
    metric is a commutative aggregate."""
    o = T(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("nulls_custkey"),
        F.countDistinct("o_orderkey").alias("distinct_orderkey"),
        F.countDistinct("o_orderstatus").alias("distinct_status"),
        F.min("o_orderdate").alias("min_orderdate"),
        F.max("o_orderdate").alias("max_orderdate"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias(
            "nonpositive_price"
        ),
    )


@query(
    "mask_customer_pii",
    oracle="""
    SELECT c_custkey,
           sha256(c_name) AS name_token,
           CAST(length(c_name) AS INT) AS name_len,
           c_mktsegment,
           CASE WHEN c_acctbal < 0 THEN 'NEGATIVE'
                WHEN c_acctbal < 5000 THEN 'LOW'
                ELSE 'HIGH' END AS bal_band
    FROM customer
    WHERE c_nationkey = 7
    """,
    tags=("governance", "mask"),
)
def mask_customer_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data_masking stage as a query: irreversible sha2-256
    tokenization of the identifying column (joinable but not
    reversible), plus generalization of the quasi-identifier
    (account balance → coarse bands) — the same transform
    pipeline.mask applies, verified bit-for-bit against DuckDB's
    sha256.  Pure narrow projection: no shuffle at any scale."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_nationkey") == 7)
    return c.select(
        "c_custkey",
        F.sha2(F.col("c_name"), 256).alias("name_token"),
        F.length("c_name").cast("int").alias("name_len"),
        "c_mktsegment",
        F.when(F.col("c_acctbal") < 0, "NEGATIVE")
        .when(F.col("c_acctbal") < 5000, "LOW")
        .otherwise("HIGH")
        .alias("bal_band"),
    )
