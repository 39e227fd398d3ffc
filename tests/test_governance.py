"""Governance-stage semantics beyond oracle parity: the DQ counters
must actually count (clean synthetic data yields zero orphans, which
a broken anti-join would also yield — plant violations to prove the
machinery)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_datalake_framework_ingestion_spark.plans import REGISTRY
from aws_datalake_framework_ingestion_spark.tables import load

SF = "/root/testdata/sf0.01"


def test_expectations_sweep_fires_on_dirty_rows(spark):
    rows = {
        r["rule"]: r["n_violations"]
        for r in REGISTRY["dq_expectations_lineitem"].fn(spark, SF).collect()
    }
    assert len(rows) == 7
    # the synthetic data contains returned-but-open lines (real signal)
    assert rows["returned_lines_not_open"] > 0
    assert rows["quantity_positive"] == 0


def test_referential_integrity_counts_planted_orphans(spark):
    """Planted orphan keys must be counted exactly — zero-orphan output
    on clean data is meaningful only if the counter provably counts."""
    li = load(spark, SF, "lineitem")
    o = load(spark, SF, "orders")
    # plant 7 lineitem rows pointing at order keys that don't exist
    dirty = li.unionByName(
        li.limit(7).withColumn("l_orderkey", F.col("l_orderkey") + 10_000_000)
    )
    got = (
        dirty.select("l_orderkey")
        .join(o.select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .count()
    )
    assert got == 7


def test_referential_integrity_clean_on_synthetic(spark):
    rows = {
        r["relationship"]: r["n_orphans"]
        for r in REGISTRY["dq_referential_integrity"].fn(spark, SF).collect()
    }
    assert len(rows) == 4
    assert all(v == 0 for v in rows.values())
