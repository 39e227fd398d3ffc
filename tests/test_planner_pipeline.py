"""Watermark planner (A1-A3) + pipeline (ingest→dq→mask→publish):
the end-to-end ingestion-correctness fixture from FIXTURES.md — run 1
bootstraps full, run 2 extracts only the new window, replay is
idempotent."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from aws_datalake_framework_ingestion_spark.catalog import Catalog
from aws_datalake_framework_ingestion_spark.pipeline import (
    AssetSpec,
    DQError,
    mask,
    quality_check,
    run_asset,
)
from aws_datalake_framework_ingestion_spark.planner import (
    plan_extraction,
    probe_max,
    run_extraction,
)
from aws_datalake_framework_ingestion_spark.tables import load

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def catalog(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "cat"))
    c.create_all()
    return c


def test_probe_max_matches_orderby_limit(spark):
    ev = load(spark, SF, "events")
    top1 = ev.orderBy(F.col("ts").desc()).limit(1).first()["ts"]
    assert probe_max(ev, "ts") == top1  # max() ≡ reference's top-1 sort


def test_plan_full_vs_incremental(spark):
    ev = load(spark, SF, "events")
    df, plan = plan_extraction(ev, "full", None, None)
    assert plan.mode == "full" and df.count() == ev.count()

    # NULL watermark → bootstrap full scan, watermark still recorded
    df, plan = plan_extraction(ev, "incremental", "ts", None)
    assert plan.mode == "full" and plan.hi is not None
    assert df.count() == ev.count()

    # (lo, hi] half-open interval
    lo = probe_max(ev, "ts") - timedelta(days=1)
    df, plan = plan_extraction(ev, "incremental", "ts", lo)
    assert plan.mode == "incremental" and plan.lo == lo
    exp = ev.filter((F.col("ts") > F.lit(lo)) & (F.col("ts") <= F.lit(plan.hi)))
    assert df.count() == exp.count() > 0


def test_incremental_rerun_extracts_nothing_new(spark, catalog, tmp_path):
    """Run 1 (bootstrap) lands everything and persists hi; run 2 with
    no new data lands zero rows; appended data lands exactly once."""
    ev = load(spark, SF, "events").cache()
    land1 = str(tmp_path / "land1")
    plan1 = run_extraction(
        catalog, ev, src_sys_id=1, asset_id=11, ext_method="incremental",
        ext_col="ts", dest_path=land1,
    )
    assert plan1.mode == "full"
    assert spark.read.parquet(land1).count() == ev.count()
    assert catalog.last_ext_time(11) == plan1.hi

    land2 = str(tmp_path / "land2")
    plan2 = run_extraction(
        catalog, ev, src_sys_id=1, asset_id=11, ext_method="incremental",
        ext_col="ts", dest_path=land2,
    )
    assert plan2.mode == "incremental"
    assert spark.read.parquet(land2).count() == 0  # nothing new

    # simulate late-arriving source rows after the watermark
    extra = ev.withColumn("ts", F.col("ts") + F.expr("INTERVAL 100 DAYS"))
    grown = ev.unionByName(extra)
    land3 = str(tmp_path / "land3")
    plan3 = run_extraction(
        catalog, grown, src_sys_id=1, asset_id=11, ext_method="incremental",
        ext_col="ts", dest_path=land3,
    )
    assert plan3.mode == "incremental"
    assert spark.read.parquet(land3).count() == ev.count()  # only the new rows
    assert catalog.last_ext_time(11) == plan3.hi


def test_quality_check_and_mask(spark):
    ev = load(spark, SF, "events")
    spec = AssetSpec(
        asset_id=1, src_sys_id=1,
        dq_not_null=("event_id", "ts"), dq_unique=("event_id",),
    )
    m = quality_check(ev, spec)
    assert m["n_rows"] == ev.count()

    dup = ev.unionByName(ev.limit(1))
    with pytest.raises(DQError, match="duplicates"):
        quality_check(dup, spec)
    with pytest.raises(DQError, match="NULL"):
        quality_check(
            ev.withColumn("event_id", F.lit(None).cast("long")),
            AssetSpec(asset_id=1, src_sys_id=1, dq_not_null=("event_id",)),
        )

    masked = mask(ev, AssetSpec(asset_id=1, src_sys_id=1, mask_cols=("user_id",)))
    row = masked.first()
    assert len(row["user_id"]) == 64  # sha2-256 hex
    assert masked.count() == ev.count()


def test_run_asset_end_to_end(spark, catalog, tmp_path):
    ev = load(spark, SF, "events")
    spec = AssetSpec(
        asset_id=21, src_sys_id=3, ext_method="incremental", ext_col="ts",
        mask_cols=("props",), dq_not_null=("event_id",), dq_unique=("event_id",),
    )
    exec_id = run_asset(catalog, spec, ev, str(tmp_path / "zone"))
    row = catalog.read("run_ledger").filter(F.col("exec_id") == exec_id).first()
    assert row["dq_validation"] == "succeeded"
    assert row["data_masking"] == "succeeded"
    assert row["data_publish"] == "succeeded"
    assert row["last_ext_time"] is not None
    pub = spark.read.parquet(
        str(tmp_path / "zone" / "21" / "publish" / exec_id.split("_")[-1])
    )
    assert pub.count() == ev.count()
    assert pub.first()["props"] != ev.first()["props"]  # masked


def test_run_asset_dq_failure_recorded(spark, catalog, tmp_path):
    ev = load(spark, SF, "events")
    dup = ev.unionByName(ev.limit(5))
    spec = AssetSpec(asset_id=22, src_sys_id=3, dq_unique=("event_id",))
    with pytest.raises(DQError):
        run_asset(catalog, spec, dup, str(tmp_path / "zone"))
    row = (
        catalog.read("run_ledger").filter(F.col("asset_id") == 22).first()
    )
    assert row["dq_validation"] == "failed"  # fail fast, status recorded
    assert row["data_publish"] == "not started"
