"""T3 event-driven trigger analog: file drop under
``{watch}/{src_sys}/{asset}/`` → pipeline run → ledger row → archive.
Spark-native replacement for the reference's S3→Lambda→Airflow-REST
plumbing (airflow/dag_trigerrer/dag_trigerrer.py:9-31)."""

from __future__ import annotations

import os

import pytest

from aws_datalake_framework_ingestion_spark.catalog import Catalog
from aws_datalake_framework_ingestion_spark.pipeline import AssetSpec
from aws_datalake_framework_ingestion_spark.triggers import (
    DropWatcher,
    parse_drop_path,
)


@pytest.fixture()
def catalog(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "cat"))
    c.create_all()
    return c


def _drop(watch, src_sys, asset, name, text):
    d = os.path.join(watch, str(src_sys), str(asset))
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, name)
    with open(path, "w") as f:
        f.write(text)
    return path


def test_parse_drop_path(tmp_path):
    w = str(tmp_path)
    ok = parse_drop_path(w, os.path.join(w, "101", "7", "x.csv"))
    assert (ok.src_sys_id, ok.asset_id) == (101, 7)
    assert parse_drop_path(w, os.path.join(w, "junk", "7", "x.csv")) is None
    assert parse_drop_path(w, os.path.join(w, "101", "x.csv")) is None
    assert parse_drop_path(w, os.path.join(w, "101", "7", "_tmp.csv")) is None


def test_drop_triggers_pipeline_to_ledger(catalog, tmp_path):
    watch = str(tmp_path / "watch")
    work = str(tmp_path / "work")
    spec = AssetSpec(
        asset_id=7,
        src_sys_id=101,
        mask_cols=("email",),
        dq_not_null=("id",),
        dq_unique=("id",),
    )
    watcher = DropWatcher(
        catalog, watch, {(101, 7): spec}, work, fmt="csv"
    )
    assert watcher.scan_once() == []  # empty watch dir: no-op

    path = _drop(
        watch, 101, 7, "drop1.csv", "id,email\n1,a@x.com\n2,b@y.com\n"
    )
    exec_ids = watcher.scan_once()
    assert len(exec_ids) == 1

    # trigger-to-ledger: every stage recorded succeeded
    row = (
        catalog.read("run_ledger")
        .where(f"exec_id = '{exec_ids[0]}'")
        .first()
    )
    assert row is not None
    assert row["dq_validation"] == "succeeded"
    assert row["data_publish"] == "succeeded"

    # published output is masked
    pub_root = os.path.join(work, "7", "publish")
    ts_dir = os.listdir(pub_root)[0]
    out = catalog.spark.read.parquet(os.path.join(pub_root, ts_dir))
    emails = [r["email"] for r in out.collect()]
    assert all(len(e) == 64 for e in emails)  # sha2-256 hex, not raw

    # drop archived → second scan is a no-op (idempotent redelivery)
    assert not os.path.exists(path)
    assert os.path.exists(
        os.path.join(watch, "101", "7", "_ingested", "drop1.csv")
    )
    assert watcher.scan_once() == []


def test_unregistered_asset_left_in_place(catalog, tmp_path):
    watch = str(tmp_path / "watch")
    work = str(tmp_path / "work")
    watcher = DropWatcher(catalog, watch, {}, work, fmt="csv")
    path = _drop(watch, 1, 2, "x.csv", "id\n1\n")
    assert watcher.scan_once() == []
    assert os.path.exists(path)  # not consumed, may register later
