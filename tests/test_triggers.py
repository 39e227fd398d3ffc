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


# ---------------------------------------------------------------------------
# T4: time-driven trigger (reference dl_fmwrk_dag_template.py:23-34,
# per-asset schedule_interval) — cron parsing + the scheduler loop
# driving two assets through two simulated ticks with ledger statuses.
# ---------------------------------------------------------------------------

from datetime import datetime

from aws_datalake_framework_ingestion_spark.triggers import (
    CronScheduler,
    CronSpec,
    ScheduledAsset,
)


def test_cron_spec_matching_and_next_fire():
    c = CronSpec("*/30 * * * *")
    assert c.next_fire(datetime(2026, 8, 15, 10, 5)) == datetime(2026, 8, 15, 10, 30)
    assert c.next_fire(datetime(2026, 8, 15, 10, 30)) == datetime(2026, 8, 15, 11, 0)
    daily = CronSpec("0 2 * * *")
    assert daily.next_fire(datetime(2026, 8, 15, 3, 0)) == datetime(2026, 8, 16, 2, 0)
    # dow: 2026-08-16 is a Sunday (cron 0); dom+dow restricted = OR
    assert CronSpec("0 0 * * 0").matches(datetime(2026, 8, 16, 0, 0))
    assert CronSpec("0 0 16 * 3").matches(datetime(2026, 8, 16, 0, 0))  # dom hits
    assert not CronSpec("0 0 17 * 3").matches(datetime(2026, 8, 16, 0, 0))
    # ranges, lists, steps, 7==Sunday
    assert CronSpec("5,35 8-17/3 * * 7").matches(datetime(2026, 8, 16, 11, 35))
    import pytest as _pytest

    for bad in ("* * * *", "61 * * * *", "*/0 * * * *", "* 25 * * *"):
        with _pytest.raises(ValueError):
            CronSpec(bad)


def test_cron_scheduler_two_assets_two_ticks(spark, catalog, tmp_path):
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [(i, f"u{i}", float(i)) for i in range(20)],
        "event_id long, user string, value double",
    )
    specs = {
        "half_hourly": ScheduledAsset(
            AssetSpec(asset_id=31, src_sys_id=9, dq_not_null=("event_id",)),
            CronSpec("*/30 * * * *"),
            lambda: ev,
        ),
        "daily_2am": ScheduledAsset(
            AssetSpec(asset_id=32, src_sys_id=9, dq_unique=("event_id",)),
            CronSpec("0 2 * * *"),
            lambda: ev,
        ),
    }
    sched = CronScheduler(
        catalog, specs, str(tmp_path / "zone"), start=datetime(2026, 8, 15, 1, 45)
    )
    # tick 1 (02:00): both fire (half-hourly at 02:00, daily at 02:00)
    ran1 = sched.advance_to(datetime(2026, 8, 15, 2, 0))
    assert sorted(ran1) == ["daily_2am", "half_hourly"]
    # tick 2 (02:30): only the half-hourly is due
    ran2 = sched.advance_to(datetime(2026, 8, 15, 2, 30))
    assert sorted(ran2) == ["half_hourly"]
    assert ran2["half_hourly"] != ran1["half_hourly"]  # distinct exec ids

    ledger = catalog.read("run_ledger")
    for exec_id in list(ran1.values()) + list(ran2.values()):
        row = ledger.filter(F.col("exec_id") == exec_id).first()
        assert row["dq_validation"] == "succeeded"
        assert row["data_publish"] == "succeeded"
    # catch-up = once: scheduler down past MANY half-hour marks still
    # runs the asset once at the next tick (reference catchup=False)
    ran3 = sched.advance_to(datetime(2026, 8, 16, 1, 59))
    assert sorted(ran3) == ["half_hourly"]
    assert sched.due(datetime(2026, 8, 16, 1, 59)) == []


def test_cron_scheduler_multi_failure_exception_group(spark, catalog, tmp_path):
    """ADVICE r9: when several due assets fail in one tick, ALL
    failures must surface (ExceptionGroup), the successes' exec_ids
    must ride along as exc.ran, and next-fire bookkeeping must still
    advance so the bad assets aren't re-run every tick."""
    import pytest

    ev = spark.createDataFrame(
        [(i, f"u{i}", float(i)) for i in range(5)],
        "event_id long, user string, value double",
    )

    def boom(msg):
        def _f():
            raise RuntimeError(msg)

        return _f

    specs = {
        "ok": ScheduledAsset(
            AssetSpec(asset_id=41, src_sys_id=9), CronSpec("0 2 * * *"), lambda: ev
        ),
        "bad_a": ScheduledAsset(
            AssetSpec(asset_id=42, src_sys_id=9), CronSpec("0 2 * * *"), boom("a")
        ),
        "bad_b": ScheduledAsset(
            AssetSpec(asset_id=43, src_sys_id=9), CronSpec("0 2 * * *"), boom("b")
        ),
    }
    sched = CronScheduler(
        catalog, specs, str(tmp_path / "zone"), start=datetime(2026, 8, 15, 1, 45)
    )
    with pytest.raises(ExceptionGroup) as ei:
        sched.advance_to(datetime(2026, 8, 15, 2, 0))
    grp = ei.value
    assert sorted(str(e) for e in grp.exceptions) == ["a", "b"]  # BOTH kept
    assert list(grp.ran) == ["ok"]  # partial successes attached
    # bookkeeping advanced: nothing is due again until the next match
    assert sched.due(datetime(2026, 8, 15, 2, 0)) == []
