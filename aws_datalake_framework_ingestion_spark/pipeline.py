"""Pipeline driver: run(asset) = ingest → quality-check → mask →
publish, with per-stage ledger statuses.

Replaces the reference's Airflow control plane (SURVEY.md §2.6:
linear DAG t1>>…>>t6, dl_fmwrk_dag_template.py:39-113; dispatcher
dataIngestion.py:20-35) with a data-driven in-process driver: each
stage is a function over DataFrames, and the stage statuses are the
same three ledger columns the reference initializes to 'not started'
(dataIngestionUtils.py:240-242).

Unlike the reference (broad try/except that still records a catalog
row on failure — §4.3), stages fail fast and the failure status is
recorded before re-raising.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .catalog import Catalog
from .planner import run_extraction


@dataclass(frozen=True)
class AssetSpec:
    """One ingestable asset (reference data_asset_ingstn_atrbts row)."""

    asset_id: int
    src_sys_id: int
    ext_method: str = "full"  # full | incremental
    ext_col: str | None = None
    mask_cols: tuple[str, ...] = field(default=())
    dq_not_null: tuple[str, ...] = field(default=())
    dq_unique: tuple[str, ...] = field(default=())


class DQError(RuntimeError):
    pass


def quality_check(df: DataFrame, spec: AssetSpec) -> dict:
    """Data-quality gate: row count, not-null and uniqueness checks in
    ONE aggregation pass (no per-check jobs)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in spec.dq_not_null:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"))
    for c in spec.dq_unique:
        aggs.append(F.countDistinct(c).alias(f"distinct_{c}"))
    m = df.agg(*aggs).first().asDict()
    if m["n_rows"] == 0:
        raise DQError("empty extraction")
    for c in spec.dq_not_null:
        if m[f"nulls_{c}"]:
            raise DQError(f"{m[f'nulls_{c}']} NULLs in {c}")
    for c in spec.dq_unique:
        if m[f"distinct_{c}"] != m["n_rows"]:
            raise DQError(f"duplicates in {c}")
    return m


def mask(df: DataFrame, spec: AssetSpec) -> DataFrame:
    """Masking stage: irreversible sha2 tokenization of configured
    columns (the reference delegates this to an opaque Glue job,
    dl_fmwrk_dag_template.py:75-82; here it is a real operator)."""
    out = df
    for c in spec.mask_cols:
        out = out.withColumn(c, F.sha2(F.col(c).cast("string"), 256))
    return out


def publish(df: DataFrame, dest: str) -> None:
    """Publish stage: partitioned parquet to the consumer zone."""
    df.write.mode("overwrite").parquet(dest)


def run_asset(
    catalog: Catalog,
    spec: AssetSpec,
    source_df: DataFrame,
    work_root: str,
    run_ts: datetime | None = None,
) -> str:
    """Full pipeline for one asset; returns exec_id.

    Path layout mirrors the reference convention
    (`{asset}/init/{ts}` raw zone → processed/publish zones,
    dl_fmwrk_dag_template.py:13, dataIngestionUtils.py:229).

    ``run_ts`` is the run's LOGICAL timestamp (exec_id + zone paths):
    schedulers pass their tick time so replayed/simulated ticks get
    stable, distinct exec ids; interactive callers default to now.
    """
    ts = (run_ts or datetime.now()).strftime("%Y%m%d%H%M%S")
    exec_id = f"{spec.src_sys_id}_{spec.asset_id}_{ts}"
    raw = os.path.join(work_root, str(spec.asset_id), "init", ts)
    pub = os.path.join(work_root, str(spec.asset_id), "publish", ts)

    run_extraction(
        catalog,
        source_df,
        src_sys_id=spec.src_sys_id,
        asset_id=spec.asset_id,
        ext_method=spec.ext_method,
        ext_col=spec.ext_col,
        dest_path=raw,
        exec_id=exec_id,
    )
    landed = catalog.spark.read.parquet(raw)

    try:
        quality_check(landed, spec)
        catalog.set_stage_status(exec_id, "dq_validation", "succeeded")
    except DQError:
        catalog.set_stage_status(exec_id, "dq_validation", "failed")
        raise

    masked = mask(landed, spec)
    catalog.set_stage_status(exec_id, "data_masking", "succeeded")

    publish(masked, pub)
    catalog.set_stage_status(exec_id, "data_publish", "succeeded")
    return exec_id
