"""Scalar column helpers mirroring the reference's driver-side Python
string ops (SURVEY.md §2.7) as vectorized column expressions.

Reference counterparts (ingestion/utils/dataIngestionUtils.py):
  * ``source_path.split("/")[5]`` (:40) → :func:`path_segment`
  * exec-id minting f-string (dl_fmwrk_dag_template.py:11-12) →
    :func:`exec_id_col` / :func:`ts_compact`
  * path layout `{asset}/init/{ts}` (template:13) →
    :func:`raw_zone_path`
  * driver-side json.loads (:110) → :func:`json_field`
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def path_segment(path: str | Column, index: int) -> Column:
    """N-th '/'-separated segment (0-based), e.g. the timestamp at
    position 5 of the reference's source path."""
    c = F.col(path) if isinstance(path, str) else path
    return F.element_at(F.split(c, "/"), index + 1)


def ts_compact(ts: str | Column) -> Column:
    """Timestamp → yyyyMMddHHmmss (the reference's exec-id/path stamp
    format, parsed back with strptime at :245)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, "yyyyMMddHHmmss")


def exec_id_col(src_sys_id: Column, asset_id: Column, ts: Column) -> Column:
    """`{src}_{asset}_{yyyymmddhhmmss}` (dl_fmwrk_dag_template.py:11)."""
    return F.concat_ws("_", src_sys_id, asset_id, ts_compact(ts))


def raw_zone_path(bucket: Column, asset_id: Column, ts: Column) -> Column:
    """`{bucket}/{asset}/init/{ts}` layout (template:13)."""
    return F.concat_ws("/", bucket, asset_id, F.lit("init"), ts_compact(ts))


def json_field(col: str | Column, path: str, cast: str | None = None) -> Column:
    """Typed JSON field extraction (replaces driver-side json.loads)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.get_json_object(c, path)
    return out.cast(cast) if cast else out
