"""Scalar-function helpers (SURVEY.md §2.7) as reusable column
expressions, plus the path-layout conventions of SURVEY.md §2.6 O4."""

from .scalar import (
    exec_id_col,
    json_field,
    path_segment,
    raw_zone_path,
    ts_compact,
)

__all__ = [
    "exec_id_col",
    "json_field",
    "path_segment",
    "raw_zone_path",
    "ts_compact",
]
