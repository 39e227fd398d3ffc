"""Snapshot-versioned parquet datasets: immutable version directories
plus an atomically-flipped pointer file — time travel, reproducible
training snapshots, and rollback without requiring a table format.

Layout::

    {path}/v=00001/...parquet     (immutable once published)
    {path}/v=00002/...
    {path}/_LATEST                ("2" — the reader pointer)

Writers stage into ``{path}/v=<next>.tmp.<hex>``, rename to
``v=<next>`` (atomic on POSIX/HDFS), then flip ``_LATEST`` (a
single-object create).  This is exactly the object-store-safe posture
``files.staged_swap``'s docstring prescribes for S3A: version
directories are IMMUTABLE, so a reader holding the old pointer reads
a complete old snapshot and no reader ever lists a directory being
mutated — the pointer flip, not a directory rename, is the commit
point.

The NEXT version number comes from scanning the version directories,
NOT from the pointer: after a rollback the pointer moves backwards,
and deriving the next number from it would overwrite the
rolled-back-from snapshot (history loss).  ``vacuum_versions`` is the
retention reaper and never deletes the pointed-at version.

Reference parity: the reference's catalog mutations go through a live
RDS store with no history (aws-datalake-framework-ingestion
pg_connect.py:330-395 UPDATE/DELETE in place); this module adds the
time-travel dimension a governed lake needs on top of the staged-swap
transaction analog (R19, catalog.py).
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, SparkSession

from .files import _fs
from .manifest import _read_text, _write_text

LATEST = "_LATEST"
_V_RE = re.compile(r"^v=(\d{5})$")


def _version_dirs(spark: SparkSession, path: str) -> list[int]:
    """Existing version numbers under ``path`` (empty when none)."""
    fs, jvm = _fs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        if not st.isDirectory():
            continue
        m = _V_RE.match(st.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def latest_version(spark: SparkSession, path: str) -> int:
    """The reader pointer (0 when the dataset has no versions yet)."""
    text = _read_text(spark, f"{path.rstrip('/')}/{LATEST}")
    return int(text.strip()) if text else 0


def write_version(spark: SparkSession, df: DataFrame, path: str) -> int:
    """Publish ``df`` as the next immutable snapshot and flip the
    pointer to it.  Returns the new version number."""
    base = path.rstrip("/")
    n = (_version_dirs(spark, base) or [0])[-1] + 1
    final = f"{base}/v={n:05d}"
    tmp = f"{final}.tmp.{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    fs, jvm = _fs(spark, base)
    P = jvm.org.apache.hadoop.fs.Path
    if not fs.rename(P(tmp), P(final)):
        fs.delete(P(tmp), True)
        raise IOError(f"write_version: could not publish {tmp} -> {final}")
    _write_text(spark, f"{base}/{LATEST}", str(n))
    return n


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: snapshot ``version`` (default: the pointer).

    Missing datasets and vacuumed/unknown versions fail loudly with
    the available range rather than as a bare path error."""
    base = path.rstrip("/")
    if version is None:
        version = latest_version(spark, base)
        if version == 0:
            raise FileNotFoundError(f"no versions published under {base}")
    have = _version_dirs(spark, base)
    if version not in have:
        raise FileNotFoundError(
            f"version {version} not present under {base} "
            f"(available: {have or 'none'})"
        )
    return spark.read.parquet(f"{base}/v={version:05d}")


def rollback(spark: SparkSession, path: str, version: int) -> int:
    """Flip the pointer BACK to an existing snapshot (history is
    kept — a later write_version continues from the highest
    directory, never overwriting the rolled-back-from snapshot)."""
    base = path.rstrip("/")
    have = _version_dirs(spark, base)
    if version not in have:
        raise FileNotFoundError(
            f"rollback target {version} not present under {base} "
            f"(available: {have or 'none'})"
        )
    _write_text(spark, f"{base}/{LATEST}", str(version))
    return version


def vacuum_versions(
    spark: SparkSession, path: str, keep_last: int = 2
) -> list[int]:
    """Retention reaper: delete version directories older than the
    newest ``keep_last``, but NEVER the pointed-at version (a rolled-
    back pointer pins its snapshot past any retention window).
    Returns the deleted version numbers."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    base = path.rstrip("/")
    have = _version_dirs(spark, base)
    pointer = latest_version(spark, base)
    victims = [v for v in have[:-keep_last] if v != pointer]
    fs, jvm = _fs(spark, base)
    P = jvm.org.apache.hadoop.fs.Path
    for v in victims:
        fs.delete(P(f"{base}/v={v:05d}"), True)
    return victims
