"""Snapshot-versioned parquet datasets: immutable version directories
plus an atomically-flipped pointer file — time travel, reproducible
training snapshots, and rollback without requiring a table format.

Layout::

    {path}/v=00001/...parquet     (immutable once published)
    {path}/v=00002/...
    {path}/_LATEST                ("2" — the reader pointer)

Writers stage into ``{path}/_stage.tmp.<hex>``, rename to
``v=<next>`` (atomic on POSIX/HDFS, claim-checked and verified
against concurrent publishers — see ``write_version``), then flip
``_LATEST`` (a single-object create).  This is exactly the object-store-safe posture
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

import os
import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from .files import _fs
from .manifest import _read_text, _write_text_atomic

LATEST = "_LATEST"

# Publish file-layout knobs (r15, VERDICT r14 item 2).  r14 routed
# EVERY publish through a REBALANCE hint (guide §6 output sizing) —
# right for big segments, but the extra exchange is one more
# sequential stage-job per publish, and a 3-row delta segment doesn't
# need AQE to coalesce it; the driver measured the append gate 1.6×
# slower at both core counts.  Policy (env-tunable, data-derived —
# never a core-count constant):
#   auto   — Catalyst's optimizedPlan size ESTIMATE picks the layout:
#            ≤ threshold → coalesce(1) (single file, NARROW — no
#            exchange, no extra stage); above (or unknown) →
#            REBALANCE (advisory-sized files, the 100 TB posture).
#            Estimates only over-state (Filter passes its child's
#            size through), so a small estimate is reliably small,
#            and a big-source delta conservatively keeps REBALANCE.
#   always / never — force one layout (A/B harnesses, deployments
#            with their own compaction).
_PUBLISH_LAYOUT_ENV = "SPARK_GRAFT_PUBLISH_REBALANCE"
_SMALL_PUBLISH_BYTES = int(
    os.environ.get("SPARK_GRAFT_SMALL_PUBLISH_BYTES", str(64 * 1024 * 1024))
)


def _estimated_plan_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan size estimate (bytes), None when the
    JVM refuses (never fail a publish over a stats probe)."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return None


def sized_for_publish(df: DataFrame) -> DataFrame:
    """Apply the publish file-layout policy above to ``df``."""
    mode = os.environ.get(_PUBLISH_LAYOUT_ENV, "auto")
    if mode == "never":
        return df
    if mode != "always":
        est = _estimated_plan_bytes(df)
        if est is not None and est <= _SMALL_PUBLISH_BYTES:
            return df.coalesce(1)
    return df.hint("rebalance")
# 5+ digits: %05d zero-pads for readability but GROWS past 99999 —
# the reader regex must keep such versions visible (int sort, not
# lexicographic, so the extra digit is harmless).
_V_RE = re.compile(r"^v=(\d{5,})$")
# Staging dirs a crashed writer can orphan (both the current
# "_stage.tmp.<hex>" form and the legacy "v=NNNNN.tmp.<hex>" form).
_TMP_RE = re.compile(r"^(_stage|_LATEST|v=\d{5,})\.tmp\.[0-9a-f]+$")


def _exists(fs, p) -> bool:
    """Claim-check seam (tests stub this to force the lost-race
    recovery branch in write_version)."""
    return fs.exists(p)


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


def write_version(
    spark: SparkSession, df: DataFrame, path: str, max_attempts: int = 5
) -> int:
    """Publish ``df`` as the next immutable snapshot and flip the
    pointer to it.  Returns the new version number.

    Concurrency: version numbers are claimed OPTIMISTICALLY, not
    locked.  Hadoop ``rename`` into an existing directory NESTS the
    source inside it instead of failing, so a naive publish could
    silently pollute a concurrently-published snapshot.  Two guards
    prevent that: (1) the claim is checked (``exists``) before the
    rename and the writer re-scans on a hit; (2) after the rename the
    writer VERIFIES its staging directory was not nested inside a
    snapshot that appeared in the check→rename window — on a lost
    race it un-nests its own data and retries with the next number.
    The pointer flip itself is last-writer-wins (both snapshots exist;
    the loser's remains time-travel-readable).
    """
    base = path.rstrip("/")
    tmp = f"{base}/_stage.tmp.{uuid.uuid4().hex[:8]}"
    tmp_name = tmp.rsplit("/", 1)[1]
    # r14 (guide §6, output sizing): advisory-sized files instead of
    # one file per upstream shuffle partition (32 few-KB files per
    # tiny segment + 32 scan tasks per union read-back, profiled as
    # the dominant read cost of the versioned-store gates).  r15: the
    # layout comes from the size-conditional policy (sized_for_publish
    # above) — a tiny estimated segment coalesces to ONE file with no
    # extra exchange; big segments keep the REBALANCE hint.
    sized_for_publish(df).write.mode("overwrite").parquet(tmp)
    fs, jvm = _fs(spark, base)
    P = jvm.org.apache.hadoop.fs.Path
    for _ in range(max_attempts):
        n = (_version_dirs(spark, base) or [0])[-1] + 1
        final = f"{base}/v={n:05d}"
        if _exists(fs, P(final)):
            continue  # lost the scan race; the re-scan sees the winner
        if not fs.rename(P(tmp), P(final)):
            fs.delete(P(tmp), True)
            raise IOError(
                f"write_version: could not publish {tmp} -> {final}"
            )
        nested = P(f"{final}/{tmp_name}")
        if _exists(fs, nested):
            # A concurrent writer published v=n between our exists
            # check and our rename: our staging dir was nested inside
            # THEIR snapshot.  Un-nest our own data (never touch
            # theirs) and retry with a fresh number.
            if not fs.rename(nested, P(tmp)):
                fs.delete(nested, True)
                raise IOError(
                    f"write_version: lost publish race for v={n:05d} "
                    f"and could not recover staging dir {tmp_name}"
                )
            continue
        _write_text_atomic(spark, f"{base}/{LATEST}", str(n))
        return n
    fs.delete(P(tmp), True)
    raise IOError(
        f"write_version: lost the publish race {max_attempts} times "
        f"under {base}; staging dir deleted"
    )


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
    _write_text_atomic(spark, f"{base}/{LATEST}", str(version))
    return version


def vacuum_versions(
    spark: SparkSession,
    path: str,
    keep_last: int = 2,
    tmp_ttl_ms: int = 24 * 3600 * 1000,
) -> list[int]:
    """Retention reaper: delete version directories older than the
    newest ``keep_last``, but NEVER the pointed-at version (a rolled-
    back pointer pins its snapshot past any retention window).
    Returns the deleted version numbers.

    Also reaps staging directories (``_stage.tmp.*`` / legacy
    ``v=NNNNN.tmp.*``) orphaned by a writer that crashed between the
    parquet write and the publish rename — but only ones whose
    modification time is older than ``tmp_ttl_ms`` (default 24 h), so
    an in-flight writer's staging dir is never yanked from under it.
    Pass ``tmp_ttl_ms=0`` to reap all orphans immediately (safe only
    when no writer is running)."""
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
    now_ms = int(time.time() * 1000)
    root = P(base)
    if fs.exists(root):
        for st in fs.listStatus(root):
            if not st.isDirectory():
                continue
            name = st.getPath().getName()
            if (
                _TMP_RE.match(name)
                and now_ms - st.getModificationTime() >= tmp_ttl_ms
            ):
                fs.delete(st.getPath(), True)
    return victims
