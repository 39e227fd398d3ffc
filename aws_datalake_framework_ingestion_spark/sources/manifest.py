"""File-statistics manifest + pruning reader — the table-format
mechanism (Delta/Iceberg data skipping) on plain parquet.

At 100 TB the fastest scan is the one that never opens the file:
formats keep per-file column min/max in a manifest and planners prune
files whose range can't satisfy the predicate.  Parquet footers carry
the same stats, but Spark still LISTS and OPENS every footer; a
manifest turns that into one tiny metadata read.  This module writes
the manifest as a side JSON at write time and prunes the file LIST
before handing Spark the survivors — composing with row-group
pruning, pushdown and column pruning inside each surviving file.

Pairs with sinks.write_zordered: z-ordering makes per-file ranges
NARROW on the clustered columns, which is what makes min/max pruning
bite (random layout → every file spans the whole domain → no skip).

The manifest is advisory metadata, and the reader RECONCILES it
against a live listing so staleness degrades to reading more, never
to wrong results: files present on disk but missing from the manifest
(appended after write_manifest) are read unconditionally, and
manifest entries whose file no longer exists (compacted/renamed
since) are dropped instead of being handed to Spark as dead paths.
"""

from __future__ import annotations

import json
import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_file_stats.json"


def _norm(path: str) -> tuple[str, str, str]:
    """Scheme-insensitive file identity: input_file_name() yields
    file:///x while Hadoop Path.toString yields file:/x — urlparse
    maps both to ('file', '', '/x')."""
    u = urlparse(path)
    return (u.scheme or "file", u.netloc, u.path)


def _is_local(path: str) -> bool:
    return urlparse(path).scheme in ("", "file")


def _live_parquet_files(
    spark: SparkSession, path: str
) -> dict[tuple[str, str, str], str]:
    """Normalized-identity → listable path for the dataset's current
    parquet files.  RECURSIVE: write_manifest keys files via
    input_file_name(), which includes hive-partition subdirectories
    (sinks.write_parquet supports partitionBy) — a flat listing would
    see zero parquet files for a partitioned dataset, keep nothing,
    and read_pruned would silently return limit(0).

    Hybrid listing: local paths walk the OS directly (no py4j
    round-trip per file — the pruning path must stay fast at 10⁴+
    files, see the posture test); remote schemes (hdfs://, s3a://) go
    through the recursive Hadoop FS listing."""
    out = {}
    if _is_local(path):
        lpath = urlparse(path).path if "://" in path or path.startswith("file:") else path
        for root, _dirs, names in os.walk(lpath):
            for name in names:
                if name.endswith(".parquet"):
                    full = os.path.join(root, name)
                    out[_norm(full)] = full
        return out
    from .files import _fs

    fs, jvm = _fs(spark, path)
    it = fs.listFiles(jvm.org.apache.hadoop.fs.Path(path), True)
    while it.hasNext():
        p = it.next().getPath().toString()
        if p.endswith(".parquet"):
            out[_norm(p)] = p
    return out


def write_manifest(spark: SparkSession, path: str, stat_cols: list[str]) -> int:
    """Compute per-file min/max for ``stat_cols`` over an existing
    parquet dataset and write the manifest next to it.  One
    distributed pass (input_file_name + groupBy file); returns the
    file count."""
    df = spark.read.parquet(path)
    aggs = []
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    rows = (
        df.withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(*aggs)
        .collect()
    )
    manifest = {
        "stat_cols": stat_cols,
        "files": {
            r["_file"]: {
                c: [_plain(r[f"min_{c}"]), _plain(r[f"max_{c}"])]
                for c in stat_cols
            }
            for r in rows
        },
    }
    _write_text(
        spark,
        f"{path.rstrip('/')}/{MANIFEST_NAME}",
        json.dumps(manifest, default=str),
    )
    return len(rows)


def update_manifest(spark: SparkSession, path: str, stat_cols: list[str]) -> int:
    """Incremental manifest maintenance: compute min/max stats ONLY
    for live files the manifest doesn't cover yet, drop entries for
    files that no longer exist, and rewrite the manifest.  Returns the
    number of NEW entries computed.

    This is the append-cadence path at 100 TB: streaming ingestion
    adds a few files per trigger, and recomputing stats for the whole
    dataset (write_manifest) would re-scan petabytes to index
    megabytes.  Only the uncovered files are read — one distributed
    pass over just those paths.  No manifest yet (or changed
    stat_cols) falls back to the full write_manifest."""
    text = _read_text(spark, f"{path.rstrip('/')}/{MANIFEST_NAME}")
    if text is None:
        return write_manifest(spark, path, stat_cols)
    manifest = json.loads(text)
    if sorted(manifest.get("stat_cols", [])) != sorted(stat_cols):
        return write_manifest(spark, path, stat_cols)

    live = _live_parquet_files(spark, path)
    by_norm = {_norm(f): (f, stats) for f, stats in manifest["files"].items()}
    missing = [p for norm, p in sorted(live.items()) if norm not in by_norm]
    # drop dead entries (compacted/renamed since last update)
    kept = {
        f: stats for norm, (f, stats) in by_norm.items() if norm in live
    }
    if missing:
        # basePath keeps hive-partition columns statable when reading
        # leaf files directly — without it a manifest whose stat_cols
        # include a partition column (fine in write_manifest, which
        # reads the root) raises AnalysisException on the incremental
        # path (ADVICE r7)
        df = spark.read.option("basePath", path).parquet(*missing)
        aggs = []
        for c in stat_cols:
            aggs.append(F.min(c).alias(f"min_{c}"))
            aggs.append(F.max(c).alias(f"max_{c}"))
        rows = (
            df.withColumn("_file", F.input_file_name())
            .groupBy("_file")
            .agg(*aggs)
            .collect()
        )
        for r in rows:
            kept[r["_file"]] = {
                c: [_plain(r[f"min_{c}"]), _plain(r[f"max_{c}"])]
                for c in stat_cols
            }
    _write_text(
        spark,
        f"{path.rstrip('/')}/{MANIFEST_NAME}",
        json.dumps({"stat_cols": stat_cols, "files": kept}, default=str),
    )
    return len(missing)


def _write_text(spark: SparkSession, path: str, text: str) -> None:
    """Tiny-metadata write, scheme-agnostic (local open for file
    paths; Hadoop FS stream for remote).  Truncates IN PLACE — a
    reader racing the write can observe empty/torn content, so this
    is only safe for markers whose torn read fails loudly (or where
    no concurrent reader exists).  Commit pointers that readers
    resolve while writers run must use ``_write_text_atomic``."""
    if _is_local(path):
        with open(path, "w") as fh:
            fh.write(text)
        return
    from .files import _fs

    fs, jvm = _fs(spark, path)
    stream = fs.create(jvm.org.apache.hadoop.fs.Path(path), True)
    try:
        stream.write(bytearray(text, "utf-8"))
    finally:
        stream.close()


def _write_text_atomic(spark: SparkSession, path: str, text: str) -> None:
    """All-or-nothing marker write: stage to a sibling temp file and
    rename over the target, so a concurrent reader sees either the
    OLD complete content or the NEW complete content — never empty or
    torn.  Local paths use ``os.replace`` (atomic on POSIX); remote
    paths go through ``FileContext.rename(..., Rename.OVERWRITE)``,
    which is the atomic-overwrite primitive on HDFS (the plain
    ``FileSystem.rename`` refuses existing targets).  On stores with
    no atomic rename (raw S3) this degrades to the same
    last-writer-wins PUT the single-object write already was."""
    import uuid as _uuid

    tmp = f"{path}.tmp.{_uuid.uuid4().hex[:8]}"
    if _is_local(path):
        lpath = urlparse(path).path if path.startswith("file:") else path
        ltmp = urlparse(tmp).path if tmp.startswith("file:") else tmp
        with open(ltmp, "w") as fh:
            fh.write(text)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(ltmp, lpath)
        return
    from .files import _fs

    fs, jvm = _fs(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    stream = fs.create(P(tmp), True)
    try:
        stream.write(bytearray(text, "utf-8"))
    finally:
        stream.close()
    try:
        gw = spark.sparkContext._gateway
        ctx = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            P(path).toUri(), fs.getConf()
        )
        ren = jvm.org.apache.hadoop.fs.Options.Rename
        opts = gw.new_array(ren, 1)
        opts[0] = ren.OVERWRITE
        ctx.rename(P(tmp), P(path), opts)
    except Exception:
        fs.delete(P(tmp), True)
        raise


def _read_text(spark: SparkSession, path: str) -> str | None:
    """Tiny-metadata read; None when absent."""
    if _is_local(path):
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return fh.read()
    from .files import _fs

    fs, jvm = _fs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def _plain(v):
    """JSON-safe scalar; timestamps/decimals go through str (the
    pruning comparison re-parses consistently because both bounds and
    probes round-trip the same way)."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    return str(v)


def _range_hits(stats, col, lo, hi) -> bool:
    mn, mx = stats[col]
    if mn is None or mx is None:
        return True  # all-null or unknown: cannot prune safely
    probe_lo = _coerce(lo, mn)
    probe_hi = _coerce(hi, mn)
    if probe_hi is not None and _lt(probe_hi, mn):
        return False
    if probe_lo is not None and _lt(mx, probe_lo):
        return False
    return True


def _reconciled_keep(
    spark: SparkSession, path: str, manifest: dict, col: str, lo, hi
) -> list[str]:
    """Prune against the manifest, reconciled with the LIVE listing:

    * a live file with no manifest entry (appended since
      write_manifest) is kept unconditionally — stale metadata must
      widen the read, never lose rows;
    * a manifest entry whose file is gone (compacted/renamed since)
      is dropped — handing Spark a dead path would raise, not degrade.
    """
    live = _live_parquet_files(spark, path)
    by_norm = {_norm(f): stats for f, stats in manifest["files"].items()}
    keep = []
    for norm, listable in sorted(live.items()):
        stats = by_norm.get(norm)
        if stats is None or _range_hits(stats, col, lo, hi):
            keep.append(listable)
    return keep


def read_pruned(
    spark: SparkSession,
    path: str,
    col: str,
    lo=None,
    hi=None,
) -> DataFrame:
    """Read only the files whose [min, max] range for ``col``
    intersects [lo, hi] (either bound may be None = unbounded).  The
    caller still applies the row-level predicate — pruning is a
    superset cut reconciled against the live listing (see
    _reconciled_keep), so correctness never depends on the manifest.
    Degrades to the full dataset when the manifest is absent or
    doesn't cover ``col``."""
    text = _read_text(spark, f"{path.rstrip('/')}/{MANIFEST_NAME}")
    if text is None:
        return spark.read.parquet(path)
    manifest = json.loads(text)
    if col not in manifest.get("stat_cols", []):
        return spark.read.parquet(path)
    keep = _reconciled_keep(spark, path, manifest, col, lo, hi)
    if not keep:
        # preserve schema with an empty frame
        return spark.read.parquet(path).limit(0)
    # basePath keeps hive-partition columns inferable when handing
    # Spark leaf files from partitioned subdirectories.
    return spark.read.option("basePath", path).parquet(*keep)


def pruned_files(
    spark: SparkSession, path: str, col: str, lo=None, hi=None
) -> list[str]:
    """The file list read_pruned would keep — exposed for tests and
    for callers that want the list (e.g. to feed a streaming source)."""
    manifest = json.loads(
        _read_text(spark, f"{path.rstrip('/')}/{MANIFEST_NAME}")
    )
    return _reconciled_keep(spark, path, manifest, col, lo, hi)


def _coerce(probe, bound_sample):
    """Align probe type with the manifest's JSON round-trip (e.g.
    timestamps become strings — compare strings against strings;
    ISO-8601 string order equals timestamp order)."""
    if probe is None:
        return None
    if isinstance(bound_sample, str) and not isinstance(probe, str):
        return str(probe)
    return probe


def _lt(a, b) -> bool:
    return a < b
