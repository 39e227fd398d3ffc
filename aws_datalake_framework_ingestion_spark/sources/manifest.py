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

The manifest is advisory metadata: a stale/absent manifest degrades
to reading everything, never to wrong results (the predicate is still
applied by Spark after the file-list cut).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_file_stats.json"


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
    with open(os.path.join(path, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh, default=str)
    return len(rows)


def _plain(v):
    """JSON-safe scalar; timestamps/decimals go through str (the
    pruning comparison re-parses consistently because both bounds and
    probes round-trip the same way)."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    return str(v)


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
    superset cut, so correctness never depends on the manifest.
    Degrades to the full dataset when the manifest is absent or
    doesn't cover ``col``."""
    mpath = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(mpath):
        return spark.read.parquet(path)
    with open(mpath) as fh:
        manifest = json.load(fh)
    if col not in manifest.get("stat_cols", []):
        return spark.read.parquet(path)
    keep = []
    for f, stats in manifest["files"].items():
        mn, mx = stats[col]
        if mn is None or mx is None:
            keep.append(f)  # all-null or unknown: cannot prune safely
            continue
        probe_lo = _coerce(lo, mn)
        probe_hi = _coerce(hi, mn)
        if probe_hi is not None and _lt(probe_hi, mn):
            continue
        if probe_lo is not None and _lt(mx, probe_lo):
            continue
        keep.append(f)
    if not keep:
        # preserve schema with an empty frame
        return spark.read.parquet(path).limit(0)
    return spark.read.parquet(*keep)


def pruned_files(path: str, col: str, lo=None, hi=None) -> list[str]:
    """The file list read_pruned would keep — exposed for tests and
    for callers that want the list (e.g. to feed a streaming source)."""
    mpath = os.path.join(path, MANIFEST_NAME)
    with open(mpath) as fh:
        manifest = json.load(fh)
    keep = []
    for f, stats in manifest["files"].items():
        mn, mx = stats[col]
        if mn is None or mx is None:
            keep.append(f)
            continue
        probe_lo = _coerce(lo, mn)
        probe_hi = _coerce(hi, mn)
        if probe_hi is not None and _lt(probe_hi, mn):
            continue
        if probe_lo is not None and _lt(mx, probe_lo):
            continue
        keep.append(f)
    return keep


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
