"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Neither exists in the reference (single-table extraction only,
ingestion/utils/dataIngestionUtils.py:131-177) nor as a PySpark
primitive; both are mandated capability families for a training-data
pipeline (sessionized attribution, time-window correlation).

Scale design:

* as-of join — the union+window formulation: tag sides, union, one
  window pass per ``by`` partition carrying the last-seen right row
  forward.  Exactly ONE shuffle (hash by key), no range explosion, no
  broadcast requirement on either side — the canonical 100 TB-safe
  shape.  (A sort-merge inequality join degenerates to per-key scans;
  a naive theta-join is a nested-loop cross product.)
* range join — equi-join on (key, time-bucket) after exploding each
  left row to the buckets its window spans, then the exact range
  predicate on the survivors.  Candidate count is |matches| + O(|left|
  × spanned_buckets); Spark plans it as a plain hash join, never a
  nested loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: list[str],
    value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Backward-inclusive as-of join.

    For every left row, attach ``value_cols`` (and ``{prefix}ts``)
    from the latest right row with ``right.ts <= left.ts`` and equal
    ``by`` keys; nulls when no such row exists.  Right should be
    unique per (by, ts) for deterministic output (pre-aggregate it).

    Union both sides with a side tag, then one window ordered by
    (ts, side) — right rows sort before left rows at equal ts, making
    the match inclusive — and carry the last non-null right payload
    forward with ``last(..., ignorenulls=True)``.
    """
    lcols = [c for c in left.columns if c not in by and c != ts_col]
    l = left.select(
        *by,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
    )
    r = right.select(
        *by,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    w = (
        W.partitionBy(*by)
        .orderBy(F.col(ts_col), F.col("_side"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    side_ts = F.when(F.col("_side") == 0, F.col(ts_col))
    matched = (
        l.unionByName(r)
        .withColumn(f"{prefix}ts", F.last(side_ts, ignorenulls=True).over(w))
        .withColumns(
            {
                f"{prefix}{c}": F.last(
                    F.when(F.col("_side") == 0, F.col(f"_rv_{c}")), ignorenulls=True
                ).over(w)
                for c in value_cols
            }
        )
    )
    return matched.filter(F.col("_side") == 1).select(
        *by,
        ts_col,
        *lcols,
        f"{prefix}ts",
        *[f"{prefix}{c}" for c in value_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 3600,
    how: str = "inner",
    left_id: str | None = None,
) -> DataFrame:
    """Join right rows with ``l.ts < r.ts <= l.ts + window_seconds``
    and equal ``key`` — as an equi-join, never a nested loop.

    Left rows explode to the two epoch buckets of width
    ``window_seconds`` their window can touch; right rows carry their
    own bucket; the hash join on (key, bucket) yields candidates and
    the exact range predicate filters them.  Each true pair matches
    exactly once (a right row lives in one bucket; the left row's
    exploded buckets are distinct), so no dedup is needed.

    ``how='left'`` (requires ``left_id``, a unique left key) restores
    zero-match left rows with nulls via an anti-join on the matched
    ids — correct left semantics without the spurious null rows a
    naive outer bucket-join would emit.
    """
    rcols = [c for c in right.columns if c != key]

    # seconds since a fixed NTZ epoch via calendar arithmetic —
    # timezone-free, unlike unix_timestamp(ntz) which shifts with the
    # session zone (and non-uniformly across DST boundaries)
    def _secs(col: str) -> Column:
        return F.expr(
            f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
        )

    lb = F.floor(_secs(left_ts) / window_seconds)
    l = left.withColumn("_b", F.explode(F.array(lb, lb + 1)))
    r = right.select(
        F.col(key).alias("_rk"),
        F.floor(_secs(right_ts) / window_seconds).alias("_rb"),
        *[F.col(c).alias(f"r_{c}") for c in rcols],
    )
    cond = (
        (F.col(key) == F.col("_rk"))
        & (F.col("_b") == F.col("_rb"))
        & (F.col(f"r_{right_ts}") > F.col(left_ts))
        & (
            F.col(f"r_{right_ts}")
            <= F.col(left_ts) + F.make_dt_interval(secs=F.lit(window_seconds))
        )
    )
    pairs = l.join(r, cond, "inner").drop("_b", "_rk", "_rb")
    if how == "inner":
        return pairs
    if how != "left":
        raise ValueError(f"unsupported how: {how!r}")
    if left_id is None:
        raise ValueError("how='left' requires left_id")
    unmatched = left.join(
        pairs.select(left_id).distinct(), left_id, "left_anti"
    ).select(
        "*",
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"r_{c}")
            for c in rcols
        ],
    )
    return pairs.unionByName(unmatched)
