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


def chunked_range_agg(
    df: DataFrame,
    series_cols: list[str],
    us_col: str,
    width_us: int,
    build_aggs,
    chunk_width_us: int | None = None,
) -> DataFrame:
    """Trailing RANGE-frame window aggregation whose parallelism
    scales with SERIES LENGTH, not series count — the scale-safe
    replacement for::

        Window.partitionBy(*series_cols).orderBy(us)
              .rangeBetween(-width_us, 0)

    which puts EVERY row of a series through one task: with a handful
    of long series (the telemetry shape — few event types, years of
    points) one task walks the whole corpus while the cluster idles
    (measured 713 s at sf10 for the z-score query this was built for,
    VERDICT r11/r12 item 1).

    Construction (the bounded-frame chunking trade, same family as
    evt_rolling_dau's explode-to-window-ends):

    1. chunk each series on the order axis into buckets of
       ``chunk_width_us`` (default = frame width, which maximizes
       parallelism at exactly 2× row duplication);
    2. duplicate every row into the NEXT chunk as a context copy
       (``chunk_width_us >= width_us`` guarantees a trailing frame
       spans at most the current and previous chunk, so current +
       previous-as-context is a superset of every frame in the
       chunk);
    3. run the IDENTICAL RANGE frame partitioned by
       (series, chunk) — the inclusive range bound itself excludes
       context rows older than the frame, so frame membership is
       bit-for-bit the multiset the global window would see;
    4. keep only native rows.

    Exactness: same frame multiset + order-free aggregates (counts,
    decimal sums) ⇒ identical results to the single-partition window
    (pinned by tests/test_operators.py's equivalence property test,
    boundary ties included).  ``build_aggs`` receives the WindowSpec
    and returns {out_col: Column}; use decimal/integer aggregates —
    float sums would be partition-order-sensitive in EITHER plan.

    Cost model: one shuffle of 2× the rows on (series, chunk) — hash
    keys number #series × (span/chunk_width), so a 100 TB corpus of 5
    series × 3 years at 24 h frames fans out to ~5,500 tasks instead
    of 5.  Per-task state is ≤ 2 chunk-widths of ONE series (WindowExec
    spills past memory).  Raise ``chunk_width_us`` (k× the frame) to
    trade duplication 1+1/k for proportionally fewer tasks.

    NOTE: within each task Spark still re-adds the whole frame per
    row (sliding frames have no retraction), so per-row cost is
    O(rows-per-frame).  For SUM/COUNT-shaped aggregates use
    ``chunked_range_sums`` below — prefix-subtraction makes those
    O(1) per row (713 s → 365 s here vs → 34 s there on the sf10
    z-score, BASELINE.md round-13).  This general form remains the
    path for non-subtractable frame aggregates (max/min/collect).
    """
    frame = int(width_us)
    chunk_w = int(chunk_width_us or frame)
    if frame <= 0 or chunk_w < frame:
        raise ValueError(
            f"need chunk_width_us >= width_us > 0 (got {chunk_w} < {frame}):"
            " a narrower chunk makes frames span >2 chunks and the"
            " context copy no longer covers them"
        )
    # exact floor division via pmod (us - pmod is divisible; `div`
    # alone truncates toward zero and misplaces pre-epoch rows)
    chunk = F.expr(f"(({us_col}) - pmod({us_col}, {chunk_w})) div {chunk_w}")
    base = df.withColumn("_crw_chunk", chunk)
    native = base.withColumn("_crw_ctx", F.lit(False))
    context = base.withColumn(
        "_crw_chunk", F.col("_crw_chunk") + F.lit(1)
    ).withColumn("_crw_ctx", F.lit(True))
    both = native.unionByName(context)
    win = (
        W.partitionBy(*series_cols, "_crw_chunk")
        .orderBy(us_col)
        .rangeBetween(-frame, 0)
    )
    out = both.withColumns(dict(build_aggs(win)))
    return out.where(~F.col("_crw_ctx")).drop("_crw_chunk", "_crw_ctx")


def chunked_range_sums(
    df: DataFrame,
    series_cols: list[str],
    us_col: str,
    width_us: int,
    sum_exprs: dict[str, Column],
    key_cols: list[str],
    chunk_width_us: int | None = None,
) -> DataFrame:
    """Trailing RANGE-frame SUM/COUNT aggregation in O(n) per row —
    the subtractable-aggregate fast path of ``chunked_range_agg``.

    Spark's WindowExec evaluates a bounded-preceding sliding frame by
    REBUILDING the aggregate buffer from scratch every time the lower
    bound moves (no retraction support), so a RANGE frame costs
    O(rows × rows-per-frame): chunking alone parallelized the r11
    z-score plan (713 s → 365 s at sf10) but each task still re-added
    ~12k-row frames per row while DuckDB's segment tree took 3 s.
    Sums and counts have an inverse, so the frame is two PREFIX
    points instead::

        frame(t) = cum(us <= t) - cum(us <= t - W - 1)   (integer us)

    and cumulative frames are the add-only
    UnboundedPrecedingWindowFunctionFrame — O(1) amortized per row.

    Construction: chunk + previous-chunk context exactly as
    chunked_range_agg (so every frame's rows live in the row's own
    (series, chunk) partition), plus one PHANTOM probe row per native
    row at ``us - W - 1`` carrying only the row key.  One cumulative
    window over (series, chunk) computes prefix sums in which
    phantoms contribute nothing; each native row then meets its
    phantom through a slim equi-join on ``key_cols`` and the frame
    value is the (exact decimal / integer) difference.  A phantom
    landing before its partition's first row yields an empty prefix —
    NULL cum, coalesced to 0, which is precisely the frame's content
    from older chunks (none, by the context invariant).

    ``sum_exprs``: out-col → per-row expression to frame-sum (use
    decimal/integer types — exactness of the subtraction is what
    makes this identical to the direct frame).  ``key_cols`` must
    uniquely key rows.  Cost: one shuffle of ~3n rows on (series,
    chunk), one O(n) window, one slim self-join on the key.
    """
    frame = int(width_us)
    chunk_w = int(chunk_width_us or frame)
    if frame <= 0 or chunk_w < frame:
        raise ValueError(
            f"need chunk_width_us >= width_us > 0 (got {chunk_w} < {frame})"
        )
    chunk = F.expr(f"(({us_col}) - pmod({us_col}, {chunk_w})) div {chunk_w}")
    base = df.withColumn("_crs_chunk", chunk)
    native = base.withColumn("_crs_kind", F.lit(0))
    context = base.withColumn(
        "_crs_chunk", F.col("_crs_chunk") + F.lit(1)
    ).withColumn("_crs_kind", F.lit(1))
    phantom = native.withColumn("_crs_kind", F.lit(2)).withColumn(
        us_col, F.col(us_col) - F.lit(frame + 1)
    )
    both = native.unionByName(context).unionByName(phantom)
    wcum = (
        W.partitionBy(*series_cols, "_crs_chunk")
        .orderBy(us_col)
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    cum_cols = {
        f"_crs_cum_{name}": F.sum(
            F.when(F.col("_crs_kind") <= 1, expr)
        ).over(wcum)
        for name, expr in sum_exprs.items()
    }
    scanned = both.withColumns(cum_cols)
    out_native = scanned.where(F.col("_crs_kind") == 0).drop(
        "_crs_chunk", "_crs_kind"
    )
    starts = scanned.where(F.col("_crs_kind") == 2).select(
        *key_cols,
        *[
            F.col(f"_crs_cum_{name}").alias(f"_crs_start_{name}")
            for name in sum_exprs
        ],
    )
    joined = out_native.join(starts, key_cols)
    for name in sum_exprs:
        cum, start = F.col(f"_crs_cum_{name}"), F.col(f"_crs_start_{name}")
        joined = joined.withColumn(
            name, F.coalesce(cum, F.lit(0)) - F.coalesce(start, F.lit(0))
        ).drop(f"_crs_cum_{name}", f"_crs_start_{name}")
    return joined


def chunked_range_assoc(
    df: DataFrame,
    series_cols: list[str],
    us_col: str,
    width_us: int,
    aggs: dict,
    key_cols: list[str],
) -> DataFrame:
    """Trailing RANGE-frame aggregation for ANY associative aggregate
    in O(1) amortized per row — the two-stacks / SWAG decomposition
    on top of the chunking family above.

    With chunk width = frame width W, every frame [t−W, t] for a row
    in chunk c splits exactly into a SUFFIX of chunk c−1 (rows with
    us ≥ t−W, since t−W always lands in chunk c−1) and a PREFIX of
    chunk c (rows with us ≤ t — all of chunk c's earlier rows are
    inside the frame because chunk start cW ≥ t−W).  Both legs are
    cumulative UNBOUNDED-PRECEDING windows — Spark's add-only
    incremental frame, no per-row rebuild (the ``chunked_range_agg``
    caveat) and no inverse operation (the ``chunked_range_sums``
    requirement): prefix = ascending cumulative aggregate among the
    chunk's own rows; suffix = DESCENDING cumulative aggregate read
    at t−W via one PHANTOM probe row per native row (null-valued, so
    it contributes the identity), joined back on ``key_cols``.

    ``aggs``: out-col → (row_expr, window_fn, combine_fn) where
    ``window_fn`` is the cumulative aggregate (F.max / F.min / F.sum
    / F.count) and ``combine_fn(prefix, suffix)`` merges the two
    legs treating NULL as the identity (use F.greatest / F.least —
    they skip nulls — or coalesce-to-0 addition for sums).  Row
    duplication is 1× (phantoms only — no context copies); one
    shuffle on (series, chunk), two O(n) windows, one slim key join.
    ``key_cols`` must uniquely key rows.

    Exactness: the two legs partition the frame multiset exactly
    (suffix covers [t−W, cW), prefix covers [cW, t], ties at both
    bounds included by the RANGE semantics), so any associative
    combine reproduces the single-partition window bit-for-bit —
    property-pinned in tests/test_temporal.py."""
    frame = int(width_us)
    if frame <= 0:
        raise ValueError("width_us must be > 0")
    chunk_of = lambda c: F.expr(  # noqa: E731
        f"(({c}) - pmod({c}, {frame})) div {frame}"
    )
    vals = {name: spec[0] for name, spec in aggs.items()}

    # ASC leg: natives only, cumulative within (series, chunk)
    asc_base = df.withColumns(
        {f"_cra_v_{n}": e for n, e in vals.items()}
    ).withColumn("_cra_chunk", chunk_of(us_col))
    asc_w = (
        W.partitionBy(*series_cols, "_cra_chunk")
        .orderBy(us_col)
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    asc = asc_base.withColumns(
        {
            f"_cra_a_{n}": spec[1](F.col(f"_cra_v_{n}")).over(asc_w)
            for n, spec in aggs.items()
        }
    ).drop("_cra_chunk")

    # DESC leg: natives + one phantom per native at t−W (null values →
    # identity); cumulative from each chunk's END, read at the phantom
    slim_cols = [*series_cols, *key_cols, us_col] + [
        f"_cra_v_{n}" for n in vals
    ]
    desc_nat = asc_base.select(*slim_cols).withColumn(
        "_cra_ph", F.lit(False)
    )
    desc_ph = (
        asc_base.select(*slim_cols)
        .withColumn(us_col, F.col(us_col) - F.lit(frame))
        .withColumns(
            {
                f"_cra_v_{n}": F.when(F.lit(False), F.col(f"_cra_v_{n}"))
                for n in vals
            }
        )
        .withColumn("_cra_ph", F.lit(True))
    )
    both = desc_nat.unionByName(desc_ph).withColumn(
        "_cra_chunk", chunk_of(us_col)
    )
    desc_w = (
        W.partitionBy(*series_cols, "_cra_chunk")
        .orderBy(F.col(us_col).desc())
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    starts = (
        both.withColumns(
            {
                f"_cra_d_{n}": spec[1](F.col(f"_cra_v_{n}")).over(desc_w)
                for n, spec in aggs.items()
            }
        )
        .where(F.col("_cra_ph"))
        .select(
            *key_cols, *[F.col(f"_cra_d_{n}") for n in vals]
        )
    )
    out = asc.join(starts, key_cols)
    for n, spec in aggs.items():
        out = out.withColumn(
            n, spec[2](F.col(f"_cra_a_{n}"), F.col(f"_cra_d_{n}"))
        ).drop(f"_cra_a_{n}", f"_cra_d_{n}", f"_cra_v_{n}")
    return out
