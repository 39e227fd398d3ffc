"""Streaming-style frequency sketches as batch relational plans.

Count-min sketch: d hash rows × w buckets of counters; the estimate
for a key is min_i counter[i][h_i(key)] — an overestimate whose error
is bounded by ε·N with w = ⌈e/ε⌉, δ = e^-d.  The sketch itself is a
TINY relation (d·w rows) built with one keyed aggregation over the
stream — the classic shape for heavy-hitter detection where the key
domain is too large to count exactly.

Determinism: bucket hashes use the engine-portable md5 scheme
(conv(substr(md5, 1, 14), 16, 10) — 56 bits, no ANSI overflow; the
same expression is reproducible in DuckDB as CAST('0x' || substr(md5,
1, 14) AS BIGINT)), so sketch contents are bit-identical across
engines and the whole operator is oracle-checkable — unusual for a
sketch, and exactly why this hash was chosen over xxhash64 (which
DuckDB lacks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, row: int, width: int) -> Column:
    """Portable md5 bucket hash: row-salted, 56-bit, mod width."""
    h = F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(row), key)), 1, 14), 16, 10)
    return F.pmod(h.cast("long"), F.lit(width)).cast("int")


def countmin_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the (row, bucket, cnt) sketch relation — d·w rows max.

    NULL keys are excluded: concat_ws would silently hash a NULL key as
    just the row salt, collapsing all NULLs into one phantom key and
    diverging from the DuckDB '||' expression (which propagates NULL).
    Filtering keeps both engines agreeing for nullable key columns.

    ``weight_col`` (r14, guide §2.3 aggregate-before-shuffle): build
    the sketch from a PRE-AGGREGATED (key, weight) relation instead of
    the raw stream — ``cnt`` per (row, bucket) becomes sum(weight),
    which is bit-identical to counting the raw rows (the bucket
    depends only on the key, so Σ_events 1 = Σ_keys count(key)).  A
    caller that already aggregated per-key counts hashes each DISTINCT
    key d times instead of each raw row, and the stream is scanned
    once instead of twice.

    Weight CONTRACT (ADVICE r14): the count-equivalence above only
    holds for NON-NULL INTEGER weights.  A NULL weight would be
    silently skipped by sum() where a raw-row count would have counted
    the row, and a fractional weight would be truncated after summing
    — both silent undercounts.  Enforced: non-integral weight types
    raise at plan time; a NULL weight raises at execution
    (raise_error), never skips.
    """
    key = F.col(key_col).cast("string")
    df = df.where(key.isNotNull())
    if weight_col is not None:
        wt = df.schema[weight_col].dataType.simpleString()
        if wt not in ("tinyint", "smallint", "int", "bigint"):
            raise TypeError(
                f"countmin_sketch: weight_col {weight_col!r} has type "
                f"{wt}; the sketch's count-equivalence contract needs "
                "integer weights (fractional weights would truncate "
                "after summing — pre-round them deliberately instead)"
            )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"), _bucket(key, i, width).alias("bucket")
                )
                for i in range(depth)
            ]
        )
    ).alias("rb")
    if weight_col is None:
        w, cols = F.lit(1), [rows]
    else:
        # loud-fail on NULL weights instead of sum()'s silent skip
        guarded = F.when(
            F.col(weight_col).isNull(),
            F.raise_error(
                F.lit(
                    "countmin_sketch: NULL weight in "
                    f"{weight_col!r} — a raw-row count would have "
                    "counted this row; coalesce weights explicitly"
                )
            ).cast(df.schema[weight_col].dataType),
        ).otherwise(F.col(weight_col))
        w, cols = F.col("_w"), [rows, guarded.alias("_w")]
    return (
        df.select(*cols)
        .select("rb.row", "rb.bucket", w.alias("_w"))
        .groupBy("row", "bucket")
        .agg(F.sum("_w").cast("long").alias("cnt"))
    )


def countmin_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-query the sketch for each distinct key in ``keys``:
    (key_col, est) with est = min over the d salted-hash buckets.

    The sketch side is d·w rows — broadcast — so estimation is a
    map-side join however many keys are probed.

    Probes whose buckets are absent from the sketch count as 0 (LEFT
    join + coalesce): a key never seen by the sketched stream estimates
    est=0 instead of being dropped or inflated by its nonempty buckets.
    NULL probe keys are excluded (same portability rule as the sketch).
    """
    key = F.col(key_col).cast("string")
    keys = keys.where(key.isNotNull())
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket(key, i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key_col, "rb.row", "rb.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
