"""Window-function surface (SURVEY.md §2.9 — absent from the reference,
green-field Spark built-ins).

Every window here partitions on a real key so the exchange is a plain
hash shuffle; no global (unpartitioned) windows — those serialize onto
one task and die at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ._util import T
from .registry import query


@query(
    "win_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window",),
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the canonical top-k-per-group
    (row_number + filter).  Unique tiebreak key ⇒ deterministic."""
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        T(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("int").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_total
    FROM orders
    """,
    tags=("window",),
)
def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per customer.  Decimal-cast accumulation: engines
    associate windowed sums differently (DuckDB uses a segment tree),
    so double accumulation is not bit-stable — exact decimal is."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return T(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@query(
    "win_lag_gap",
    oracle="""
    SELECT event_id, user_id,
           date_diff('microsecond',
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                     ts) AS gap_us
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
    """,
    tags=("window", "stream"),
)
def win_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap per user via lag().  µs difference (exact
    integer) rather than seconds — second-level date_diff counts
    boundary crossings in DuckDB but elapsed units in Spark."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ev = T(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        F.expr("timestampdiff(MICROSECOND, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)").alias("gap_us"),
    )


@query(
    "win_rank_dense",
    oracle="""
    SELECT p_partkey, p_brand,
           CAST(rank()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS INT) AS price_rank,
           CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS INT) AS price_dense_rank
    FROM part
    """,
    tags=("window",),
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank with ties (same price ⇒ same rank on both
    engines — tie handling is deterministic by definition)."""
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return T(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.rank().over(w).cast("int").alias("price_rank"),
        F.dense_rank().over(w).cast("int").alias("price_dense_rank"),
    )


@query(
    "win_ntile_cume",
    oracle="""
    SELECT s_suppkey,
           CAST(ntile(4) OVER (ORDER BY s_acctbal, s_suppkey) AS INT) AS quartile,
           percent_rank() OVER (ORDER BY s_acctbal, s_suppkey) AS pct_rank,
           cume_dist()    OVER (ORDER BY s_acctbal, s_suppkey) AS cume
    FROM supplier
    """,
    tags=("window",),
)
def win_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution functions (ntile / percent_rank / cume_dist) over
    a GLOBAL order, computed rank-first so no single-partition window
    ever exists: operators/ranking.global_rank_with_count gives the
    distributed global rank rk and the total N, and because the order
    (s_acctbal, s_suppkey) is UNIQUE the SQL definitions collapse to
    closed forms — ntile via the exact split arithmetic,
    percent_rank = (rk-1)/(N-1), cume_dist = rk/N.  Bit-identical to
    the window spelling (same integer ratios → same doubles) at any
    partition count."""
    from ..operators.ranking import global_rank_with_count, ntile_from_rank

    sup = T(spark, sf_dir, "supplier")
    ranked, n = global_rank_with_count(
        sup, [F.col("s_acctbal"), F.col("s_suppkey")], rank_col="_rk"
    )
    return ranked.select(
        "s_suppkey",
        ntile_from_rank(n, 4, "_rk").alias("quartile"),
        ((F.col("_rk") - 1).cast("double") / F.lit(float(n - 1))).alias(
            "pct_rank"
        ),
        (F.col("_rk").cast("double") / F.lit(float(n))).alias("cume"),
    )


@query(
    "win_first_last",
    oracle="""
    SELECT DISTINCT c_nationkey,
           first_value(c_name) OVER (PARTITION BY c_nationkey
                                     ORDER BY c_acctbal DESC, c_custkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest,
           last_value(c_name)  OVER (PARTITION BY c_nationkey
                                     ORDER BY c_acctbal DESC, c_custkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest
    FROM customer
    """,
    tags=("window",),
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last_value with an explicit full frame (default frame
    would make last_value degenerate)."""
    w = (
        W.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        T(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            F.first("c_name").over(w).alias("richest"),
            F.last("c_name").over(w).alias("poorest"),
        )
        .distinct()
    )


@query(
    "win_range_frame_7d",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
           ) AS VARCHAR) AS DOUBLE) AS spend_7d
    FROM orders
    """,
    tags=("window", "range-frame"),
)
def win_range_frame_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (vs the ROWS frames elsewhere): per customer,
    rolling 7-day spend — the frame is defined by the ORDER-BY VALUE
    (timestamp distance), so same-date rows aggregate together and
    gaps shrink the frame.  Spark's rangeBetween needs a numeric
    ordering key: order by epoch seconds with a ±seconds frame,
    identical semantics to the oracle's INTERVAL frame.  Decimal sums
    keep every frame order-free."""
    epoch = F.unix_timestamp("o_orderdate")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-7 * 86400, 0)
    )
    return T(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("spend_7d"),
    )


@query(
    "win_moving_median",
    oracle="""
    SELECT o_custkey, o_orderdate,
           CAST(median(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS med4
    FROM orders WHERE o_custkey < 200
    """,
    tags=("window",),
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving EXACT median over a 4-row trailing frame per customer —
    the robust-smoothing window sum/avg can't give (median is
    non-algebraic, the frame must be re-ranked per row).  Spark's
    median() rejects framed windows, so the frame is materialized with
    collect_list (4 values — O(1) state) and interpolated with array
    expressions; (a+b)/2 midpoints match the oracle's median() bit-
    for-bit because both engines average the same two doubles."""
    o = T(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, 0)
    )
    arr = F.array_sort(F.collect_list(F.col("o_totalprice")).over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    med = ((lo + hi) / 2).cast("double")
    return o.select("o_custkey", "o_orderdate", med.alias("med4"))
