"""TPC-H-shaped analytical queries beyond the flagship q1/q3/q5.

The reference has no joins/aggregations of its own (SURVEY.md §2.9 —
single-table JDBC extraction only, `dataIngestionUtils.py:131-168`), so
these are green-field Spark: the canonical decision-support shapes the
engine must plan well at 100 TB.  Where the synthetic star schema lacks
a TPC-H column (no partsupp, l_shipmode, l_commitdate, p_container,
c_phone), the query keeps the SHAPE (semi/anti joins, correlated
subqueries, disjunctive pushdown, two-level aggregation) with an
adapted predicate; constants are chosen for realistic selectivity on
the driver testdata (nations NATION_0..24, p_type ∈ {ECONOMY, LARGE,
MEDIUM, PROMO, SMALL, STANDARD}, dates 1995-2001).

Exactness discipline (see plans/registry.py docstring): every money sum
goes through DECIMAL(18,6) (`_util.dec_sum`) so aggregation is
order-free; counts cast to BIGINT in the oracle; year() cast to INT on
both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import track
from .registry import query
from ._util import T, dec_sum

_REV = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"


def _rev_col() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp_ntz")


# --------------------------------------------------------------------------
# Q4 — order-priority checking (EXISTS semi-join over a date window)
# --------------------------------------------------------------------------


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    tags=("join", "semi", "agg", "tpch"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders having at least one
    late line (shipped >60 days after order date; the schema has no
    l_commitdate).  Planned as a LEFT SEMI join — the fact side is
    deduplicated by the join itself, no distinct needed, and the date
    filter on orders prunes before the shuffle."""
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change (pure scan-filter-agg; pushdown showcase)
# --------------------------------------------------------------------------


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    tags=("scan", "agg", "tpch"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the pushdown benchmark — every predicate reaches the
    parquet scan (range on shipdate prunes row groups via min/max
    stats), then a single partial-aggregated global sum.  At 100 TB
    this reads only the matching row groups of two columns."""
    li = T(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations (dual-role dimension join)
# --------------------------------------------------------------------------


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(sum({_REV}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg", "tpch"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: the same dimension (nation) joined twice under two
    roles — supplier side and customer side — with a disjunctive pair
    filter.  Both nation copies broadcast; supplier broadcasts too
    (100 rows); the only shuffle is lineitem↔orders↔customer."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = F.broadcast(T(spark, sf_dir, "supplier"))
    n1 = F.broadcast(
        T(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        T(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n1, F.col("s_nkey") == F.col("s_nationkey"))
        .join(n2, F.col("c_nkey") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dec_sum(_rev_col(), "revenue"))
    )


# --------------------------------------------------------------------------
# Q8 — national market share (conditional aggregation ratio)
# --------------------------------------------------------------------------


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             {_REV} AS volume,
             n1.n_name AS nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n2.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN part     ON p_partkey = l_partkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("join", "agg", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's share of ECONOMY-part order volume sold
    into ASIA, per year.  Ratio of two order-free decimal sums — the
    division happens on exact doubles, so it is bit-stable across any
    partitioning.  Customer-region filter prunes the fact rows before
    the part join; all dimensions broadcast."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    c = T(spark, sf_dir, "customer")
    s = F.broadcast(T(spark, sf_dir, "supplier"))
    p = F.broadcast(
        T(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    )
    n_cust = F.broadcast(
        T(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("c_nkey"),
            F.col("n_regionkey").alias("c_rkey"),
        )
    )
    r = F.broadcast(
        T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    n_supp = F.broadcast(
        T(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation")
        )
    )
    vol = _rev_col()
    joined = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n_cust, F.col("c_nkey") == F.col("c_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("c_rkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n_supp, F.col("s_nkey") == F.col("s_nationkey"))
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return joined.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(zero)
            ).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit (adapted: retail-price cost model, no partsupp)
# --------------------------------------------------------------------------


@query(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount)
                  - 0.5 * p_retailprice * l_quantity AS DECIMAL(18,6)) AS amount
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN part     ON p_partkey = l_partkey
      WHERE p_type = 'STANDARD'
    ) profit
    GROUP BY nation, o_year
    """,
    tags=("join", "agg", "tpch"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per supplier-nation/year profit on STANDARD
    parts.  The schema has no partsupp, so supply cost is modeled as
    half the part's retail price — the join/agg topology (fact + 4
    dims, two fact-key joins) is what matters.  Profit computed per
    row as one decimal expression, summed order-free."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    s = F.broadcast(T(spark, sf_dir, "supplier"))
    n = F.broadcast(T(spark, sf_dir, "nation"))
    p = F.broadcast(
        T(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,6)")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# Q10 — returned-item reporting (top-k customers by lost revenue)
# --------------------------------------------------------------------------


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(sum({_REV}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-line revenue in a
    half-year window.  The returnflag filter is pushed into the
    lineitem scan; final top-k is TakeOrderedAndProject (no global
    sort), tie-broken on c_custkey for cross-engine determinism."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-07-01"))
    )
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(T(spark, sf_dir, "nation"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dec_sum(_rev_col(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join + double aggregation)
# --------------------------------------------------------------------------


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("join", "outer", "agg", "tpch"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of per-customer order counts (excluding
    urgent orders), customers with zero orders included via the LEFT
    join + count(col) null-skipping semantics.  Two-level aggregation:
    the second groupBy is tiny (distinct counts), so the heavy shuffle
    is only the first, keyed on custkey."""
    c = T(spark, sf_dir, "customer").select("c_custkey")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# --------------------------------------------------------------------------
# Q14 — promotion revenue share (conditional agg, single row)
# --------------------------------------------------------------------------


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV}
                                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           / CAST(sum({_REV}) AS DOUBLE) AS promo_revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
    tags=("join", "agg", "tpch"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percent of one month's revenue from PROMO parts.
    part broadcasts; both the conditional and total sums are exact
    decimals, so the final double ratio is bit-stable."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-03-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    p = F.broadcast(T(spark, sf_dir, "part").select("p_partkey", "p_type"))
    rev = _rev_col()
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .select(F.col("p_type"), rev.alias("_rev"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", F.col("_rev")).otherwise(zero)
                ).cast("double")
                / F.sum("_rev").cast("double")
            ).alias("promo_revenue")
        )
    )


# --------------------------------------------------------------------------
# Q15 — top supplier (aggregate + equality-with-max scalar subquery)
# --------------------------------------------------------------------------


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum({_REV}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue.
    The max is a scalar broadcast back over the tiny aggregate (100
    suppliers), not a window over the fact table; both sides of the
    equality are the same exact decimal→double value, so the
    comparison is safe cross-engine."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dec_sum(_rev_col(), "total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated average subquery)
# --------------------------------------------------------------------------


@query(
    "q17_small_quantity",
    oracle="""
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
           / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT 0.5 * (CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
                      / count(*))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
    tags=("join", "subquery", "agg", "tpch"),
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from lines whose quantity is below half the
    part's average.  The correlated subquery decorrelates to a
    per-part aggregate joined back to the fact — one extra shuffle on
    partkey instead of a per-row subquery.  The average is computed as
    exact-decimal-sum / count (order-free), matching the oracle's
    spelling bit for bit."""
    li = T(spark, sf_dir, "lineitem")
    p = F.broadcast(
        T(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (
            F.lit(0.5)
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("_half_avg")
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("_pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("_half_avg"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING semi-filter into a 3-way join)
# --------------------------------------------------------------------------


@query(
    "q18_large_volume",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 200
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("join", "semi", "agg", "topk", "tpch"),
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 200, with their
    customers.  The IN-subquery is a self-aggregation of lineitem
    planned as a LEFT SEMI join; both aggregations shuffle on
    orderkey, so AQE reuses the partitioning.  Top-100 by price is
    TakeOrderedAndProject."""
    li = T(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("_q"))
        .filter(F.col("_q") > 200)
        .select(F.col("l_orderkey").alias("_big_ok"))
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    return (
        li.join(big, F.col("l_orderkey") == F.col("_big_ok"), "left_semi")
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_qty")
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive multi-attribute predicate)
# --------------------------------------------------------------------------


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(sum({_REV}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1  AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    tags=("join", "agg", "tpch"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: three-way disjunction mixing part attributes and
    line attributes (the schema has no p_container/l_shipmode, so the
    disjuncts use brand/size/quantity).  The single-table parts of the
    predicate (brand IN, size ≤ 35, quantity ≤ 30) are pushed below
    the join; the full disjunction applies after.  part broadcasts."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    p = F.broadcast(
        T(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
            & (F.col("p_size") >= 1)
            & (F.col("p_size") <= 35)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    disj = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(disj)
        .agg(dec_sum(_rev_col(), "revenue"))
    )


# --------------------------------------------------------------------------
# Q22 — global sales opportunity (anti-join + uncorrelated scalar subquery)
# --------------------------------------------------------------------------


@query(
    "q22_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
             / count(*) AS a
      FROM customer
      WHERE c_acctbal > 0.0 AND c_nationkey < 10
    )
    SELECT c_nationkey AS cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_nationkey < 10
      AND c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY c_nationkey
    """,
    tags=("join", "anti", "subquery", "agg", "tpch"),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: wealthy customers (above the positive-balance
    average, nation group < 10 standing in for phone-prefix country
    codes) with no orders since 1999 (the TPC-H recent-window
    semantics — unwindowed, every customer has ordered and the check
    is vacuous).  NOT EXISTS plans as LEFT ANTI
    against only the o_custkey column; the scalar average broadcasts
    via a cross join of a 1-row aggregate."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 10)
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("_a")
        )
    )
    o_keys = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("1999-01-01"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_a"))
        .join(o_keys, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier (per-group argmin + join-back; no partsupp, so
# "cost" is the supplier's account balance among suppliers who shipped it)
# --------------------------------------------------------------------------


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type
    FROM ps
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    WHERE p_size = 10 AND p_type = 'SMALL' AND r_name = 'EUROPE'
      AND s_acctbal = (
        SELECT min(s2.s_acctbal)
        FROM ps ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
        JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
        WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal, p_partkey, s_name
    LIMIT 100
    """,
    tags=("join", "subquery", "argmin", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part argmin over a correlated subquery.
    Decorrelated as a window min over the (part, supplier) pairs —
    one shuffle on partkey instead of a per-row subquery; min is
    order-free (no float summation), so equality is exact.  The
    supplied-parts relation is DISTINCT pairs from lineitem (the
    schema has no partsupp)."""
    ps = (
        T(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    s = F.broadcast(T(spark, sf_dir, "supplier"))
    n = F.broadcast(T(spark, sf_dir, "nation"))
    r = F.broadcast(T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"))
    p = F.broadcast(
        T(spark, sf_dir, "part").filter(
            (F.col("p_size") == 10) & (F.col("p_type") == "SMALL")
        )
    )
    from pyspark.sql import Window

    eu_pairs = (
        ps.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("n_regionkey"))
    )
    w = Window.partitionBy("l_partkey")
    ranked = eu_pairs.withColumn("_min_bal", F.min("s_acctbal").over(w))
    return (
        ranked.filter(F.col("s_acctbal") == F.col("_min_bal"))
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .orderBy("s_acctbal", "p_partkey", "s_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q11 — important stock identification (group sum vs fraction-of-total)
# --------------------------------------------------------------------------


@query(
    "q11_important_stock",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             CAST(CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS part_value
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      WHERE s_nationkey < 5
      GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM pv
    WHERE part_value > (SELECT 2.0 * sum(part_value) / count(*) FROM pv)
    """,
    tags=("agg", "subquery", "tpch"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value (suppliers from the
    first five nations) kept only when above twice the mean part value
    (self-scaling threshold — TPC-H's fixed fraction empties under the
    testdata's uniform part distribution).  The
    total is a second aggregate over the SAME grouped result — Spark
    caches the grouped frame so the scan+join run once; the threshold
    broadcasts as a 1-row cross join.  Group sums are exact decimals
    cast to double; the threshold re-casts them to decimal before the
    grand total, so BOTH aggregation levels are order-free at any
    partitioning."""
    li = T(spark, sf_dir, "lineitem")
    s = F.broadcast(
        T(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5)
    )
    pv = (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast(
                    "decimal(28,6)"
                )
            )
            .cast("double")
            .alias("part_value")
        )
    ).cache()
    track(pv)
    total = pv.agg(
        (
            F.lit(2.0)
            * F.sum(F.col("part_value").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_thr")
    )
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("_thr"))
        .select("l_partkey", "part_value")
    )


# --------------------------------------------------------------------------
# Q12 — shipping-priority classes for late lines (conditional agg)
# --------------------------------------------------------------------------


@query(
    "q12_late_lines_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_returnflag
    """,
    tags=("join", "agg", "tpch"),
)
def q12_late_lines_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: for lines shipped >90 days after their order
    (the schema has no l_shipmode/receiptdate, so returnflag stands in
    for shipmode), count high- vs low-priority orders.  One join, one
    conditional aggregation; the year filter prunes at the scan."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q16 — supplier-part relationship count (distinct-count + exclusion anti)
# --------------------------------------------------------------------------


@query(
    "q16_part_supplier_count",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 50
    """,
    tags=("agg", "anti", "distinct", "tpch"),
)
def q16_part_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct (non-delinquent) suppliers
    serve each brand/type/size bucket.  Exclusion subquery plans as a
    broadcast LEFT ANTI join (negative-balance suppliers stand in for
    the complaints LIKE filter); distinct-count shuffles once on the
    group keys."""
    ps = (
        T(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = F.broadcast(
        T(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#5")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
    )
    bad = F.broadcast(
        T(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(bad, F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
        .limit(50)
    )


# --------------------------------------------------------------------------
# Q20 — potential excess inventory (semi-join chain with HAVING)
# --------------------------------------------------------------------------


@query(
    "q20_heavy_shippers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_regionkey = 2
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'PROMO'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 50
      )
    ORDER BY s_name
    """,
    tags=("join", "semi", "agg", "tpch"),
)
def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one region who shipped >50 units
    of some PROMO part in 1996 (availqty semantics adapted — no
    partsupp).  The IN-subquery aggregates (supplier, part) then
    projects suppliers; planned as groupBy → LEFT SEMI, so supplier
    rows never duplicate."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    p = F.broadcast(
        T(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    heavy = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("_q"))
        .filter(F.col("_q") > 50)
        .select("l_suppkey")
    )
    s = T(spark, sf_dir, "supplier")
    n = F.broadcast(
        T(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    )
    return (
        s.join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(heavy, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS chain)
# --------------------------------------------------------------------------


@query(
    "q21_last_shippers",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    tags=("join", "semi", "anti", "tpch"),
)
def q21_last_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: in finished multi-supplier orders, the
    supplier whose line shipped last (no commit/receipt dates, so
    "kept the order waiting" = shipped the final line).  The EXISTS
    is a LEFT SEMI on (orderkey, other-supplier), the NOT EXISTS a
    LEFT ANTI on (orderkey, any-later-shipdate) — the same lineitem
    scan feeds all three roles, shuffled once on orderkey each."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    s = F.broadcast(T(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    l2 = li.select(
        F.col("l_orderkey").alias("l2_ok"), F.col("l_suppkey").alias("l2_sk")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_ok"), F.col("l_shipdate").alias("l3_sd")
    )
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .join(
            l2,
            (F.col("l2_ok") == F.col("l_orderkey"))
            & (F.col("l2_sk") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3_ok") == F.col("l_orderkey"))
            & (F.col("l3_sd") > F.col("l_shipdate")),
            "left_anti",
        )
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )
