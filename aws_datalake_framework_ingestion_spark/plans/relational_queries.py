"""Relational operator surface: scans, DAL semantics, joins, aggregates.

Covers SURVEY.md §2.1 (S1-S7), §2.3 (R1-R8), §2.4 (A1-A3) and the
§2.9 green-field families (joins, group-by aggregates, grouping sets,
set ops).  Each query is a Spark-first plan: filters/projections are
declared so Catalyst pushes them into the parquet scan, small
dimensions are broadcast explicitly, and aggregations rely on
partial (map-side) aggregation rather than pre-shuffling.

Reference semantics reproduced (citations into /root/reference):
  * full scan / max-probe / incremental range scan — the three JDBC
    query shapes of ingestion/utils/dataIngestionUtils.py:131-177.
  * select/filter/order/limit/offset composition —
    ingestion/connector/pg_connect.py:164-183 (_select builder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import T, dec_sum, sql_both
from .registry import query

# --------------------------------------------------------------------------
# Flagship: TPC-H Q1 pricing summary (scan → filter → 8-agg groupBy)
# --------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
           CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_price,
           CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan+filter pushed to parquet; single shuffle on the 6-value
    group key; partial aggregation keeps the shuffle tiny (6 rows/task
    regardless of input scale — holds at 100 TB).

    All money/avg aggregates go through decimal casts (dec_sum) so the
    result is bit-identical under ANY input split / partition order —
    averages are sum/count in both engines for the same reason."""
    li = T(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            dec_sum(disc_price, "sum_disc_price"),
            dec_sum(disc_price * (1 + F.col("l_tax")), "sum_charge"),
            (
                F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double") / cnt
            ).alias("avg_qty"),
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double")
                / cnt
            ).alias("avg_price"),
            (
                F.sum(F.col("l_discount").cast("decimal(18,6)")).cast("double") / cnt
            ).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# §2.1 Scans (S1-S7)
# --------------------------------------------------------------------------


@query(
    "s1_full_table_scan",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("scan",),
)
def s1_full_table_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`SELECT * FROM t` — reference dataIngestionUtils.py:137-138,
    re-expressed as a parquet scan (columnar, splittable; the JDBC
    variant lives in sources/jdbc.py)."""
    return T(spark, sf_dir, "nation")


@query(
    "s2_watermark_max_probe",
    oracle="SELECT max(o_orderdate) AS last_ext_time FROM orders",
    tags=("scan", "planner"),
)
def s2_watermark_max_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-watermark probe (reference: ORDER BY col DESC LIMIT 1,
    dataIngestionUtils.py:135-136).  Spark-first: max() aggregate —
    partial agg on every partition, one scalar to the driver; strictly
    better than top-1 sort at scale."""
    return T(spark, sf_dir, "orders").agg(F.max("o_orderdate").alias("last_ext_time"))


@query(
    "s3_incremental_range_scan",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
    FROM events
    WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '2024-01-02 00:00:00'
      AND CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-05 00:00:00'
    """,
    tags=("scan", "planner"),
)
def s3_incremental_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-open watermark interval (lo, hi] — reference
    dataIngestionUtils.py:139-141.  The range predicate is pushed into
    the parquet scan (min/max row-group pruning at scale)."""
    ev = T(spark, sf_dir, "events")
    lo = F.lit("2024-01-02 00:00:00").cast("timestamp_ntz")
    hi = F.lit("2024-01-05 00:00:00").cast("timestamp_ntz")
    return ev.filter((F.col("ts") > lo) & (F.col("ts") <= hi))


@query(
    "s4_custom_sql_passthrough",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders WHERE o_totalprice > 150000
    GROUP BY o_orderpriority
    """,
    tags=("scan", "sql"),
)
def s4_custom_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-asset custom SQL (reference `src_sql_query`,
    dataIngestionUtils.py:35) → spark.sql over registered views; the
    identical text is the oracle."""
    return sql_both(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders WHERE o_totalprice > 150000
        GROUP BY o_orderpriority
        """,
    )


@query(
    "s7_point_lookup",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment "
    "FROM customer WHERE c_custkey = 42",
    tags=("scan", "dal"),
)
def s7_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog point query (reference Connector.retrieve_dict,
    pg_connect.py:288-305)."""
    return T(spark, sf_dir, "customer").filter(F.col("c_custkey") == 42)


# --------------------------------------------------------------------------
# §2.3 DAL relational semantics (R1-R8)
# --------------------------------------------------------------------------


@query(
    "r1_projection",
    oracle="SELECT c_custkey, c_name FROM customer",
    tags=("dal",),
)
def r1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection (pg_connect.py:274-279); column pruning reaches the
    scan — ReadSchema lists exactly two fields."""
    return T(spark, sf_dir, "customer").select("c_custkey", "c_name")


@query(
    "r2_filter_predicate",
    oracle="""
    SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000
    """,
    tags=("dal",),
)
def r2_filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized WHERE (pg_connect.py:114-121) as a pushed-down
    conjunctive predicate."""
    c = T(spark, sf_dir, "customer")
    return c.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 1000)
    ).select("c_custkey", "c_acctbal", "c_mktsegment")


@query(
    "r3_sort_multikey",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC
    """,
    tags=("dal", "sort"),
)
def r3_sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY (pg_connect.py:123-134, single-key there; multi-key is
    free in Spark).  Global sort = range-partitioned exchange."""
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(F.col("o_orderstatus").asc(), F.col("o_totalprice").desc())
    )


@query(
    "r4_topk_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    tags=("dal", "sort"),
)
def r4_topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k (ORDER BY ... LIMIT, pg_connect.py:176-183 compose) →
    TakeOrderedAndProject: per-partition heaps, no global sort."""
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "r5_offset_pagination",
    oracle="SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 10",
    tags=("dal", "sort"),
)
def r5_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination (pg_connect.py:136-152)."""
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
        .offset(10)
        .limit(20)
    )


# --------------------------------------------------------------------------
# §2.9 joins (green-field; all Spark built-ins)
# --------------------------------------------------------------------------


@query(
    "join_inner_agg",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
    tags=("join", "agg"),
)
def join_inner_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join on the fact key + aggregate.  Both sides shuffle
    on l_orderkey/o_orderkey (sort-merge at scale); decimal sum keeps
    the result independent of join output order."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dec_sum("l_extendedprice", "total_price"),
        )
    )


@query(
    "join_broadcast_dims",
    oracle="""
    SELECT r_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags=("join", "agg"),
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema rollup with explicitly broadcast dimensions — zero
    shuffle for the joins (nation/region are KBs even at 100 TB fact
    scale); single shuffle for the final group-by."""
    c = T(spark, sf_dir, "customer")
    n = F.broadcast(T(spark, sf_dir, "nation"))
    r = F.broadcast(T(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dec_sum("c_acctbal", "total_acctbal"),
        )
    )


@query(
    "join_left_outer_counts",
    oracle="""
    SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
    tags=("join",),
)
def join_left_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count of NULL
    key = 0, matching SQL count(col) semantics)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_full_outer",
    oracle="""
    WITH t AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT coalesce(t.o_custkey, c.c_custkey) AS custkey,
           coalesce(t.n_orders, 0) AS n_orders,
           c.c_acctbal AS acctbal
    FROM t FULL JOIN customer c ON t.o_custkey = c.c_custkey
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with coalesced key output."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    t = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return t.join(c, t.o_custkey == c.c_custkey, "full").select(
        F.coalesce(t.o_custkey, c.c_custkey).alias("custkey"),
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.col("c_acctbal").alias("acctbal"),
    )


@query(
    "join_semi_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    """,
    tags=("join",),
)
def join_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join (no row multiplication, build side only
    materializes keys)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti_not_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '1999-01-01'
    )
    """,
    tags=("join",),
)
def join_anti_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join: customers with no RECENT orders
    (every customer has some order in the testdata, so the unfiltered
    variant returned zero rows — a vacuous check)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_cross_small",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
    tags=("join",),
)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — only ever sane between broadcast-size
    inputs; kept tiny by construction."""
    r = T(spark, sf_dir, "region").select("r_name")
    n = T(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@query(
    "join_asof_last_purchase",
    oracle="""
    WITH p AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             max(value) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    c AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    )
    SELECT c.user_id, c.ts, c.event_id,
           p.ts AS asof_ts, p.purchase_value AS asof_purchase_value
    FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    tags=("join", "temporal"),
)
def join_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/temporal.py): each click gets the latest
    same-user purchase at-or-before it.  Union+window shape — one hash
    shuffle on user_id, no range explosion; oracle is DuckDB's native
    ASOF LEFT JOIN.  Right side pre-aggregated per (user, ts) so the
    match is deterministic."""
    from ..operators import temporal as TP

    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    return TP.asof_join(
        clicks, purchases, ts_col="ts", by=["user_id"], value_cols=["purchase_value"]
    )


@query(
    "join_range_followups",
    oracle="""
    SELECT s.event_id, CAST(count(e.event_id) AS BIGINT) AS n_follow
    FROM events s LEFT JOIN events e
      ON e.user_id = s.user_id
     AND CAST(e.ts AS TIMESTAMP) > CAST(s.ts AS TIMESTAMP)
     AND CAST(e.ts AS TIMESTAMP) <= CAST(s.ts AS TIMESTAMP) + INTERVAL 1 HOUR
    WHERE s.event_type = 'signup'
    GROUP BY s.event_id
    """,
    tags=("join", "temporal", "agg"),
)
def join_range_followups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (operators/temporal.py): per signup, how many
    same-user events land in the following hour.  Bucketized equi-join
    — Spark would otherwise plan the pure inequality join as a nested
    loop; zero-match signups kept by the operator's anti-join 'left'
    mode."""
    from ..operators import temporal as TP

    ev = T(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    pairs = TP.range_join(
        signups,
        ev.select("user_id", "ts", "event_id"),
        key="user_id",
        window_seconds=3600,
        how="left",
        left_id="event_id",
    )
    return pairs.groupBy("event_id").agg(
        F.count("r_event_id").alias("n_follow")
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '2000-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    tags=("join", "agg", "flagship"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension filter → fact join → grouped
    revenue → top-10.  customer is broadcast (post-filter it is small
    relative to the fact side); lineitem↔orders shuffle on orderkey."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp_ntz")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '2000-01-01'
    GROUP BY n_name
    """,
    tags=("join", "agg", "flagship"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a theta condition
    (c_nationkey = s_nationkey).  supplier/nation/region broadcast;
    the only real shuffle is lineitem↔orders."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp_ntz"))
    )
    li = T(spark, sf_dir, "lineitem")
    s = F.broadcast(T(spark, sf_dir, "supplier"))
    n = F.broadcast(T(spark, sf_dir, "nation"))
    r = F.broadcast(T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# §2.9 aggregation families
# --------------------------------------------------------------------------


@query(
    "agg_global_stats",
    oracle="""
    WITH s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sxx,
             min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
      FROM lineitem
    )
    SELECT n, min_qty, max_qty,
           sx / n AS avg_qty,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS sd_qty,
           (sxx - sx * sx / n) / (n - 1) AS var_qty,
           min_ship, max_ship
    FROM s
    """,
    tags=("agg",),
)
def agg_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global statistical aggregates in one pass.

    Variance/stddev come from exact decimal power sums (Σx, Σx²) with
    the two-pass formula applied identically in both engines — unlike
    streaming Welford merges, the result is independent of partition
    count and merge order, so it survives any input split."""
    li = T(spark, sf_dir, "lineitem")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(28,6)"))
        .cast("double")
        .alias("sxx"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)
    return s.select(
        "n",
        "min_qty",
        "max_qty",
        (F.col("sx") / F.col("n")).alias("avg_qty"),
        F.sqrt(var).alias("sd_qty"),
        var.alias("var_qty"),
        "min_ship",
        "max_ship",
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi count-distinct (expands to grouping-set style plan)."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


@query(
    "agg_approx_distinct",
    # HLL estimates differ across engines, so the hash-checkable contract
    # is: exact cardinality + "the sketch landed within 5%" (always true
    # at rsd=1%).  The oracle asserts the same exact count and TRUE.
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts_exact,
           TRUE AS approx_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB answer to
    count-distinct: no shuffle of distinct values, fixed-size sketch
    merge.  rsd 1%; the result exposes the exact count plus a bound
    check on the sketch so correctness is engine-portable.

    The exact and approx aggregates run as SEPARATE passes joined on
    the (3-row) group key: mixing a DISTINCT aggregate with any other
    aggregate in one agg makes Catalyst plan the EXPAND strategy —
    every input row duplicated per aggregate branch, with the rsd-1%
    HLL sketch updated through the expanded stream — measured 40.8 s
    at sf1 vs 5.8 s + 2.3 s for the two passes run apart (r10).  Two
    column-pruned scans beat one doubled-and-expanded pass at any
    scale, and on a real deployment only the approx pass runs at all
    (the exact side is this gate's verification)."""
    li = T(spark, sf_dir, "lineitem").select("l_returnflag", "l_partkey")
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts_exact")
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("_approx")
    )
    return exact.join(approx, "l_returnflag").select(
        "l_returnflag",
        "n_parts_exact",
        (
            F.abs(F.col("_approx") - F.col("n_parts_exact"))
            <= 0.05 * F.col("n_parts_exact")
        ).alias("approx_within_5pct"),
    )


@query(
    "agg_distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("agg",),
)
def agg_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_rf,
           CAST(grouping(l_linestatus) AS INT) AS g_ls,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (flag → flag×status → grand total)."""
    return (
        T(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            dec_sum("l_quantity", "sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_rf,
           CAST(grouping(l_linestatus) AS INT) AS g_ls,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over both dimensions."""
    return (
        T(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            dec_sum("l_quantity", "sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — same SQL text runs on both engines."""
    return sql_both(
        spark,
        sf_dir,
        """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """,
    )


@query(
    "agg_pivot_status",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(sum(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS VARCHAR) AS DOUBLE) AS qty_open,
           CAST(CAST(sum(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS VARCHAR) AS DOUBLE) AS qty_finished
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "pivot"),
)
def agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on l_linestatus with an explicit value list (never pivot
    on an unbounded column at scale — the value list bounds the output
    width and lets Spark skip the distinct-values job)."""
    out = (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double"))
    )
    return out.select(
        "l_returnflag",
        F.col("O").alias("qty_open"),
        F.col("F").alias("qty_finished"),
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_custkey HAVING count(*) > 12
    """,
    tags=("agg",),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 12)
    )


# --------------------------------------------------------------------------
# §2.9 set operations
# --------------------------------------------------------------------------


@query(
    "setop_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s)


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@query(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal < 0
    """,
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference with filtered sides (every nation has both
    customers and suppliers, so the unfiltered difference was empty —
    a vacuous check)."""
    c = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        T(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)


@query(
    "setop_intersect_all",
    oracle="""
    SELECT o_orderstatus AS st FROM orders WHERE o_totalprice > 250000
    INTERSECT ALL
    SELECT o_orderstatus AS st FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics intersect (multiplicity = min of the two sides)."""
    o = T(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 250000).select(
        F.col("o_orderstatus").alias("st")
    )
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderstatus").alias("st")
    )
    return a.intersectAll(b)


@query(
    "join_salted_skew",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
    tags=("join", "skew"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-to-dim join (operators/skew.py): hot keys scatter
    over 8 sub-keys so no single task absorbs a pathological key.  The
    rewrite is exact — the oracle is the PLAIN join."""
    from ..operators.skew import salted_join

    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    return (
        salted_join(li, o, on=["l_orderkey"], salt=8, salt_cols=["l_orderkey", "l_linenumber"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_sum("l_extendedprice", "total_price"),
        )
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.5) AS median,
           quantile_cont(l_quantity, 0.75) AS q75
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`).  Exact percentile sorts per group — fine on a
    grouped fact column; use approx_percentile (t-digest sketch, one
    pass, mergeable) when the group set is huge."""
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("q25"),
        F.percentile("l_quantity", F.lit(0.5)).alias("median"),
        F.percentile("l_quantity", F.lit(0.75)).alias("q75"),
    )


@query(
    "ns_doc_sample",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
    """,
    tags=("northstar", "sample"),
)
def ns_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% corpus subsample (training-pipeline staple):
    hash-threshold selection — unlike Bernoulli `sample()`, membership
    is a pure function of the row, so the subset is stable across runs,
    partitionings, AND engines (md5 is portable; 0x1a/0x100 ≈ 10.2%).
    Map-side filter, zero shuffle at any scale."""
    docs = T(spark, sf_dir, "documents")
    return docs.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "1a"
    ).select("doc_id", "lang", "n_chars")


@query(
    "setop_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (multiplicity-aware EXCEPT ALL)."""
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


_R8_SCALAR_SQL = """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.8 * (
      SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             / count(*)
      FROM orders
    )
"""


@query(
    "r8_scalar_subquery",
    oracle=_R8_SCALAR_SQL,
    tags=("dal", "subquery"),
)
def r8_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (orders above 1.8× the mean
    price — 2× exceeded the testdata's price cap and matched nothing)
    — identical SQL text runs on Spark temp views and DuckDB; the
    threshold uses the order-free decimal mean so both engines compare
    against the same double."""
    return sql_both(spark, sf_dir, _R8_SCALAR_SQL)


@query(
    "agg_approx_percentile",
    # t-digest sketches differ across engines, so the hash-checkable
    # contract mirrors agg_approx_distinct: the exact interpolated
    # median + "the sketch landed within 5%" (always true at
    # accuracy=10000 on this data).
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_exact,
           TRUE AS approx_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "approx", "percentile"),
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (mergeable quantile sketch) — the 100 TB
    percentile path: one pass, fixed-size state, no per-group sort
    (agg_percentiles is the exact counterpart).  The result exposes
    the exact median plus a bound check on the sketch so correctness
    is engine-portable."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.5)).alias("median_exact"),
            F.approx_percentile(
                "l_quantity", F.lit(0.5), F.lit(10000)
            ).alias("_approx"),
        )
        .select(
            "l_returnflag",
            "median_exact",
            (
                F.abs(F.col("_approx") - F.col("median_exact"))
                <= 0.05 * F.abs(F.col("median_exact"))
            ).alias("approx_within_5pct"),
        )
    )


@query(
    "join_null_safe_eq",
    oracle="""
    WITH l AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN NULL ELSE lang END AS lang_key
      FROM documents
    ),
    r AS (
      SELECT DISTINCT CASE WHEN lang = 'en' THEN NULL ELSE lang END AS lang_key,
             lang AS orig_lang
      FROM documents
    )
    SELECT CAST(count(*) AS BIGINT) AS n_matched,
           CAST(count(DISTINCT l.lang_key) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN l.lang_key IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_matches
    FROM l JOIN r ON l.lang_key IS NOT DISTINCT FROM r.lang_key
    """,
    tags=("join",),
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys match each other instead of dropping — the semantics needed
    when joining on nullable dimension keys without a sentinel
    rewrite.  Still plans as a hash join (null-safe equality is an
    equi-key), not a nested loop."""
    d = T(spark, sf_dir, "documents")
    key = F.when(F.col("lang") == "en", F.lit(None)).otherwise(F.col("lang"))
    l = d.select("doc_id", key.alias("lang_key"))
    r = d.select(key.alias("rk"), F.col("lang").alias("orig_lang")).distinct()
    j = l.join(r, F.col("lang_key").eqNullSafe(F.col("rk")))
    return j.agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.count_distinct(F.col("lang_key")).alias("n_keys"),
        F.sum(
            F.when(F.col("lang_key").isNull(), 1).otherwise(0)
        ).alias("n_null_matches"),
    )


@query(
    "cal_daily_order_spine",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('day', min(o_orderdate)) AS lo,
             date_trunc('day', max(o_orderdate)) AS hi
      FROM orders
    ),
    spine AS (
      SELECT CAST(u.d AS TIMESTAMP) AS day
      FROM bounds, UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS u(d)
    ),
    daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT s.day, COALESCE(d.n_orders, 0) AS n_orders,
           (d.day IS NULL) AS is_gap
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
    tags=("analytics", "calendar"),
)
def cal_daily_order_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense calendar spine (F.sequence over the data's date bounds,
    exploded) LEFT-joined to daily order counts — makes zero-activity
    days explicit, the prerequisite for correct moving averages and
    gap detection over time series.  The spine is |days| rows; the
    fact side aggregates BEFORE the join (day grain, broadcastable),
    so the join never touches raw orders.  Day stays TIMESTAMP on
    both sides (DATE canonicalizes differently through pandas)."""
    o = T(spark, sf_dir, "orders")
    bounds = o.agg(
        F.date_trunc("day", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("day", F.max("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("dday")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    return spine.join(
        F.broadcast(daily), F.col("day") == F.col("dday"), "left"
    ).select(
        "day",
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.col("dday").isNull().alias("is_gap"),
    )
