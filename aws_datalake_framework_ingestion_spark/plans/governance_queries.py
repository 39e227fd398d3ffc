"""Governance-stage queries: data-quality profiling and masking.

The reference pipeline runs ingest → quality-check → mask → publish
(`airflow/template/dl_fmwrk_dag_template.py:113`), but the dq and mask
stages are opaque Glue job submissions (`:60-82`) with their statuses
tracked in the run ledger (`dataIngestionUtils.py:240-242`).  The
engine implements them as real operators (`pipeline.quality_check`,
`pipeline.mask`); these queries expose the same computations as
oracle-checked surface so the stage semantics are verified against
DuckDB, not just unit-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query
from ._util import T


@query(
    "dq_profile_orders",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS nulls_custkey,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS distinct_orderkey,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS distinct_status,
           min(o_orderdate) AS min_orderdate,
           max(o_orderdate) AS max_orderdate,
           CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS nonpositive_price
    FROM orders
    """,
    tags=("governance", "dq", "agg"),
)
def dq_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dq_validation stage as a query: row count, null counts,
    key-uniqueness cardinality, domain cardinality, date bounds, and a
    range check — ONE aggregation pass over the table (the
    pipeline.quality_check contract: never one job per check).  At
    100 TB this is a single scan with partial aggregation; every
    metric is a commutative aggregate."""
    o = T(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("nulls_custkey"),
        F.countDistinct("o_orderkey").alias("distinct_orderkey"),
        F.countDistinct("o_orderstatus").alias("distinct_status"),
        F.min("o_orderdate").alias("min_orderdate"),
        F.max("o_orderdate").alias("max_orderdate"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias(
            "nonpositive_price"
        ),
    )


@query(
    "mask_customer_pii",
    oracle="""
    SELECT c_custkey,
           sha256(c_name) AS name_token,
           CAST(length(c_name) AS INT) AS name_len,
           c_mktsegment,
           CASE WHEN c_acctbal < 0 THEN 'NEGATIVE'
                WHEN c_acctbal < 5000 THEN 'LOW'
                ELSE 'HIGH' END AS bal_band
    FROM customer
    WHERE c_nationkey = 7
    """,
    tags=("governance", "mask"),
)
def mask_customer_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data_masking stage as a query: irreversible sha2-256
    tokenization of the identifying column (joinable but not
    reversible), plus generalization of the quasi-identifier
    (account balance → coarse bands) — the same transform
    pipeline.mask applies, verified bit-for-bit against DuckDB's
    sha256.  Pure narrow projection: no shuffle at any scale."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_nationkey") == 7)
    return c.select(
        "c_custkey",
        F.sha2(F.col("c_name"), 256).alias("name_token"),
        F.length("c_name").cast("int").alias("name_len"),
        "c_mktsegment",
        F.when(F.col("c_acctbal") < 0, "NEGATIVE")
        .when(F.col("c_acctbal") < 5000, "LOW")
        .otherwise("HIGH")
        .alias("bal_band"),
    )


@query(
    "dq_expectations_lineitem",
    oracle="""
    WITH a AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
             CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
             CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
             CAST(sum(CASE WHEN l_tax < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_tax,
             CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS v_flag,
             CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_ship,
             CAST(sum(CASE WHEN l_returnflag = 'R' AND l_linestatus = 'O'
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_retopen
      FROM lineitem
    )
    SELECT 'quantity_positive' AS rule, v_qty AS n_violations, n_rows FROM a
    UNION ALL SELECT 'price_positive', v_price, n_rows FROM a
    UNION ALL SELECT 'discount_in_unit_interval', v_disc, n_rows FROM a
    UNION ALL SELECT 'tax_nonnegative', v_tax, n_rows FROM a
    UNION ALL SELECT 'returnflag_in_domain', v_flag, n_rows FROM a
    UNION ALL SELECT 'shipdate_not_null', v_ship, n_rows FROM a
    UNION ALL SELECT 'returned_lines_not_open', v_retopen, n_rows FROM a
    """,
    tags=("governance", "dq", "agg"),
)
def dq_expectations_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based expectations sweep (the declarative half of a DQ
    framework): null / range / domain / cross-column rules evaluated in
    ONE aggregation pass, then unpivoted to (rule, n_violations,
    n_rows) rows.  Every rule is a conditional sum, so the whole sweep
    is a single scan with partial aggregation regardless of the rule
    count — the only DQ shape that survives 100 TB (never one job per
    rule)."""
    li = T(spark, sf_dir, "lineitem")
    viol = {
        "quantity_positive": F.col("l_quantity") <= 0,
        "price_positive": F.col("l_extendedprice") <= 0,
        "discount_in_unit_interval": (F.col("l_discount") < 0)
        | (F.col("l_discount") > 1),
        "tax_nonnegative": F.col("l_tax") < 0,
        "returnflag_in_domain": ~F.col("l_returnflag").isin("A", "N", "R"),
        "shipdate_not_null": F.col("l_shipdate").isNull(),
        "returned_lines_not_open": (F.col("l_returnflag") == "R")
        & (F.col("l_linestatus") == "O"),
    }
    agg = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(c.cast("long")).alias(f"_v_{r}") for r, c in viol.items()],
    )
    pairs = []
    for r in viol:
        pairs.extend([F.lit(r), F.col(f"_v_{r}")])
    return agg.select(
        F.explode(F.create_map(*pairs)).alias("rule", "n_violations"),
        "n_rows",
    )


@query(
    "dq_referential_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey -> orders' AS relationship,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_partkey -> part',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_suppkey -> supplier',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                   WHERE s.s_suppkey = l.l_suppkey))
                AS BIGINT)
    """,
    tags=("governance", "dq", "join"),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit: each relationship is an anti-join
    count (child keys with no parent).  Dimension parents broadcast;
    the fact-to-orders check is a keyed anti-join that AQE plans —
    at 100 TB each check is one shuffle on its own key, and the four
    counts union into a single result.  The governance gate before
    publishing any curated dataset."""

    def orphans(child: DataFrame, ckey: str, parent: DataFrame, pkey: str,
                label: str, broadcast_parent: bool) -> DataFrame:
        p = parent.select(pkey)
        if broadcast_parent:
            p = F.broadcast(p)
        return (
            child.select(ckey)
            .join(p, F.col(ckey) == F.col(pkey), "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(label).alias("relationship"), "n_orphans")
        )

    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    p = T(spark, sf_dir, "part")
    s = T(spark, sf_dir, "supplier")
    return (
        orphans(li, "l_orderkey", o, "o_orderkey",
                "lineitem.l_orderkey -> orders", False)
        .unionAll(orphans(o, "o_custkey", c, "c_custkey",
                          "orders.o_custkey -> customer", True))
        .unionAll(orphans(li, "l_partkey", p, "p_partkey",
                          "lineitem.l_partkey -> part", True))
        .unionAll(orphans(li, "l_suppkey", s, "s_suppkey",
                          "lineitem.l_suppkey -> supplier", True))
    )


@query(
    "dq_drift_psi",
    oracle="""
    WITH e AS (
      SELECT value, (event_id % 2 = 0) AS is_ref FROM events
    ),
    b AS (
      SELECT min(value) AS mn, max(value) AS mx FROM e WHERE is_ref
    ),
    binned AS (
      SELECT CAST(least(9, greatest(0,
               CAST(floor((value - mn) / (mx - mn) * 10.0) AS INT))) AS INT)
               AS bin,
             is_ref
      FROM e, b
    ),
    counts AS (
      SELECT bin,
             CAST(count(*) FILTER (is_ref) AS BIGINT) AS n_ref,
             CAST(count(*) FILTER (NOT is_ref) AS BIGINT) AS n_cur
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT CAST(sum(n_ref) AS BIGINT) AS tr,
             CAST(sum(n_cur) AS BIGINT) AS tc
      FROM counts
    ),
    spine AS (SELECT unnest(range(0, 10)) AS bin),
    dense AS (
      SELECT s.bin,
             COALESCE(c.n_ref, 0) AS n_ref, COALESCE(c.n_cur, 0) AS n_cur
      FROM spine s LEFT JOIN counts c ON s.bin = c.bin
    ),
    terms AS (
      SELECT CAST(dense.bin AS INT) AS bin, n_ref, n_cur,
             round(
               (CAST(n_ref + 1 AS DOUBLE) / (tr + 10)
                - CAST(n_cur + 1 AS DOUBLE) / (tc + 10))
               * ln((CAST(n_ref + 1 AS DOUBLE) / (tr + 10))
                    / (CAST(n_cur + 1 AS DOUBLE) / (tc + 10))),
               6) AS term
      FROM dense, tot
    )
    SELECT bin, n_ref, n_cur, term,
           CAST(CAST(sum(CAST(term AS DECIMAL(18,6))) OVER () AS VARCHAR) AS DOUBLE) AS psi,
           (CAST(CAST(sum(CAST(term AS DECIMAL(18,6))) OVER () AS VARCHAR) AS DOUBLE) > 0.2)
             AS drifted
    FROM terms
    """,
    tags=("governance", "dq", "drift"),
)
def dq_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift check between a reference and
    a current slice of events.value: 10 equal-width bins from the
    REFERENCE min/max (current clamps into edge bins), Laplace-
    smoothed proportions so empty bins stay finite, per-bin PSI terms
    and the total in one pass.  ln() differs at the ULP across
    runtimes, so terms round to 6 dp in BOTH engines (tfidf rule) and
    the total is a decimal sum of the rounded terms — order-free.
    Scale shape: two scans collapse to a checkpointed 10-bin
    histogram before any math (every later relation derives from the
    10 rows, never the corpus); the spine join is a 10-row broadcast.  PSI > 0.2 is the conventional
    retrain/alert threshold."""
    e = T(spark, sf_dir, "events").select(
        "value", (F.col("event_id") % 2 == 0).alias("is_ref")
    )
    b = e.where("is_ref").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    binned = e.crossJoin(F.broadcast(b)).select(
        F.least(
            F.lit(9),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col("value") - F.col("mn"))
                    / (F.col("mx") - F.col("mn"))
                    * 10.0
                ).cast("int"),
            ),
        )
        .cast("int")
        .alias("bin"),
        "is_ref",
    )
    # ≤10-row histogram, checkpointed: four downstream relations
    # (totals, spine join, terms, PSI total) derive from it, and
    # without the cut Catalyst re-plans the corpus scan per
    # derivation (8 events scans measured in the r9 plan audit) —
    # the corpus collapses to 10 bins exactly once
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
        .cast("long")
        .alias("n_ref"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0))
        .cast("long")
        .alias("n_cur"),
    ).localCheckpoint()
    tot = counts.agg(
        F.sum("n_ref").cast("long").alias("tr"),
        F.sum("n_cur").cast("long").alias("tc"),
    )
    spine = T(spark, sf_dir, "events").sparkSession.range(0, 10).select(
        F.col("id").cast("int").alias("bin")
    )
    dense = (
        spine.join(counts, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
        .crossJoin(F.broadcast(tot))
    )
    p = (F.col("n_ref") + 1).cast("double") / (F.col("tr") + 10)
    q = (F.col("n_cur") + 1).cast("double") / (F.col("tc") + 10)
    terms = dense.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round((p - q) * F.log(p / q), 6).alias("term"),
    )
    # total PSI as an aggregate + broadcast back onto the 10 bins —
    # an unpartitioned `sum OVER ()` would plan Exchange
    # SinglePartition into a WindowExec (registry-wide plan guard)
    psi_tot = terms.agg(
        F.sum(F.col("term").cast("decimal(18,6)"))
        .cast("double")
        .alias("psi")
    )
    return terms.crossJoin(F.broadcast(psi_tot)).select(
        "bin",
        "n_ref",
        "n_cur",
        "term",
        "psi",
        (F.col("psi") > 0.2).alias("drifted"),
    )


@query(
    "maint_compact_roundtrip",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(l_orderkey) AS BIGINT) AS key_sum,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_part
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("maintenance",),
)
def maint_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction as a driver-gated ROUNDTRIP: lineitem is
    written as a hive-partitioned dataset (partitionBy l_returnflag)
    fragmented into many small files, compacted in place by
    sinks.compact_parquet (recursive scheme-agnostic sizing, layout
    preserved, staged+atomic swap), then re-read and aggregated per
    partition.  Bit-equality with the source-table oracle proves
    compaction changes the FILE LAYOUT and nothing else — no row
    lost, duplicated, or moved across partitions; count(DISTINCT)
    catches silent duplication that a sum alone would mask.  At
    100 TB this is the nightly OPTIMIZE pass that keeps scan task
    counts sane after streaming ingestion fragments a table."""
    import shutil
    import tempfile

    from ..sinks import compact_parquet
    from ..sources.files import vacuum_orphans

    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_returnflag"
    )
    work = tempfile.mkdtemp(prefix="compact_rt_")
    path = f"{work}/li"
    try:
        li.repartition(24).write.partitionBy("l_returnflag").parquet(path)
        compact_parquet(spark, path, target_files=1)
        vacuum_orphans(spark, path, retention_sec=0)  # reap nothing: swap cleaned up
        out = (
            spark.read.parquet(path)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_orderkey").alias("key_sum"),
                F.count_distinct(F.col("l_partkey")).alias("nd_part"),
            )
            .localCheckpoint()  # pin before the temp dataset is removed
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


@query(
    "dq_k_anonymity",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
           CAST(count(*) AS BIGINT) AS class_size,
           count(*) >= 5 AS anonymous
    FROM customer
    GROUP BY 1, 2, 3
    """,
    tags=("governance", "privacy", "agg"),
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002): every equivalence class over
    the quasi-identifier tuple (nation, market segment, account-
    balance band) with its size and a k=5 anonymity verdict — the
    standard pre-publication re-identification check a governed lake
    runs before releasing a 'de-identified' extract (the reference's
    masking stage, SURVEY §2 governance, stops at column redaction;
    this audits the residual joinability of what masking keeps).

    One hash-aggregation pass; the band edge uses exact integer
    floor-division semantics via ``floor(double/2000)`` in BOTH
    engines (c_acctbal is DECIMAL(15,2): /2000 is exact enough that
    the floor can't straddle a ULP — band edges are at whole-dollar
    multiples while balances carry cents).  At 100 TB the class
    relation is quasi-identifier-cardinality-sized, orders of
    magnitude smaller than the input; flagged classes (< k) are the
    rows a suppression/generalization pass would consume downstream.
    """
    c = T(spark, sf_dir, "customer")
    return c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal").cast("double") / 2000)
        .cast("long")
        .alias("bal_band"),
    ).agg(
        F.count(F.lit(1)).alias("class_size"),
        (F.count(F.lit(1)) >= 5).alias("anonymous"),
    )


@query(
    "dq_l_diversity",
    oracle="""
    SELECT c_nationkey,
           CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
           CAST(count(*) AS BIGINT) AS class_size,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l_distinct,
           count(DISTINCT c_mktsegment) >= 3 AS diverse
    FROM customer
    GROUP BY 1, 2
    """,
    tags=("governance", "privacy", "agg"),
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — k-anonymity's
    complement: a class can be large (k-anonymous) yet expose its
    members if the SENSITIVE attribute is uniform inside it.  Per
    quasi-identifier class (nation, balance band): size, number of
    DISTINCT sensitive values (market segment), and an l=3 verdict.
    One hash-aggregation with a distinct-count; the class relation is
    QI-cardinality-sized at any corpus scale, and the flagged classes
    feed the same suppression pass as dq_k_anonymity's."""
    c = T(spark, sf_dir, "customer")
    return c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal").cast("double") / 2000)
        .cast("long")
        .alias("bal_band"),
    ).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.count_distinct(F.col("c_mktsegment")).alias("l_distinct"),
        (F.count_distinct(F.col("c_mktsegment")) >= 3).alias("diverse"),
    )


@query(
    "maint_corpus_compaction",
    oracle="""
    WITH win AS (
      SELECT doc_id, text, doc_id % 3 AS b
      FROM (
        SELECT doc_id, text,
               row_number() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id % 3, doc_id) AS rn
        FROM documents
      ) WHERE rn = 1
    )
    SELECT doc_id, md5(text) AS fp,
           CAST(dense_rank() OVER (ORDER BY b) AS INT) AS seg
    FROM win
    """,
    tags=("maintenance", "stream", "versioned", "compaction"),
)
def maint_corpus_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment compaction of the append-only delta corpus
    (streaming/shard_append.compact_corpus): three batches are
    appended as immutable versioned segments (first-arrival-wins
    content dedup, the stream_exec_shard_append store), ALL segments
    are then rewritten as one compacted directory behind the _BASE
    commit point, superseded directories are vacuumed, and batch 0 is
    RE-DELIVERED (must append zero docs — the fingerprint anti-join
    now reads through the compacted rows).  The query audits
    read-equivalence in-engine (row count + order-free 56-bit digest
    before vs after compaction — any drift raises) and returns the
    corpus with each doc's fingerprint and ORIGINAL segment number;
    the oracle recomputes first-arrival-wins dedup + segment numbering
    from scratch, so compaction must preserve rows, fps AND the
    per-row segment lineage (as-of reads) bit-for-bit.

    At 100 TB this is the maintenance op that keeps a year of daily
    delta segments from becoming a thousand-directory listing+footer
    tax on every per-batch fingerprint scan; the commit point is a
    single-object write (object-store-safe), concurrent appends stay
    live past the high-water mark, and a compactor crash is invisible
    to readers.  Ref: the reference's processed-file archival
    housekeeping, dataIngestionUtils.py:196-232."""
    import shutil
    import tempfile

    from ..streaming.shard_append import (
        append_batch,
        compact_corpus,
        read_corpus,
        vacuum_corpus,
    )

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="corpus_compact_")
    corpus = f"{work}/corpus"

    def digest(df):
        # order-free: count + decimal-exact sum of a 56-bit md5
        # prefix per row (a long sum would ANSI-overflow past ~128
        # rows; both sides of the compare are in-engine, so decimal)
        return df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("|", "doc_id", "fp", "v")), 1, 14
                    ),
                    16,
                    10,
                ).cast("decimal(38,0)")
            ).alias("h"),
        ).first()

    try:
        for b in range(3):
            append_batch(
                spark, docs.where(F.col("doc_id") % 3 == b), corpus
            )
        before = digest(read_corpus(spark, corpus))
        res = compact_corpus(spark, corpus)
        after = digest(read_corpus(spark, corpus))
        if not res["compacted"] or tuple(before) != tuple(after):
            raise RuntimeError(
                f"maint_corpus_compaction: compaction drifted the corpus "
                f"({tuple(before)} -> {tuple(after)}, {res})"
            )
        # retain_ms=0: the gate's corpus is a private scratch dir
        # with no concurrent readers — exercise the actual reap
        vacuum_corpus(spark, corpus, retain_ms=0)
        n_redelivered = append_batch(
            spark, docs.where(F.col("doc_id") % 3 == 0), corpus
        )
        if n_redelivered:
            raise RuntimeError(
                "maint_corpus_compaction: redelivered batch appended "
                f"{n_redelivered} docs through the compacted fingerprints"
            )
        out = (
            read_corpus(spark, corpus)
            .select("doc_id", "fp", F.col("v").cast("int").alias("seg"))
            .localCheckpoint()  # pin before the workspace is removed
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


@query(
    "dq_t_closeness",
    oracle="""
    WITH base AS (
      SELECT c_nationkey AS nk,
             CAST(floor(c_acctbal / 2000) AS BIGINT) AS band,
             c_mktsegment AS seg
      FROM customer
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
    gdist AS (SELECT seg, CAST(count(*) AS BIGINT) AS g FROM base GROUP BY 1),
    cls AS (
      SELECT nk, band, CAST(count(*) AS BIGINT) AS n_c
      FROM base GROUP BY 1, 2
    ),
    cs AS (
      SELECT nk, band, seg, CAST(count(*) AS BIGINT) AS n_cv
      FROM base GROUP BY 1, 2, 3
    ),
    sp AS (
      SELECT c.nk, c.band, c.n_c, g.seg, g.g
      FROM cls c CROSS JOIN gdist g
    ),
    j AS (
      SELECT sp.nk, sp.band, sp.n_c,
             abs(coalesce(cs.n_cv, 0) * (SELECT n FROM tot)
                 - sp.g * sp.n_c) AS d
      FROM sp
      LEFT JOIN cs ON cs.nk = sp.nk AND cs.band = sp.band
                  AND cs.seg = sp.seg
    )
    SELECT nk AS c_nationkey, band AS bal_band,
           CAST(max(n_c) AS BIGINT) AS class_size,
           round(CAST(sum(d) AS DOUBLE)
                 / (2.0 * max(n_c) * (SELECT n FROM tot)), 6) AS tvd,
           CAST(sum(d) AS DOUBLE)
             / (2.0 * max(n_c) * (SELECT n FROM tot)) <= 0.25 AS close_t25
    FROM j GROUP BY 1, 2
    """,
    tags=("governance", "privacy", "agg"),
)
def dq_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    third leg of the k-anonymity / l-diversity privacy triad: a class
    can be large AND diverse yet still leak if its sensitive-value
    DISTRIBUTION deviates from the corpus (skewness attack).  Per
    quasi-identifier class (nation, balance band): size, the earth
    mover's distance of the class's market-segment distribution from
    the global one — for a categorical attribute under the
    equal-ground-distance metric EMD IS total variation distance,
    0.5 * sum_v |p_class(v) - p_global(v)| — and a t=0.25 verdict.

    Hash-stability: the TVD numerator is computed in EXACT integer
    arithmetic (sum_v |n_cv*N - g_v*n_c|, products bounded by
    n_c*N < 2^63 at any realistic scale), so the only double op is
    ONE final division, rounded 6dp — no accumulation-order ULP risk.

    Shape: two hash-aggregations over the table plus a broadcast
    cross-join of the QI-class relation with the segment-cardinality
    global distribution (model-sized on both counts); the flagged
    classes feed the same suppression pass as dq_k_anonymity's."""
    c = T(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"),
        F.floor(F.col("c_acctbal").cast("double") / 2000)
        .cast("long")
        .alias("band"),
        F.col("c_mktsegment").alias("seg"),
    )
    tot = c.agg(F.count(F.lit(1)).alias("n"))
    glob = (
        c.groupBy("seg")
        .agg(F.count(F.lit(1)).alias("g"))
        .crossJoin(F.broadcast(tot))
    )
    cls_seg = c.groupBy("nk", "band", "seg").agg(
        F.count(F.lit(1)).alias("n_cv")
    )
    cls = c.groupBy("nk", "band").agg(F.count(F.lit(1)).alias("n_c"))
    spine = cls.crossJoin(F.broadcast(glob))
    j = spine.join(cls_seg, ["nk", "band", "seg"], "left").select(
        "nk",
        "band",
        "n_c",
        "n",
        F.abs(
            F.coalesce(F.col("n_cv"), F.lit(0)) * F.col("n")
            - F.col("g") * F.col("n_c")
        ).alias("d"),
    )
    tvd = F.sum("d").cast("double") / (
        2.0 * F.max("n_c") * F.max("n")
    )
    return (
        j.groupBy("nk", "band")
        .agg(
            F.max("n_c").alias("class_size"),
            F.round(tvd, 6).alias("tvd"),
            (tvd <= 0.25).alias("close_t25"),
        )
        .select(
            F.col("nk").alias("c_nationkey"),
            F.col("band").alias("bal_band"),
            "class_size",
            "tvd",
            "close_t25",
        )
    )


@query(
    "maint_version_travel",
    oracle="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(l_orderkey) AS BIGINT) AS key_sum
    FROM lineitem GROUP BY 1
    """,
    tags=("maintenance", "versioned"),
)
def maint_version_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot versioning as a driver-gated roundtrip
    (sources/versioned.py): publish the per-flag lineitem aggregate
    as snapshot v1, publish a CORRUPTED overwrite as v2 (the bad
    deploy), roll the pointer back, and return the pointer read.
    Bit-equality with the v1 oracle proves the time-travel invariants
    end-to-end: v2 did not touch v1's files (immutability), rollback
    flipped only the pointer, and the reader resolves through it.

    At 100 TB this is the reproducible-training-snapshot / rollback
    path: version directories are immutable and the pointer flip is
    the commit point, so the layout is object-store-safe where a
    directory swap is not (module docstring)."""
    import shutil
    import tempfile

    from ..sources import versioned as V

    li = T(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_orderkey").alias("key_sum"),
    )
    work = tempfile.mkdtemp(prefix="version_travel_")
    path = f"{work}/flags"
    try:
        assert V.write_version(spark, agg, path) == 1
        # the bad deploy: same schema, silently truncated input
        V.write_version(
            spark,
            li.where(F.col("l_orderkey") < 100)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_orderkey").alias("key_sum"),
            ),
            path,
        )
        V.rollback(spark, path, 1)
        out = V.read_version(spark, path).localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


@query(
    "maint_format_roundtrip",
    oracle="""
    WITH base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS nd_docs
      FROM documents
    )
    SELECT f.fmt, b.n_rows, b.sum_chars, b.nd_docs
    FROM base b, (VALUES ('csv'), ('json'), ('orc')) AS f(fmt)
    """,
    tags=("maintenance", "formats"),
)
def maint_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sink/source format breadth as a driver-gated ROUNDTRIP: the
    documents table is written to ORC, CSV (quoted text payload,
    explicit schema on re-read — no inference drift), and JSON lines,
    read back through each source, and aggregated; bit-equality with
    the parquet-source oracle proves every format preserves row count,
    payload mass, and key cardinality (count(DISTINCT) catches silent
    duplication).  Avro is NOT exercised: spark-avro is an external
    package (absent in-container, installs disallowed) — the same
    probe posture as delta-spark.  At scale the write side inherits
    the partitioned-sink path (K1/compact), so this gate pins the
    FORMAT codecs, not the layout machinery."""
    import shutil
    import tempfile

    docs = T(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    work = tempfile.mkdtemp(prefix="fmt_rt_")
    try:
        docs.write.mode("overwrite").orc(f"{work}/orc")
        docs.write.mode("overwrite").option("header", True).csv(
            f"{work}/csv"
        )
        docs.write.mode("overwrite").json(f"{work}/json")
        parts = []
        for fmt in ("csv", "json", "orc"):
            if fmt == "csv":
                back = (
                    spark.read.option("header", True)
                    .schema(docs.schema)
                    .csv(f"{work}/csv")
                )
            elif fmt == "json":
                back = spark.read.schema(docs.schema).json(f"{work}/json")
            else:
                back = spark.read.orc(f"{work}/orc")
            parts.append(
                back.agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum("n_chars").alias("sum_chars"),
                    F.countDistinct("doc_id").alias("nd_docs"),
                ).select(F.lit(fmt).alias("fmt"), "n_rows", "sum_chars", "nd_docs")
            )
        from functools import reduce

        out = reduce(lambda a, b: a.unionByName(b), parts)
        # materialize BEFORE the temp dir disappears
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "maint_column_stats",
    oracle="""
    SELECT 'o_custkey' AS col,
           CAST(min(o_custkey) AS VARCHAR) AS min_v,
           CAST(max(o_custkey) AS VARCHAR) AS max_v,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(min(o_orderstatus) AS VARCHAR),
           CAST(max(o_orderstatus) AS VARCHAR),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
                AS VARCHAR),
           CAST(CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
                AS VARCHAR),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(min(o_orderpriority) AS VARCHAR),
           CAST(max(o_orderpriority) AS VARCHAR),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM orders
    """,
    tags=("maintenance", "catalog"),
)
def maint_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-TABLE-style column statistics collection — the CBO/
    catalog maintenance pass (min, max, exact NDV, null count per
    column) every lakehouse runs to feed its optimizer, emitted as a
    stats relation (col, min_v, max_v, ndv, n_null) rather than into
    session state so the values themselves are driver-gated.  All
    four stats per column come from ONE aggregation pass over the
    table (no per-column jobs — the reference's catalog records only
    row counts, dataIngestionUtils.py:240); numeric min/max render
    through DECIMAL so the string form is scale-stable across
    engines.  Exact NDV here (count distinct per column in one pass
    via the grouping-free agg); the sketch path for 100 TB NDV is
    agg_hll_mergeable."""
    o = T(spark, sf_dir, "orders")
    # min/max run on the NATIVE type (a string rendering would sort
    # lexicographically — '999' > '1499'); only the RESULT is rendered,
    # through DECIMAL for floats so the string form is scale-stable
    render = {
        "o_totalprice": lambda c: c.cast("decimal(18,2)").cast("string")
    }
    cols = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    row = o.agg(
        *[
            a
            for name in cols
            for r in [render.get(name, lambda c: c.cast("string"))]
            for a in (
                r(F.min(F.col(name))).alias(f"_min_{name}"),
                r(F.max(F.col(name))).alias(f"_max_{name}"),
                F.countDistinct(name).alias(f"_ndv_{name}"),
                F.sum(F.col(name).isNull().cast("long")).alias(
                    f"_nn_{name}"
                ),
            )
        ]
    )
    parts = [
        row.select(
            F.lit(name).alias("col"),
            F.col(f"_min_{name}").alias("min_v"),
            F.col(f"_max_{name}").alias("max_v"),
            F.col(f"_ndv_{name}").alias("ndv"),
            F.col(f"_nn_{name}").alias("n_null"),
        )
        for name in cols
    ]
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), parts)


@query(
    "maint_schema_merge",
    oracle="""
    WITH v1 AS (
      SELECT doc_id, lang FROM documents WHERE doc_id % 2 = 0
    ),
    v2 AS (
      SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 1
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_backfilled,
           CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS chars_present
    FROM (SELECT doc_id, lang, NULL AS n_chars FROM v1
          UNION ALL SELECT * FROM v2)
    GROUP BY lang
    """,
    tags=("maintenance", "formats", "schema"),
)
def maint_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema EVOLUTION roundtrip: generation 1 of a dataset is
    written without a column, generation 2 adds it; a mergeSchema
    read unions the generations with NULL backfill for the old files
    — the additive-column evolution every long-lived lake table goes
    through (the reference re-creates its Delta table on change;
    here evolution is native to the reader).  The gate pins row
    preservation, the exact backfill count, and the surviving values
    per group against an oracle that reproduces the union+backfill
    relationally."""
    import shutil
    import tempfile

    docs = T(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="schema_rt_")
    try:
        docs.where(F.col("doc_id") % 2 == 0).select(
            "doc_id", "lang"
        ).write.parquet(f"{work}/gen1")
        docs.where(F.col("doc_id") % 2 == 1).select(
            "doc_id", "lang", "n_chars"
        ).write.parquet(f"{work}/gen2")
        merged = spark.read.option("mergeSchema", True).parquet(
            f"{work}/gen1", f"{work}/gen2"
        )
        out = (
            merged.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("n_chars").isNull().cast("long")).alias(
                    "n_backfilled"
                ),
                F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).alias(
                    "chars_present"
                ),
            )
            .localCheckpoint()  # pin before the temp dir is reaped
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out
