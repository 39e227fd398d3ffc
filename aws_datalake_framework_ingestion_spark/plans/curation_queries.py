"""Round-4 curation / pipeline-optimization coverage: sub-document
dedup, asymmetric containment, bloom-filter join pre-filtering,
deterministic mixture allocation, interval concurrency, and the
built-in approximate-percentile tolerance gate.

Reference parity: the reference pipeline stops at table extraction
(ingestion/utils/dataIngestionUtils.py:169-194) — these extend the
engine along the training-data-pipeline axis SURVEY.md §2.9 lists as
first-class, with the same oracle discipline as the northstar family:
integer/decimal arithmetic wherever the driver hashes values, the
within-tolerance boolean pattern where an estimator is genuinely
approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import text as X2
from ..operators.sketches import _bucket
from ._util import T
from .registry import query

# --------------------------------------------------------------------------
# Sub-document (chunk-level) corpus dedup — CCNet's line-level dedup
# recast over fixed token chunks (the synthetic docs are single-line)
# --------------------------------------------------------------------------


@query(
    "ns_chunk_dedup",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    chunks AS (
      SELECT doc_id, i AS idx,
             md5(array_to_string(w[(i*10+1):(i*10+10)], ' ')) AS h,
             len(w[(i*10+1):(i*10+10)]) AS n_tok
      FROM toks, UNNEST(range(CAST(ceil(len(w) / 10.0) AS BIGINT))) AS r(i)
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, idx) AS rn
      FROM chunks
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rn = 1 THEN n_tok ELSE 0 END) AS BIGINT)
             AS kept_tokens
    FROM ranked GROUP BY doc_id
    """,
    tags=("northstar", "dedup"),
)
def ns_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level (sub-document) dedup: 10-token chunks hashed
    corpus-wide, only each chunk's first occurrence (by doc_id, then
    position) survives — CCNet's duplicated-line removal at chunk
    granularity.  One window shuffle on the chunk hash + one per-doc
    rollup; chunking itself is a fused row-local Generate."""
    return D.chunk_dedup(
        T(spark, sf_dir, "documents"), id_col="doc_id", text_col="text",
        chunk_tokens=10,
    )


# --------------------------------------------------------------------------
# Asymmetric containment pairs (boilerplate-inclusion detection)
# --------------------------------------------------------------------------


@query(
    "ns_containment_pairs",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    sh0 AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                  ELSE array_to_string(w, ' ') END AS s
      FROM t, UNNEST(range(1, greatest(len(w) - 1, 2))) AS r(i)
    ),
    sh AS (SELECT DISTINCT doc_id, s FROM sh0),
    c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
    p AS (
      SELECT a.doc_id AS u, b.doc_id AS v, CAST(count(*) AS BIGINT) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    d AS (
      SELECT u AS doc_a, v AS doc_b, inter FROM p
      UNION ALL
      SELECT v, u, inter FROM p
    )
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / CAST(c.n AS DOUBLE) AS containment
    FROM d JOIN c ON c.doc_id = d.doc_a
    WHERE CAST(inter AS DOUBLE) / CAST(c.n AS DOUBLE) >= 0.6
    """,
    tags=("northstar", "dedup"),
)
def ns_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed 3-gram containment pairs C(A→B) = |A∩B|/|A| ≥ 0.6 —
    the asymmetric near-dup signal (short doc quoted inside a long
    one) that symmetric Jaccard dilutes.  Intersections computed once
    per unordered pair via the shingle equi-join, emitted in both
    directions with direction-specific denominators."""
    return D.containment_pairs(
        T(spark, sf_dir, "documents"), k=3, threshold=0.6
    )


# --------------------------------------------------------------------------
# Bloom-filter join pre-filter (runtime-filter / DPP analog)
# --------------------------------------------------------------------------

_BLOOM_M = 4096  # bits
_BLOOM_K = 3     # hash functions


@query(
    "ns_bloom_prejoin",
    oracle=f"""
    WITH dim AS (
      SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    dimbits AS (
      SELECT DISTINCT CAST(CAST('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':'
               || CAST(k AS VARCHAR)), 1, 14) AS BIGINT) % {_BLOOM_M} AS INT)
             AS bit
      FROM dim, UNNEST([0, 1, 2]) AS r(i)
    ),
    probes AS (
      SELECT o_orderkey, o_custkey, r.i,
             CAST(CAST('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':'
               || CAST(o_custkey AS VARCHAR)), 1, 14) AS BIGINT) % {_BLOOM_M}
               AS INT) AS bit
      FROM orders, UNNEST([0, 1, 2]) AS r(i)
    ),
    cand AS (
      SELECT p.o_orderkey, p.o_custkey,
             sum(CASE WHEN p.bit IN (SELECT bit FROM dimbits)
                 THEN 1 ELSE 0 END) AS hits
      FROM probes p GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN o_custkey IN (SELECT k FROM dim)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
           CAST(sum(CASE WHEN hits = {_BLOOM_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_candidates,
           CAST(sum(CASE WHEN hits = {_BLOOM_K} AND o_custkey NOT IN
                    (SELECT k FROM dim) THEN 1 ELSE 0 END) AS BIGINT)
             AS fp_count,
           (min(CASE WHEN o_custkey IN (SELECT k FROM dim)
                THEN hits ELSE {_BLOOM_K} END) = {_BLOOM_K})
             AS no_false_negatives
    FROM cand
    """,
    tags=("northstar", "join"),
)
def ns_bloom_prejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pre-filter — the runtime-filter / dynamic
    partition pruning move, built portably: the BUILDING customer keys
    fold into a 4096-bit bloom (k=3 portable md5 hashes, same scheme
    as the count-min sketch so DuckDB reproduces every bit), facts
    are pre-filtered map-side against the ≤64-word
    broadcast bitmap, and only survivors would reach the real join
    shuffle.  At 100 TB this is the difference between shuffling every
    fact row and shuffling the ~selectivity fraction; exact fp_count
    is part of the contract (same hashes ⇒ same false positives in
    both engines, no tolerance needed).

    The bloom is exact-integer relational state: dim bits → 64-bit
    words via bitwise OR aggregation; each probe tests its k bits with
    three broadcast word lookups — no fact-side shuffle anywhere.
    """
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    dim = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    key = F.col("k").cast("string")
    bits = dim.select(
        F.explode(
            F.array(*[_bucket(key, i, _BLOOM_M) for i in range(_BLOOM_K)])
        ).alias("bit")
    ).distinct()
    words = bits.groupBy(F.expr("bit div 64").cast("int").alias("w")).agg(
        F.bit_or(F.expr("shiftleft(cast(1 as bigint), cast(bit % 64 as int))"))
        .alias("bm")
    )
    okey = F.col("o_custkey").cast("string")
    probe = orders.select(
        "o_orderkey",
        "o_custkey",
        *[_bucket(okey, i, _BLOOM_M).alias(f"bit{i}") for i in range(_BLOOM_K)],
    )
    for i in range(_BLOOM_K):
        wi = words.select(
            F.col("w").alias(f"w{i}"), F.col("bm").alias(f"bm{i}")
        )
        probe = probe.join(
            F.broadcast(wi),
            F.expr(f"bit{i} div 64").cast("int") == F.col(f"w{i}"),
            "left",
        )
    hit = [
        F.expr(
            f"cast((shiftright(coalesce(bm{i}, cast(0 as bigint)),"
            f" cast(bit{i} % 64 as int)) & 1) = 1 as int)"
        )
        for i in range(_BLOOM_K)
    ]
    n_hits = sum(hit[1:], hit[0])
    truth = dim.select(F.col("k").alias("o_custkey"), F.lit(1).alias("is_true"))
    scored = probe.join(F.broadcast(truth), "o_custkey", "left").select(
        n_hits.alias("hits"), F.coalesce(F.col("is_true"), F.lit(0)).alias("t")
    )
    k = F.lit(_BLOOM_K)
    return scored.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("t").cast("long").alias("n_true"),
        F.sum((F.col("hits") == k).cast("int")).cast("long").alias(
            "n_candidates"
        ),
        F.sum(((F.col("hits") == k) & (F.col("t") == 0)).cast("int"))
        .cast("long")
        .alias("fp_count"),
        (
            F.min(F.when(F.col("t") == 1, F.col("hits")).otherwise(k)) == k
        ).alias("no_false_negatives"),
    )


# --------------------------------------------------------------------------
# Deterministic mixture allocation (largest-remainder apportionment)
# --------------------------------------------------------------------------

_BUDGET = 1_000_000


@query(
    "ns_mixture_allocate",
    oracle=f"""
    WITH w AS (
      SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY 1, 2
    ),
    t AS (SELECT CAST(sum(chars) AS BIGINT) AS total FROM w),
    b AS (
      SELECT lang, source, chars,
             ({_BUDGET} * chars) // total AS base,
             ({_BUDGET} * chars) % total AS rem
      FROM w, t
    ),
    s AS (SELECT CAST({_BUDGET} - sum(base) AS BIGINT) AS leftover FROM b),
    r AS (
      SELECT *, row_number() OVER (ORDER BY rem DESC, lang, source) AS rk
      FROM b
    )
    SELECT lang, source, chars,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS alloc
    FROM r, s
    """,
    tags=("northstar", "sampling"),
)
def ns_mixture_allocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture budget allocation: apportion a 1M-token budget
    across (lang, source) strata proportional to available chars using
    the largest-remainder (Hamilton) method — ALL integer arithmetic
    (base = ⌊B·w/T⌋, remainders ranked as B·w mod T), so Σalloc = B
    exactly and the result is bit-stable across engines, unlike
    float-share rounding.  The strata relation is small by definition
    (distinct lang×source) but the remainder ranking still goes
    through operators/ranking.global_rank — the distributed rank —
    so no plan node is ever a single-partition window (registry-wide
    plan guard; strata cardinality is corpus-dependent)."""
    d = T(spark, sf_dir, "documents")
    w = d.groupBy("lang", "source").agg(
        F.sum("n_chars").alias("chars")
    )
    t = w.agg(F.sum("chars").alias("total"))
    b = w.join(F.broadcast(t)).select(
        "lang",
        "source",
        "chars",
        F.expr(f"({_BUDGET} * chars) div total").alias("base"),
        (F.lit(_BUDGET) * F.col("chars") % F.col("total")).alias("rem"),
    )
    s = b.agg((F.lit(_BUDGET) - F.sum("base")).alias("leftover"))
    from ..operators.ranking import global_rank

    # num_partitions=4: the relation is strata-sized (distinct
    # lang×source), so the default 32-way range split would schedule
    # mostly-empty tasks across three extra jobs.  Ranks depend only
    # on the total order, not the split width.
    ranked = global_rank(
        b,
        [F.col("rem").desc(), F.col("lang"), F.col("source")],
        rank_col="rk",
        num_partitions=4,
    )
    return (
        ranked
        .join(F.broadcast(s))
        .select(
            "lang",
            "source",
            "chars",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("long")
            .alias("alloc"),
        )
    )


# --------------------------------------------------------------------------
# Interval concurrency (sweep line over order lifetimes)
# --------------------------------------------------------------------------


@query(
    "evt_max_concurrency",
    oracle="""
    WITH iv AS (
      SELECT CAST(o.o_orderdate AS DATE) AS s, CAST(max(l.l_shipdate) AS DATE) AS e
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
    ),
    d AS (
      SELECT s AS d, 1 AS delta FROM iv
      UNION ALL
      SELECT e + 1, -1 FROM iv
    ),
    g AS (SELECT d, CAST(sum(delta) AS BIGINT) AS delta FROM d GROUP BY d),
    r AS (SELECT d, sum(delta) OVER (ORDER BY d) AS conc FROM g)
    SELECT CAST(d AS TIMESTAMP) AS peak_date, CAST(conc AS BIGINT) AS peak
    FROM r ORDER BY conc DESC, d LIMIT 1
    """,
    tags=("events", "window"),
)
def evt_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent open orders (open = orderdate → last item ship
    date) via the sweep-line: ±1 deltas keyed by date, one keyed
    aggregation collapses the corpus to ≤ date-cardinality rows, then
    the running concurrency is a DISTRIBUTED prefix sum
    (operators/ranking.global_running_sum — range-partitioned local
    cumsums + broadcast offsets), never a single-partition window —
    the orderless interval-overlap aggregation pattern that avoids
    any interval self-join at any date cardinality."""
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    iv = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.to_date("o_orderdate").alias("s"),
            F.to_date("last_ship").alias("e"),
        )
    )
    deltas = iv.select(F.col("s").alias("d"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.date_add(F.col("e"), 1).alias("d"), F.lit(-1).alias("delta"))
    )
    g = deltas.groupBy("d").agg(F.sum("delta").alias("delta"))
    from ..operators.ranking import global_running_sum

    swept = global_running_sum(g, [F.col("d")], "delta", out_col="conc")
    # TIMESTAMP (not DATE) on the output: DATE canonicalizes
    # differently through pandas on the two engines (cal_daily_order_
    # spine precedent)
    return (
        swept.select(
            F.col("d").cast("timestamp").alias("peak_date"),
            F.col("conc").cast("long").alias("peak"),
        )
        .orderBy(F.col("peak").desc(), "peak_date")
        .limit(1)
    )


# --------------------------------------------------------------------------
# Built-in approximate percentile, tolerance-gated
# --------------------------------------------------------------------------


@query(
    "agg_approx_percentile_gate",
    oracle="""
    SELECT o_orderpriority,
           CAST(median(o_totalprice) AS DOUBLE) AS exact_median,
           TRUE AS within_1pct
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "sketch"),
)
def agg_approx_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in approx_percentile (Greenwald-Khanna, accuracy
    10000 ⇒ rank error ≤ n/10000) gated against the exact median —
    the within-tolerance boolean pattern (agg_hll_mergeable) applied
    to the remaining built-in approximate aggregate the engine exposes
    but hadn't gated.  Exact median interpolates identically in both
    engines (precedent: agg_kll_quantile_merge); at a 1% value
    tolerance the GK summary's rank error is orders of magnitude
    inside the bound on this distribution."""
    o = T(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("CAST(median(o_totalprice) AS DOUBLE)").alias("exact_median"),
        (
            F.abs(
                F.percentile_approx(F.col("o_totalprice"), 0.5, 10000)
                - F.expr("median(o_totalprice)")
            )
            <= 0.01 * F.abs(F.expr("median(o_totalprice)"))
        ).alias("within_1pct"),
    )


# --------------------------------------------------------------------------
# Prefix-filtered exact similarity join (PPJoin/AllPairs family)
# --------------------------------------------------------------------------


@query(
    "ns_prefix_jaccard_pairs",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    sh0 AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                  ELSE array_to_string(w, ' ') END AS s
      FROM t, UNNEST(range(1, greatest(len(w) - 1, 2))) AS r(i)
    ),
    sh AS (SELECT DISTINCT doc_id, s FROM sh0),
    c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE) AS jaccard
    FROM p
    JOIN c ca ON ca.doc_id = doc_a
    JOIN c cb ON cb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE) >= 0.9
    """,
    tags=("northstar", "dedup"),
)
def ns_prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard ≥ 0.9 pairs via PREFIX FILTERING — same output as
    the naive shingle join (the oracle runs the naive algorithm; this
    query runs PPJoin-style candidate generation), but the equi-join
    touches only each doc's rarity-ordered ~10% prefix, squaring down
    the Σ df(s)² blowup on exactly the frequent shingles that hurt.
    Lossless by the prefix-overlap lemma; verification is exact
    array_intersect on candidates only."""
    return D.prefix_filter_jaccard_pairs(
        T(spark, sf_dir, "documents"), k=3, threshold=0.9
    )


@query(
    "ns_fuzzy_contamination",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '10' AS is_probe
      FROM documents
    ),
    sh0 AS (
      SELECT doc_id, is_probe,
             CASE WHEN len(w) >= 3
                  THEN w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                  ELSE array_to_string(w, ' ') END AS s
      FROM t, UNNEST(range(1, greatest(len(w) - 1, 2))) AS r(i)
    ),
    sh AS (SELECT DISTINCT doc_id, is_probe, s FROM sh0),
    c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
    p AS (
      SELECT a.doc_id AS doc_id, b.doc_id AS probe_id,
             CAST(count(*) AS BIGINT) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND NOT a.is_probe AND b.is_probe
      GROUP BY 1, 2
    )
    SELECT p.doc_id AS doc_id, probe_id,
           CAST(inter AS DOUBLE)
             / CAST(ca.n + cb.n - inter AS DOUBLE) AS jaccard
    FROM p
    JOIN c ca ON ca.doc_id = p.doc_id
    JOIN c cb ON cb.doc_id = probe_id
    WHERE CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE)
          >= 0.5
    """,
    tags=("northstar", "contamination", "dedup"),
)
def ns_fuzzy_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY eval-set decontamination (dedup.fuzzy_decontaminate): the
    held-out probe docs (md5(doc_id) prefix < '10', an eval-suite-sized
    slice) are matched against the training corpus by exact 3-gram
    Jaccard >= 0.5 through a shared-shingle equi-join — the near-match
    scrub for paraphrased/reformatted benchmark leakage that the exact
    5-token-prefix anti-join (ns_contamination_check) cannot see.
    Returns every flagged (corpus doc, probe, jaccard) pair.

    Unlike the quadratic all-pairs self-join family, the join is
    BIPARTITE with an eval-sized probe side: cost is
    Σ_s df_corpus(s)·df_probe(s) — linear in the corpus for a fixed
    eval suite, one corpus shuffle on the shingle hash, exact integer
    verification (one exact division at the end, emitted unrounded).  (On THIS
    synthetic corpus the probe side is a fixed % of the docs and the
    vocabulary is 31 tokens, so the product grows ~n² with replicas —
    the sf-decade soaks therefore slice-verify it alongside the
    self-join family; a real deployment's eval suite is fixed-size.)"""
    from ..operators.dedup import fuzzy_decontaminate

    d = T(spark, sf_dir, "documents")
    is_probe = (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "10"
    )
    out = fuzzy_decontaminate(
        d.where(~is_probe), d.where(is_probe), k=3, threshold=0.5
    )
    # jaccard is ONE division of exact bigints — bit-deterministic
    # unrounded (round 13; round() itself is the divergent op)
    return out.select("doc_id", "probe_id", "jaccard")


# --------------------------------------------------------------------------
# CDC apply (last-writer-wins upsert/delete merge)
# --------------------------------------------------------------------------


@query(
    "cdc_apply_last_wins",
    oracle="""
    WITH last AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (
                 PARTITION BY user_id
                 ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
               ) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    ups AS (SELECT user_id, value FROM last WHERE event_type <> 'error'),
    del AS (SELECT user_id FROM last WHERE event_type = 'error')
    SELECT COALESCE(u.user_id, b.c_custkey) AS entity_id,
           CAST(COALESCE(u.value, b.c_acctbal) AS DOUBLE) AS balance,
           CASE WHEN u.user_id IS NOT NULL THEN 'cdc' ELSE 'base' END AS src
    FROM customer b
    FULL OUTER JOIN ups u ON b.c_custkey = u.user_id
    WHERE COALESCE(u.user_id, b.c_custkey) NOT IN (SELECT user_id FROM del)
    """,
    tags=("relational", "cdc"),
)
def cdc_apply_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge: collapse an event stream to its last op per entity
    (ts desc, event_id tiebreak — the µs-truncated timestamp, matching
    the oracle's CAST), then apply upsert/delete ops onto the base
    snapshot in one full-outer join — the batch form of the MERGE the
    Delta-backed catalog runs transactionally (catalog.py), and the
    standard SCD1 refresh at lakehouse scale: one window shuffle on
    entity id, one co-partitioned outer join, deletes as an anti
    filter.  New entities insert, changed ones update, deleted ones
    drop, untouched base rows pass through."""
    ev = T(spark, sf_dir, "events")
    cust = T(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_acctbal")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last = (
        ev.select("user_id", "event_type", "value", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    ups = last.where(F.col("event_type") != "error").select("user_id", "value")
    dels = last.where(F.col("event_type") == "error").select("user_id")
    merged = cust.join(
        ups, cust.c_custkey == ups.user_id, "full_outer"
    ).select(
        F.coalesce(ups.user_id, cust.c_custkey).alias("entity_id"),
        F.coalesce(ups.value, cust.c_acctbal).cast("double").alias("balance"),
        F.when(ups.user_id.isNotNull(), "cdc").otherwise("base").alias("src"),
    )
    return merged.join(
        dels.select(F.col("user_id").alias("entity_id")),
        "entity_id",
        "left_anti",
    )


@query(
    "cdc_scd2_intervals",
    oracle="""
    WITH src AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
      FROM events
    ),
    ordered AS (
      SELECT *, lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_attr
      FROM src
    ),
    changes AS (
      SELECT user_id, ts, event_id, event_type
      FROM ordered WHERE prev_attr IS NULL OR prev_attr <> event_type
    )
    SELECT user_id, event_type AS attr,
           ts AS effective_from,
           lead(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS effective_to,
           CAST(lead(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) IS NULL AS BOOLEAN) AS is_current
    FROM changes
    """,
    tags=("curation", "cdc", "window"),
)
def cdc_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-Type-2 dimension build from a change stream: collapse
    consecutive duplicate attribute values per entity (lag filter),
    then derive validity intervals [effective_from, effective_to) via
    lead(), open-ended + is_current on the latest.  The standard
    warehouse history table the reference's catalog would need for
    asset-attribute changes.  Two window passes over the SAME
    (user_id → ts, event_id) partitioning — Catalyst plans one
    Exchange reused by both Sorts; state per key is O(1).  At 100 TB
    this is a single shuffle by entity key; no global order
    anywhere."""
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_attr", F.lag("event_type").over(w))
        .where(
            F.col("prev_attr").isNull()
            | (F.col("prev_attr") != F.col("event_type"))
        )
        .drop("prev_attr")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w2)
    return changes.select(
        "user_id",
        F.col("event_type").alias("attr"),
        F.col("ts").alias("effective_from"),
        nxt.alias("effective_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "ns_corpus_datasheet",
    oracle="""
    WITH s AS (
      SELECT source, lang,
             len(string_split(trim(text), ' ')) AS n_words,
             length(trim(text)) AS nc,
             (CAST(length(trim(text)) AS DOUBLE)
              - (CAST(len(string_split(trim(text), ' ')) AS DOUBLE) - 1))
               / CAST(len(string_split(trim(text), ' ')) AS DOUBLE)
               AS mean_len,
             CAST(len(list_filter(string_split(trim(text), ' '),
                  x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
               / CAST(len(string_split(trim(text), ' ')) AS DOUBLE)
               AS alpha_frac,
             len(list_intersect(list_distinct(string_split(trim(text), ' ')),
                 ['the','a','of','and','to'])) AS stop_hits
      FROM documents
    ),
    k AS (
      SELECT source, lang, n_words,
             (n_words BETWEEN 50 AND 100000)
               AND mean_len >= 4.0 AND mean_len <= 10.0
               AND alpha_frac >= 0.8 AND stop_hits >= 2 AS keep
      FROM s
    )
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS n_tokens,
           round(CAST(sum(n_words) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS mean_doc_tokens,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quality_keep,
           round(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS share_quality_keep
    FROM k GROUP BY source, lang
    """,
    tags=("northstar", "curation", "provenance"),
)
def ns_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance datasheet rollup (Gebru et al. 2021 'Datasheets for
    Datasets', the per-source/per-language summary every corpus
    release publishes): doc counts, token totals, mean doc length,
    and the Gopher-rule quality pass-rate, grouped by (source, lang).

    The quality flags ride the scan projection via
    ``operators/text.gopher_rules(carry_cols=...)`` — provenance keys
    are carried through the SAME single pass, never joined back by
    doc_id — then one hash aggregation keyed on (source, lang)
    produces the datasheet.  Group cardinality is |sources|×|langs|,
    so at 100 TB this is a full scan + one partial-agg shuffle of a
    few hundred rows; the two ratios divide identical BIGINTs as
    doubles in both engines and are rounded to 6 dp."""
    from ..operators import text as X

    flags = X.gopher_rules(
        T(spark, sf_dir, "documents"),
        min_mean_len=4.0,
        carry_cols=("source", "lang"),
    )
    return flags.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_tokens"),
        F.round(
            F.sum("n_words").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("mean_doc_tokens"),
        F.sum(F.col("keep").cast("long")).alias("n_quality_keep"),
        F.round(
            F.sum(F.col("keep").cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("share_quality_keep"),
    )


# --------------------------------------------------------------------------
# Round-9 curation additions: classifier-based quality filtering,
# contrastive triplet mining, duplicate-group canonicalization
# --------------------------------------------------------------------------


@query(
    "ns_quality_classifier",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
      FROM documents
    ),
    x AS (
      SELECT doc_id,
             ((CAST('0x' || substr(md5(w), 1, 14) AS BIGINT) % 4096)
              * 2654435761) % 1048576 AS xw
      FROM tok
    ),
    agg AS (
      SELECT doc_id, CAST(sum(xw) AS BIGINT) AS sx,
             CAST(count(*) AS BIGINT) AS n_tokens
      FROM x GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           round(1.0 / (1.0 + exp(-4.0 *
             ((CAST(sx AS DOUBLE) / 1048576.0 - 0.5 * n_tokens)
              / n_tokens))), 6) AS clf_score,
           round(1.0 / (1.0 + exp(-4.0 *
             ((CAST(sx AS DOUBLE) / 1048576.0 - 0.5 * n_tokens)
              / n_tokens))), 6) >= 0.5 AS keep
    FROM agg
    """,
    tags=("northstar", "text", "curation", "quality"),
)
def ns_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-linear quality-classifier inference over every document
    (operators/text.hashed_linear_score) — the fastText-style model
    gate every production pretraining pipeline runs (GPT-3 WebText
    classifier, CCNet wiki-ref scorer, LLaMA fastText filter).  The
    weight table is a deterministic hash-derived stand-in (no trained
    model ships in-container); the DuckDB oracle recomputes the exact
    integer weight sums through the portable 56-bit md5 hash, so the
    whole inference path — tokenize, hash, bucket, accumulate,
    logistic — is value-hash-checked."""
    from ..operators import text as X

    return X.hashed_linear_score(T(spark, sf_dir, "documents"))


@query(
    "ns_triplet_mining",
    oracle="""
    WITH base AS (SELECT vec_id, embedding FROM embeddings),
    aug AS (
      SELECT vec_id, embedding FROM base
      UNION ALL
      SELECT vec_id + 10000000, embedding FROM base WHERE vec_id < 10
    ),
    v AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM aug
    ),
    q AS (SELECT * FROM v WHERE vec_id < 10),
    sims AS (
      SELECT q.vec_id AS anchor_id, c.vec_id AS cand_id,
             list_sum(list_transform(list_zip(q.embedding, c.embedding),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (q.nrm * c.nrm) AS cosine
      FROM q JOIN v c ON q.vec_id <> c.vec_id
    ),
    pos AS (
      SELECT anchor_id, cand_id AS positive_id, cosine AS cos_pos,
             row_number() OVER (PARTITION BY anchor_id
                  ORDER BY cosine DESC, cand_id) AS rn
      FROM sims
    ),
    neg AS (
      SELECT anchor_id, cand_id AS negative_id, cosine AS cos_neg,
             row_number() OVER (PARTITION BY anchor_id
                  ORDER BY cosine DESC, cand_id) AS rn
      FROM sims WHERE cosine < 0.9
    )
    SELECT p.anchor_id, p.positive_id,
           round(p.cos_pos, 6) AS cos_pos,
           n.negative_id, round(n.cos_neg, 6) AS cos_neg,
           round(p.cos_pos - n.cos_neg, 6) AS margin
    FROM pos p JOIN neg n USING (anchor_id)
    WHERE p.rn = 1 AND n.rn = 1
    """,
    tags=("northstar", "similarity", "curation"),
)
def ns_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative triplet mining for contrastive embedding training
    (operators/similarity.triplet_mining): per anchor, the top-1
    neighbor as the positive and the hardest sub-0.9-cosine neighbor
    as the negative.  This corpus is deliberately isotropic (no
    natural near-dups — max natural cosine ~0.4), so positives are
    PLANTED as exact copies (vec_id + 10⁷ for vec_id < 10, the same
    planting pattern as the dedup recall gates): cos_pos is exactly
    1.0, the negative is the hardest genuine corpus vector, and every
    margin is strictly positive — non-vacuous by construction and
    reproduced in SQL by the oracle.  Doubles are rounded to 6dp in
    BOTH engines (the repo's tfidf ULP rule; ADVICE r9 — raw doubles
    passed only because both engines happened to lower the per-pair
    expression in the same order)."""
    from pyspark.sql import functions as F2

    from ..operators import similarity as S

    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    plants = emb.where(F2.col("vec_id") < 10).select(
        (F2.col("vec_id") + F2.lit(10000000)).alias("vec_id"), "embedding"
    )
    aug = emb.unionByName(plants)
    tri = S.triplet_mining(aug, F2.col("vec_id") < 10, dup_threshold=0.9)
    return tri.select(
        "anchor_id",
        "positive_id",
        F2.round("cos_pos", 6).alias("cos_pos"),
        "negative_id",
        F2.round("cos_neg", 6).alias("cos_neg"),
        F2.round("margin", 6).alias("margin"),
    )


@query(
    "ns_dedup_canonical",
    oracle="""
    WITH fp AS (
      SELECT doc_id, n_chars,
             md5(array_to_string(list_sort(list_distinct(
                  string_split(trim(text), ' '))), ' ')) AS sig
      FROM documents
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY sig
                  ORDER BY n_chars DESC, doc_id) AS rn
      FROM fp
    ),
    g AS (
      SELECT sig, CAST(count(*) AS BIGINT) AS n_group,
             max(CASE WHEN rn = 1 THEN doc_id END) AS canonical_id,
             CAST(count(*) - 1 AS BIGINT) AS n_dropped,
             CAST(sum(n_chars) - max(CASE WHEN rn = 1 THEN n_chars END)
                  AS BIGINT) AS chars_dropped
      FROM r GROUP BY sig
    )
    SELECT sig, n_group, canonical_id, n_dropped, chars_dropped
    FROM g WHERE n_group >= 2
    """,
    tags=("northstar", "dedup", "curation"),
)
def ns_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-group canonicalization (operators/dedup.
    canonical_docs): token-SET-identical documents group under one
    signature; each group keeps its best-quality member (max n_chars,
    tie-break min doc_id) and the query emits the audit ledger — group
    size, canonical id, docs and characters dropped.  The token-set
    key finds real groups on this corpus (21 groups at sf0.01, 257 at
    sf0.1); the same argmax policy composes unchanged with MinHash/LSH
    cluster ids for fuzzier families."""
    from ..operators import dedup as D2

    return D2.canonical_docs(T(spark, sf_dir, "documents"))


@query(
    "ns_mixture_temperature",
    oracle="""
    WITH w AS (
      SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY 1, 2
    ),
    t AS (SELECT CAST(sum(chars) AS BIGINT) AS total FROM w),
    q AS (
      SELECT lang, source, chars,
             CAST(round(pow(CAST(chars AS DOUBLE) / total, 0.3), 6)
                  AS DECIMAL(18,6)) AS q6
      FROM w, t
    ),
    s AS (SELECT CAST(CAST(sum(q6) AS VARCHAR) AS DOUBLE) AS z FROM q)
    SELECT lang, source, chars,
           round(CAST(q6 AS DOUBLE) / z, 6) AS w_alpha
    FROM q, s
    """,
    tags=("northstar", "sampling", "mixing"),
)
def ns_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha-sampling) mixture weights per
    (lang, source) stratum — the multilingual-LM standard (w_s ∝
    p_s^alpha, alpha = 0.3: upsample the tail, downsample the head)
    that complements ns_mixture_allocate's proportional Hamilton
    split.  ULP discipline: pow() is transcendental, so each stratum's
    q = p^alpha is 6dp-quantized in both engines, the normalizer is an
    order-free DECIMAL sum of those quanta (string-parsed back to
    double — the r5 rule), and the final weight is one division +
    round.  The strata relation is distinct(lang x source) — tiny at
    any corpus scale; the only corpus-sized pass is the chars sum."""
    d = T(spark, sf_dir, "documents")
    # strata agg is checkpointed: every downstream relation (total,
    # quantized weights, normalizer) derives from it, and without the
    # cut Catalyst re-plans the corpus scan per derivation (4 scans
    # measured) — one corpus pass, then strata-sized work only
    w = (
        d.groupBy("lang", "source")
        .agg(F.sum("n_chars").alias("chars"))
        .localCheckpoint()
    )
    t = w.agg(F.sum("chars").alias("total"))
    q = w.join(F.broadcast(t)).select(
        "lang",
        "source",
        "chars",
        F.round(
            F.pow(F.col("chars").cast("double") / F.col("total"), F.lit(0.3)),
            6,
        )
        .cast("decimal(18,6)")
        .alias("q6"),
    )
    s = q.agg(
        F.sum("q6").cast("string").cast("double").alias("z")
    )
    return q.join(F.broadcast(s)).select(
        "lang",
        "source",
        "chars",
        F.round(F.col("q6").cast("double") / F.col("z"), 6).alias("w_alpha"),
    )


@query(
    "ns_curriculum_phases",
    oracle="""
    WITH per_doc AS (
      SELECT doc_id,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(trim(text), ' ')))
                  AS BIGINT) AS n_types
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, n_tokens,
             (n_types * 1000000000) // n_tokens AS dkey
      FROM per_doc
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM keyed),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY dkey, doc_id) AS rk FROM keyed
    )
    SELECT CAST((rk - 1) * 4 // n_docs + 1 AS BIGINT) AS phase,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(dkey) AS BIGINT) AS sum_dkey,
           CAST(min(dkey) AS BIGINT) AS min_dkey,
           CAST(max(dkey) AS BIGINT) AS max_dkey
    FROM ranked, n GROUP BY 1
    """,
    tags=("northstar", "text", "curation"),
)
def ns_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: per-doc difficulty = lexical diversity
    (type-token ratio — repetitive docs are easy, diverse docs hard),
    quantized to an exact INTEGER key (n_types*1e9 div n_tokens — a
    deterministic total order with no float ties), globally ranked
    easy -> hard, and cut into 4 equal phases (ntile arithmetic over
    the distributed rank — phase = (rk-1)*4 div N + 1, never a
    single-partition NTILE window).  Emits per-phase doc counts and
    exact integer difficulty stats.

    Shape: the difficulty key is a pure scan-side projection (two
    array sizes — no explode, no join); the only shuffles are the
    distributed range sort in operators/ranking.global_rank and the
    4-row phase aggregate.  All outputs are integers — bit-stable
    under any partitioning."""
    from ..operators.ranking import global_rank

    d = T(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    keyed = d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_types"),
    ).select(
        "doc_id",
        "n_tokens",
        F.expr("(n_types * 1000000000) div n_tokens").alias("dkey"),
    )
    n = keyed.agg(F.count(F.lit(1)).alias("n_docs"))
    ranked = global_rank(
        keyed, [F.col("dkey"), F.col("doc_id")], rank_col="rk"
    )
    return (
        ranked.join(F.broadcast(n))
        .select(
            F.expr("(rk - 1) * 4 div n_docs + 1").alias("phase"),
            "dkey",
        )
        .groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dkey").alias("sum_dkey"),
            F.min("dkey").alias("min_dkey"),
            F.max("dkey").alias("max_dkey"),
        )
    )


@query(
    "ns_tokenizer_fertility",
    oracle="""
    SELECT source,
           CAST(sum(len(regexp_extract_all(text,
                '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))) AS BIGINT) AS n_bpe,
           CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT)
             AS n_words,
           round(CAST(sum(len(regexp_extract_all(text,
                '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))) AS DOUBLE)
             / sum(len(string_split(trim(text), ' '))), 6) AS fertility
    FROM documents GROUP BY source
    """,
    tags=("northstar", "text", "tokenizer"),
)
def ns_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per source — BPE-regex tokens emitted per
    whitespace word, THE standard metric for comparing tokenizers
    across domains/languages (fertility near 1 = efficient; high =
    the tokenizer shreds that source).  Exact integer sums per group,
    one final rounded division; no explode (both counts are array
    sizes computed inline in the scan projection), one shuffle on
    source."""
    d = T(spark, sf_dir, "documents")
    n_bpe = F.sum(X2.bpe_token_count(F.col("text")).cast("bigint")).alias(
        "n_bpe"
    )
    n_words = F.sum(
        F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint")
    ).alias("n_words")
    return d.groupBy("source").agg(n_bpe, n_words).select(
        "source",
        "n_bpe",
        "n_words",
        F.round(
            F.col("n_bpe").cast("double") / F.col("n_words"), 6
        ).alias("fertility"),
    )


@query(
    "ns_length_buckets",
    oracle="""
    WITH d AS (
      SELECT len(string_split(trim(text), ' ')) AS n FROM documents
    ),
    b AS (
      SELECT n, CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
                     WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
                     WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
                     ELSE 1024 END AS bucket_cap
      FROM d
    )
    SELECT CAST(bucket_cap AS BIGINT) AS bucket_cap,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS sum_tokens,
           CAST(sum(greatest(bucket_cap - n, 0)) AS BIGINT) AS pad_waste,
           round(CAST(sum(greatest(bucket_cap - n, 0)) AS DOUBLE)
                 / (count(*) * bucket_cap), 6) AS waste_frac
    FROM b GROUP BY bucket_cap
    """,
    tags=("northstar", "curation", "sampling"),
)
def ns_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing for batch assembly — the dynamic-
    batching primitive: docs bucket to the next power-of-two length
    cap (16..1024, CASE ladder — integer-exact, no log2 boundary ULP
    risk) and each bucket reports its padding waste (Σ max(cap − len, 0)
    and the waste fraction if batched at cap; docs LONGER than the top
    1024 cap are truncated at batch time, not padded, so their waste
    term clamps to 0 instead of going negative — ADVICE r9).  This is
    the report that
    decides bucket boundaries for padded training batches; exact
    integer sums, one final division.  Shape: the bucket key is a
    scan-side projection; ONE shuffle over ≤ 8 bucket groups."""
    d = T(spark, sf_dir, "documents")
    n = F.size(F.split(F.trim(F.col("text")), " "))
    cap = (
        F.when(n <= 16, 16)
        .when(n <= 32, 32)
        .when(n <= 64, 64)
        .when(n <= 128, 128)
        .when(n <= 256, 256)
        .when(n <= 512, 512)
        .otherwise(1024)
    )
    return (
        d.select(
            cap.cast("bigint").alias("bucket_cap"),
            n.cast("bigint").alias("_n"),
        )
        .groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").alias("sum_tokens"),
            F.sum(
                F.greatest(
                    F.col("bucket_cap") - F.col("_n"), F.lit(0).cast("bigint")
                )
            ).alias("pad_waste"),
        )
        .select(
            "bucket_cap",
            "n_docs",
            "sum_tokens",
            "pad_waste",
            F.round(
                F.col("pad_waste").cast("double")
                / (F.col("n_docs") * F.col("bucket_cap")).cast("double"),
                6,
            ).alias("waste_frac"),
        )
    )


@query(
    "ns_ngram_novelty",
    oracle="""
    WITH folded AS (
      SELECT doc_id, text,
             CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14)
                  AS BIGINT) % 5 AS INT) AS fold
      FROM documents
    ),
    grams AS (
      SELECT fold, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
      FROM (SELECT fold, string_split(trim(text), ' ') AS w FROM folded),
           UNNEST(range(1, greatest(len(w) - 1, 1))) AS r(i)
    ),
    ev AS (SELECT DISTINCT g FROM grams WHERE fold = 0),
    tr AS (SELECT DISTINCT g FROM grams WHERE fold <> 0)
    SELECT CAST((SELECT count(*) FROM ev) AS BIGINT) AS n_eval_grams,
           CAST((SELECT count(*) FROM ev
                 WHERE g NOT IN (SELECT g FROM tr)) AS BIGINT) AS n_novel,
           round(CAST((SELECT count(*) FROM ev
                       WHERE g NOT IN (SELECT g FROM tr)) AS DOUBLE)
                 / (SELECT count(*) FROM ev), 6) AS novelty_frac
    """,
    tags=("northstar", "text", "curation", "dedup"),
)
def ns_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-split n-gram NOVELTY — the memorization/generalization
    diagnostic (what fraction of the eval fold's distinct 3-grams
    never appear in the training folds): fold assignment is the
    ns_fold_assign portable md5 split (fold 0 = eval), grams come from
    the codegen positional-explode shape, each side is deduped to its
    distinct gram set, and novelty is one anti-join.  Low novelty
    means the split leaks (or the corpus is saturated) — the
    train/eval hygiene check next to ns_contamination_check's
    cross-CORPUS version.

    Shape: ONE corpus explode into ONE keyed aggregate (per-gram
    eval/train presence flags via max — the distinct+anti-join
    formulation would scan the corpus three times), then one scalar
    aggregate; the gram key is the only exchange."""
    docs = T(spark, sf_dir, "documents")
    fold = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 14), 16, 10)
        .cast("long") % 5
    ).cast("int")
    toks = F.split(F.trim(F.col("text")), " ")
    g = (
        docs.select(fold.alias("_side"), toks.alias("_w"))
        .where(F.size("_w") >= 3)
        .select(
            "_side",
            "_w",
            F.explode(F.sequence(F.lit(1), F.size("_w") - 2)).alias("pos"),
        )
        .select(
            "_side",
            F.concat_ws(" ", F.expr("slice(_w, pos, 3)")).alias("g"),
        )
    )
    # ONE keyed aggregate computes both sides' presence per gram (a
    # distinct + anti-join formulation scans and explodes the corpus
    # three times — the groupBy(max flags) form is a single explode +
    # single exchange, and the novelty counts are then one scalar agg)
    flags = g.groupBy("g").agg(
        F.max((F.col("_side") == 0).cast("int")).alias("_in_eval"),
        F.max((F.col("_side") != 0).cast("int")).alias("_in_train"),
    )
    return flags.agg(
        F.sum("_in_eval").alias("n_eval_grams"),
        F.sum(
            F.col("_in_eval") * (F.lit(1) - F.col("_in_train"))
        ).alias("n_novel"),
    ).select(
        "n_eval_grams",
        "n_novel",
        F.round(
            F.col("n_novel").cast("double") / F.col("n_eval_grams"), 6
        ).alias("novelty_frac"),
    )


@query(
    "ns_typo_pairs",
    oracle="""
    WITH base AS (
      SELECT DISTINCT unnest(string_split(trim(text), ' ')) AS w
      FROM documents
    ),
    muts AS (
      SELECT DISTINCT
             (CASE WHEN substr(w0, 1, 1) = 'q' THEN 'z' ELSE 'q' END)
             || substr(w0, 2) AS w
      FROM (SELECT string_split(trim(text), ' ')[1] AS w0
            FROM documents WHERE doc_id < 50)
    ),
    v AS (SELECT w FROM base UNION SELECT w FROM muts)
    SELECT a.w AS w_a, b.w AS w_b, CAST(1 AS INT) AS lev
    FROM v a JOIN v b ON a.w < b.w AND levenshtein(a.w, b.w) = 1
    """,
    tags=("northstar", "text", "linkage", "curation"),
)
def ns_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-pair mining over the corpus vocabulary via the FastSS
    deletion neighborhood (operators/linkage.fastss_pairs): every
    distinct-word pair at edit distance exactly 1, found through a
    variant EQUI-JOIN + exact verify — the scale path next to
    er_blocked_matches' blocked quadratic (the DuckDB oracle IS the
    quadratic levenshtein join, so the asymmetry is the point).  The
    synthetic vocabulary has no natural lev-1 pairs, so typos are
    PLANTED deterministically (first token of each doc_id < 50 with
    its first character substituted — the dedup gates' planting
    pattern), reproduced identically in the oracle."""
    from ..operators import linkage as L

    docs = T(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    base = docs.select(F.explode(toks).alias("w"))
    w0 = F.element_at(toks, 1)
    muts = docs.where(F.col("doc_id") < 50).select(
        F.concat(
            F.when(F.substring(w0, 1, 1) == "q", F.lit("z")).otherwise(
                F.lit("q")
            ),
            F.expr("substring(element_at(split(trim(text), ' '), 1), 2)"),
        ).alias("w")
    )
    vocab = base.unionByName(muts)
    return L.fastss_pairs(vocab)


@query(
    "ns_curation_funnel",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
      FROM documents
    ),
    clf AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(((CAST('0x' || substr(md5(w), 1, 14) AS BIGINT) % 4096)
                  * 2654435761) % 1048576) AS BIGINT) AS sx
      FROM tok GROUP BY doc_id
    ),
    q AS (
      SELECT doc_id, n_tokens FROM clf
      WHERE round(1.0 / (1.0 + exp(-4.0 *
              ((CAST(sx AS DOUBLE) / 1048576.0 - 0.5 * n_tokens)
               / n_tokens))), 6) >= 0.5
    ),
    sig AS (
      SELECT d.doc_id, d.n_chars, q.n_tokens,
             md5(array_to_string(list_sort(list_distinct(
                  string_split(trim(d.text), ' '))), ' ')) AS s
      FROM documents d JOIN q USING (doc_id)
    ),
    canon AS (
      SELECT doc_id, n_chars, n_tokens FROM (
        SELECT *, row_number() OVER (PARTITION BY s
                    ORDER BY n_chars DESC, doc_id) AS rn
        FROM sig
      ) WHERE rn = 1
    ),
    len_f AS (
      SELECT doc_id, n_chars FROM canon
      WHERE n_tokens BETWEEN 20 AND 80
    ),
    stages AS (
      SELECT 1 AS stage, 'input' AS name,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars_total
      FROM documents
      UNION ALL
      SELECT 2, 'quality_clf', CAST(count(*) AS BIGINT),
             CAST(sum(d.n_chars) AS BIGINT)
      FROM q JOIN documents d USING (doc_id)
      UNION ALL
      SELECT 3, 'dedup_canonical', CAST(count(*) AS BIGINT),
             CAST(sum(n_chars) AS BIGINT)
      FROM canon
      UNION ALL
      SELECT 4, 'length_window', CAST(count(*) AS BIGINT),
             CAST(sum(n_chars) AS BIGINT)
      FROM len_f
    )
    SELECT CAST(stage AS INT) AS stage, name, n_docs, n_chars_total
    FROM stages
    """,
    tags=("northstar", "curation", "pipeline"),
)
def ns_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END curation pipeline as one audited query — the
    composition a user of this engine actually runs, with the funnel
    report every production curation job ships: input → classifier
    quality gate (hashed_linear_score keep) → near-dup
    canonicalization (token-set signature, best-quality member
    survives) → length window (20–80 tokens), each stage emitting
    (n_docs, n_chars_total).  Every component is individually
    oracled elsewhere (ns_quality_classifier, ns_dedup_canonical);
    this gate pins their COMPOSITION — stage order matters (dedup
    groups form among quality survivors only) and the oracle
    reproduces the whole chain.

    Shape (r14, guide §2.4 remove redundant passes): the classifier
    explode/sum and the signature window each run ONCE — stages 2–4
    are conditional aggregates over the single windowed frame (stage 2
    counts every quality survivor, stage 3 the rn=1 rows, stage 4 the
    rn=1 rows inside the length window) stacked into rows, so the
    pre-r14 shape's re-evaluation of the classifier per stage (3×) and
    the window per stage (2×) is gone.  Stage 1 is the only other
    corpus pass (a plain count/sum over the raw table).  Same rows
    out, same types — the aggregates are the same expressions over
    the same frames, just computed in one pass."""
    from ..operators import text as XT

    docs = T(spark, sf_dir, "documents")
    scored = XT.hashed_linear_score(docs).where(F.col("keep"))
    q = docs.join(
        scored.select("doc_id", "n_tokens"), "doc_id"
    )
    sig = F.md5(
        F.concat_ws(
            " ",
            F.array_sort(
                F.array_distinct(F.split(F.trim(F.col("text")), " "))
            ),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("s").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    wq = q.select("doc_id", "n_chars", "n_tokens", sig.alias("s")).withColumn(
        "rn", F.row_number().over(w)
    )
    canon = F.col("rn") == 1
    len_f = canon & F.col("n_tokens").between(20, 80)

    def _cnt(cond):
        # count(), not sum(when...otherwise(0)): sum over ZERO rows is
        # NULL, so on a degenerate corpus with no quality survivors the
        # stage-3/4 n_docs would read NULL where the pre-r14 per-frame
        # count read 0 (ADVICE r14).  count never returns NULL and is
        # value-identical on every non-empty frame.
        return F.count(F.when(cond, F.lit(1)))

    def _chars(cond):
        return F.sum(F.when(cond, F.col("n_chars")))

    folded = wq.agg(
        F.count(F.lit(1)).alias("d2"),
        F.sum("n_chars").alias("c2"),
        _cnt(canon).alias("d3"),
        _chars(canon).alias("c3"),
        _cnt(len_f).alias("d4"),
        _chars(len_f).alias("c4"),
    ).selectExpr(
        "inline(array("
        "struct(int(2) as stage, 'quality_clf' as name, "
        "  bigint(d2) as n_docs, c2 as n_chars_total), "
        "struct(int(3) as stage, 'dedup_canonical' as name, "
        "  bigint(d3) as n_docs, c3 as n_chars_total), "
        "struct(int(4) as stage, 'length_window' as name, "
        "  bigint(d4) as n_docs, c4 as n_chars_total)))"
    )
    stage1 = docs.agg(
        F.lit(1).cast("int").alias("stage"),
        F.lit("input").alias("name"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars_total"),
    ).select("stage", "name", "n_docs", "n_chars_total")
    return stage1.unionByName(folded)


@query(
    "ns_oov_curve",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents
    ),
    freq AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY w),
    ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, w) AS rk FROM freq
    ),
    tot AS (SELECT CAST(sum(f) AS BIGINT) AS n_total FROM freq),
    ks AS (SELECT unnest([5, 10, 20, 30]) AS k)
    SELECT CAST(k AS INT) AS vocab_k,
           CAST((SELECT sum(f) FROM ranked WHERE rk <= k) AS BIGINT)
             AS covered,
           n_total,
           round(CAST((SELECT sum(f) FROM ranked WHERE rk <= k)
                      AS DOUBLE) / n_total, 6) AS coverage,
           round(1.0 - CAST((SELECT sum(f) FROM ranked WHERE rk <= k)
                            AS DOUBLE) / n_total, 6) AS oov_rate
    FROM ks, tot
    """,
    tags=("northstar", "text", "tokenizer"),
)
def ns_oov_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary COVERAGE curve — the tokenizer-design metric: for
    vocab sizes k ∈ {5, 10, 20, 30} (top-k tokens by corpus
    frequency, ties by token), the fraction of all token occurrences
    covered and the complementary OOV rate.  This is the curve that
    sizes a vocabulary (coverage elbow) and predicts UNK pressure.

    Shape: ONE corpus explode into the token-frequency aggregate; the
    frequency relation is vocabulary-sized, ranked by the distributed
    global rank (total order: count desc, token asc — never a
    single-partition window), and the curve is a ≤4-row broadcast
    join over cumulative integer sums; the only double math is the
    final rounded division."""
    from ..operators.ranking import global_rank

    d = T(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    ranked = global_rank(
        freq, [F.col("f").desc(), F.col("w")], rank_col="rk", num_partitions=4
    )
    tot = freq.agg(F.sum("f").alias("n_total"))
    ks = d.sparkSession.createDataFrame(
        [(5,), (10,), (20,), (30,)], "vocab_k int"
    )
    cov = (
        ks.join(ranked, F.col("rk") <= F.col("vocab_k"))
        .groupBy("vocab_k")
        .agg(F.sum("f").alias("covered"))
    )
    return cov.join(F.broadcast(tot)).select(
        "vocab_k",
        "covered",
        "n_total",
        F.round(
            F.col("covered").cast("double") / F.col("n_total"), 6
        ).alias("coverage"),
        F.round(
            1.0 - F.col("covered").cast("double") / F.col("n_total"), 6
        ).alias("oov_rate"),
    )


# --------------------------------------------------------------------------
# Ledgered pipeline run (curation.run_curation end-to-end gate)
# --------------------------------------------------------------------------

from .northstar_queries import _LANG_PRED_SQL, _LANG_SCORE_SQL  # noqa: E402

_CUR_FUNNEL_SQL = f"""
    WITH g AS (
      SELECT doc_id, text, n_chars
      FROM (
        SELECT doc_id, text, n_chars,
               string_split(trim(text), ' ') AS w,
               length(trim(text)) AS nc
        FROM documents
      )
      WHERE CAST(len(w) AS BIGINT) BETWEEN 20 AND 100000
        AND (CAST(nc AS DOUBLE) - (CAST(len(w) AS DOUBLE) - 1))
              / CAST(len(w) AS DOUBLE) BETWEEN 4.0 AND 10.0
        AND CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                 AS DOUBLE) / CAST(len(w) AS DOUBLE) >= 0.8
        AND CAST(len(list_intersect(list_distinct(w),
                 ['the','a','of','and','to'])) AS BIGINT) >= 2
    ),
    lsc AS (
      SELECT doc_id, text, n_chars,
{_LANG_SCORE_SQL}
      FROM g
    ),
    l AS (
      SELECT doc_id, text, n_chars FROM lsc
      WHERE {_LANG_PRED_SQL} = 'en'
    ),
    dd AS (
      SELECT doc_id, text, n_chars FROM (
        SELECT *, row_number() OVER (
          PARTITION BY md5(array_to_string(list_sort(list_distinct(
            string_split(trim(text), ' '))), ' '))
          ORDER BY n_chars DESC, doc_id) AS rn
        FROM l
      ) WHERE rn = 1
    ),
    probe AS (
      SELECT DISTINCT
             md5(array_to_string(string_split(trim(text), ' ')[1:5], ' '))
               AS fp
      FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '05'
    ),
    ct AS (
      SELECT doc_id, text, n_chars FROM dd
      WHERE md5(array_to_string(string_split(trim(text), ' ')[1:5], ' '))
            NOT IN (SELECT fp FROM probe)
    ),
    sm AS (
      SELECT doc_id, text FROM ct
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'c0'
    ),
    tok AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT)
               AS n_tok
      FROM sm
    ),
    counts AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS c0,
             (SELECT CAST(count(*) AS BIGINT) FROM g)  AS c1,
             (SELECT CAST(count(*) AS BIGINT) FROM l)  AS c2,
             (SELECT CAST(count(*) AS BIGINT) FROM dd) AS c3,
             (SELECT CAST(count(*) AS BIGINT) FROM ct) AS c4,
             (SELECT n_docs FROM tok) AS c5,
             (SELECT (n_tok - 1) // 2048 + 1 FROM tok) AS c6
    )
    SELECT CAST(stage AS INT) AS stage, name, n_in, n_out FROM (
      SELECT 1 AS stage, 'gopher_rules' AS name, c0 AS n_in, c1 AS n_out
      FROM counts
      UNION ALL SELECT 2, 'lang_filter', c1, c2 FROM counts
      UNION ALL SELECT 3, 'dedup_canonical', c2, c3 FROM counts
      UNION ALL SELECT 4, 'contamination', c3, c4 FROM counts
      UNION ALL SELECT 5, 'sample', c4, c5 FROM counts
      UNION ALL SELECT 6, 'shards', c5, c6 FROM counts
    )
"""


@query(
    "cur_pipeline_run",
    oracle=_CUR_FUNNEL_SQL,
    tags=("northstar", "curation", "pipeline", "ledger"),
)
def cur_pipeline_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 6-stage ledgered DAG contract run END-TO-END
    over the curation chain (curation.run_curation): gopher rules →
    lang filter → near-dup canonicalization → contamination scrub →
    deterministic sample → training shards, each stage materialized
    and committed with a catalog ledger row exactly like the
    reference's per-stage statuses (dl_fmwrk_dag_template.py:39-113,
    dataIngestionUtils.py:240-242).  The query RUNS the pipeline in a
    scratch workspace — shards actually written, validated and then
    discarded — and returns the LEDGER's funnel (stage, name, n_in,
    n_out); the oracle recomputes every stage's cardinality from the
    corpus, so a stage silently dropping/duplicating docs, breaking
    the chain (n_in(k+1) != n_out(k)), or a shard-count drift all
    hash-mismatch.  Crash-resume semantics are pinned separately by
    tests/test_curation_pipeline.py (ledger row = commit point,
    byte-identical shards on resume)."""
    import shutil
    import tempfile

    from ..catalog import Catalog
    from ..curation import LEDGER_TABLE, CurationSpec, run_curation

    docs = T(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="cur_run_")
    try:
        cat = Catalog(spark, f"{work}/cat")
        spec = CurationSpec(run_id="gate", shard_budget=2048)
        run_curation(cat, spec, docs, f"{work}/runs")
        out = (
            cat.read(LEDGER_TABLE)
            .where(
                (F.col("run_id") == "gate")
                & (F.col("status") == "succeeded")
            )
            .select("stage", "name", "n_in", "n_out")
            .localCheckpoint()  # pin before the workspace is removed
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# Incremental delta-batch curation (curation.run_curation_incremental gate)
# --------------------------------------------------------------------------

_CUR_INC_SQL = f"""
    WITH raw AS (
      SELECT doc_id, text, n_chars, CAST(doc_id % 3 AS INT) AS b
      FROM documents
    ),
    g AS (
      SELECT doc_id, text, n_chars, b
      FROM (
        SELECT doc_id, text, n_chars, b,
               string_split(trim(text), ' ') AS w,
               length(trim(text)) AS nc
        FROM raw
      )
      WHERE CAST(len(w) AS BIGINT) BETWEEN 20 AND 100000
        AND (CAST(nc AS DOUBLE) - (CAST(len(w) AS DOUBLE) - 1))
              / CAST(len(w) AS DOUBLE) BETWEEN 4.0 AND 10.0
        AND CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                 AS DOUBLE) / CAST(len(w) AS DOUBLE) >= 0.8
        AND CAST(len(list_intersect(list_distinct(w),
                 ['the','a','of','and','to'])) AS BIGINT) >= 2
    ),
    lsc AS (
      SELECT doc_id, text, n_chars, b,
{_LANG_SCORE_SQL}
      FROM g
    ),
    l AS (
      SELECT doc_id, text, n_chars, b FROM lsc
      WHERE {_LANG_PRED_SQL} = 'en'
    ),
    nv AS (
      SELECT doc_id, text, n_chars, b FROM (
        SELECT *, row_number() OVER (
          PARTITION BY md5(array_to_string(list_sort(list_distinct(
            string_split(trim(text), ' '))), ' '))
          ORDER BY b, n_chars DESC, doc_id) AS rn
        FROM l
      ) WHERE rn = 1
    ),
    probe AS (
      SELECT md5(array_to_string(string_split(trim(text), ' ')[1:5], ' '))
               AS fp,
             CAST(min(b) AS INT) AS pb
      FROM raw
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '05'
      GROUP BY 1
    ),
    ct AS (
      SELECT n.doc_id, n.text, n.n_chars, n.b
      FROM nv n
      LEFT JOIN probe p
        ON md5(array_to_string(string_split(trim(n.text), ' ')[1:5], ' '))
           = p.fp
      WHERE p.fp IS NULL OR p.pb > n.b
    ),
    sm AS (
      SELECT doc_id, b FROM ct
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'c0'
    ),
    spine AS (SELECT DISTINCT b FROM raw),
    c0 AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM raw GROUP BY b),
    c1 AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY b),
    c2 AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM l GROUP BY b),
    c3 AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM nv GROUP BY b),
    c4 AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM ct GROUP BY b),
    c5 AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM sm GROUP BY b),
    f AS (
      SELECT s.b,
             CAST(coalesce(c0.n, 0) AS BIGINT) AS n0,
             CAST(coalesce(c1.n, 0) AS BIGINT) AS n1,
             CAST(coalesce(c2.n, 0) AS BIGINT) AS n2,
             CAST(coalesce(c3.n, 0) AS BIGINT) AS n3,
             CAST(coalesce(c4.n, 0) AS BIGINT) AS n4,
             CAST(coalesce(c5.n, 0) AS BIGINT) AS n5
      FROM spine s
      LEFT JOIN c0 ON c0.b = s.b
      LEFT JOIN c1 ON c1.b = s.b
      LEFT JOIN c2 ON c2.b = s.b
      LEFT JOIN c3 ON c3.b = s.b
      LEFT JOIN c4 ON c4.b = s.b
      LEFT JOIN c5 ON c5.b = s.b
    )
    SELECT CAST(b AS INT) AS batch, CAST(stage AS INT) AS stage,
           name, n_in, n_out
    FROM (
      SELECT b, 1 AS stage, 'gopher_rules' AS name, n0 AS n_in, n1 AS n_out
      FROM f
      UNION ALL SELECT b, 2, 'lang_filter', n1, n2 FROM f
      UNION ALL SELECT b, 3, 'dedup_novel', n2, n3 FROM f
      UNION ALL SELECT b, 4, 'contamination', n3, n4 FROM f
      UNION ALL SELECT b, 5, 'sample', n4, n5 FROM f
      UNION ALL SELECT b, 6, 'publish', n5, n5 FROM f
    )
"""


@query(
    "cur_incremental_run",
    oracle=_CUR_INC_SQL,
    tags=("northstar", "curation", "pipeline", "ledger", "incremental"),
)
def cur_incremental_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-batch curation run END-TO-END
    (curation.run_curation_incremental): the corpus arrives as three
    batches (doc_id % 3), each curated against the pipeline's
    ACCUMULATED state — first-seen-wins novelty via a versioned sig
    registry, cumulative-probe contamination with no revocation of
    published docs, deterministic per-doc sampling — and published as
    an immutable versioned segment, with the reference's per-stage
    ledger statuses recorded per batch as one atomic commit
    (dl_fmwrk_dag_template.py:39-113, dataIngestionUtils.py:240-247 —
    the watermark-driven incremental posture of the reference's
    ext_method='incremental' assets applied to the curation chain).
    The query RUNS all three batches in a scratch workspace, replays
    batch 0 to prove committed-batch idempotency (any drift raises),
    and returns the LEDGER's per-batch funnel (batch, stage, name,
    n_in, n_out).  The oracle recomputes every stage's per-batch
    cardinality from first principles — including the cross-batch
    first-seen-wins rule as ONE window (ORDER BY batch, n_chars DESC,
    doc_id) and the min-probe-batch contamination rule — so any drift
    in the incremental state machinery hash-mismatches.  At 100 TB
    each batch touches only the delta plus two pruned 32 B fingerprint
    columns of append-only stores."""
    import shutil
    import tempfile

    from ..catalog import Catalog
    from ..curation import (
        LEDGER_TABLE,
        CurationSpec,
        run_curation_incremental,
    )

    docs = T(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    work = tempfile.mkdtemp(prefix="cur_inc_")
    try:
        cat = Catalog(spark, f"{work}/cat")
        spec = CurationSpec(run_id="inc", shard_budget=2048)
        funnels = {}
        for b in range(3):
            batch = docs.where(F.col("doc_id") % 3 == b)
            res = run_curation_incremental(
                cat, spec, batch, f"{work}/store", b
            )
            funnels[b] = res["funnel"]
        # committed-batch idempotency: replaying batch 0 must return
        # the SAME funnel from the ledger without touching the stores
        replay = run_curation_incremental(
            cat, spec, docs.where(F.col("doc_id") % 3 == 0),
            f"{work}/store", 0,
        )
        if not replay["replayed"] or replay["funnel"] != funnels[0]:
            raise RuntimeError(
                "cur_incremental_run: batch-0 replay diverged from its "
                f"committed funnel ({replay} vs {funnels[0]})"
            )
        out = (
            cat.read(LEDGER_TABLE)
            .where(
                F.col("run_id").startswith("inc@")
                & (F.col("status") == "succeeded")
            )
            .select(
                F.regexp_extract("run_id", r"@b(\d+)$", 1)
                .cast("int")
                .alias("batch"),
                "stage",
                "name",
                "n_in",
                "n_out",
            )
            .localCheckpoint()  # pin before the workspace is removed
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out
