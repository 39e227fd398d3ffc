"""Graph / linkage / sketch coverage: PageRank, triangle counting,
blocked entity resolution, count-min heavy hitters, PII scrubbing.

All five are oracle-backed.  PageRank is deliberately computed in
scaled-integer arithmetic (BIGINT + truncating division) so a
5-iteration run is bit-exact against the unrolled-CTE DuckDB oracle —
the float formulation would be partition-order dependent and only
rows-checkable.  Reference parity: the reference has no graph/sketch
surface (its pipeline stops at table extraction, ingestion/utils/
dataIngestionUtils.py:169-194); these are engine extensions for the
curation workloads SURVEY.md §2 lists as first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import graph as G
from ..operators import linkage as L
from ..operators import sketches as SK
from ._util import T
from .registry import query

# --------------------------------------------------------------------------
# PageRank (iterative, integer-exact)
# --------------------------------------------------------------------------

_PR_ITERS = 5
_PR_SCALE = 10**9
_PR_BASE = 15 * _PR_SCALE // 100


def _pagerank_oracle() -> str:
    head = f"""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    edges AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION ALL
      SELECT b AS src, a AS dst FROM pairs
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
    r0 AS (SELECT src AS node, CAST({_PR_SCALE} AS BIGINT) AS r FROM deg)"""
    steps = []
    for i in range(1, _PR_ITERS + 1):
        steps.append(
            f""",
    r{i} AS (
      SELECT e.dst AS node,
             CAST({_PR_BASE} + (85 * sum(r{i - 1}.r // d.outdeg)) // 100 AS BIGINT) AS r
      FROM edges e
      JOIN deg d ON e.src = d.src
      JOIN r{i - 1} ON e.src = r{i - 1}.node
      GROUP BY e.dst
    )"""
        )
    return head + "".join(steps) + f"\n    SELECT node, r AS pr FROM r{_PR_ITERS}"


@query("graph_pagerank", oracle=_pagerank_oracle(), tags=("graph", "iterative"))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-iteration PageRank over the bidirected customer↔supplier
    trade graph (nodes: custkey·2 / suppkey·2+1).  Scaled-integer
    arithmetic ⇒ bit-exact vs the unrolled recursive oracle; each
    iteration is one partitioned equi-join + keyed aggregation."""
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("a"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("b"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    ranks = G.pagerank_int(edges, iters=_PR_ITERS, scale=_PR_SCALE)
    return ranks.select("node", F.col("r").alias("pr"))


# --------------------------------------------------------------------------
# PageRank (float production variant: dangling-mass redistribution)
# --------------------------------------------------------------------------


@query(
    "graph_pagerank_dangling",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    SELECT CAST((SELECT count(DISTINCT c) FROM pairs)
              + (SELECT count(DISTINCT s) FROM pairs) AS BIGINT) AS n_nodes,
           CAST((SELECT count(DISTINCT s) FROM pairs) AS BIGINT) AS n_dangling,
           TRUE AS mass_ok, TRUE AS positive_ok, TRUE AS l1_contracts
    """,
    tags=("graph", "iterative"),
)
def graph_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Float PageRank with dangling-mass redistribution over the
    DIRECTED customer→supplier graph — every supplier node is dangling
    (no out-edges), the case ``pagerank_int`` excludes by contract.

    Float ranks are partition-order dependent at the ULP level, so the
    gate asserts tolerance booleans (within-tolerance oracle pattern,
    like agg_hll_mergeable) over invariants that hold at ANY scale:

    * mass_ok — redistribution conserves Σr = |V| (±1e-6·|V|); without
      dangling handling ~all mass leaks here (suppliers absorb it).
    * positive_ok — every rank ≥ (1-d), the teleport floor.
    * l1_contracts — ‖r_t−r_{t-1}‖₁ ≤ d·‖r_{t-1}−r_{t-2}‖₁ (+float
      slack): the contraction that guarantees geometric convergence.

    Exact integers (node/dangling counts) pin the graph shape; the
    numeric agreement with a dense power iteration is pinned to 1e-9
    in tests/test_graph.py.
    """
    from ..operators import graph as G

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("src"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
        )
        .distinct()
    )
    pr = G.pagerank(edges, iters=5, damp=0.85, with_prev=True)
    n = F.count(F.lit(1))
    return pr.agg(
        n.alias("n_nodes"),
        F.sum(F.when(F.col("node") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dangling"),
        (F.abs(F.sum("r") - n) < 1e-6 * n).alias("mass_ok"),
        (F.min("r") >= 0.15 - 1e-9).alias("positive_ok"),
        (
            F.sum(F.abs(F.col("r") - F.col("r_prev")))
            <= 0.85 * F.sum(F.abs(F.col("r_prev") - F.col("r_prev2")))
            + 1e-6 * n
        ).alias("l1_contracts"),
    )


# --------------------------------------------------------------------------
# Triangle counting (min-degree orientation)
# --------------------------------------------------------------------------


@query(
    "graph_triangles",
    oracle="""
    WITH e AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1
      JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.a = e1.a AND e1.b < e2.b
    JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
    """,
    tags=("graph",),
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the part co-purchase graph (parts sharing an
    order).  Spark side counts via min-degree orientation — out-degree
    bounded O(√|E|) so the wedge join survives hub skew; the oracle
    counts the same closed triples naively."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l2 = li.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("p2")
    )
    edges = (
        li.join(l2, "l_orderkey")
        .where(F.col("l_partkey") < F.col("p2"))
        .select(F.col("l_partkey").alias("a"), F.col("p2").alias("b"))
        .distinct()
    )
    return G.triangle_count(edges)


# --------------------------------------------------------------------------
# Entity resolution: blocked fuzzy name matching
# --------------------------------------------------------------------------


@query(
    "er_blocked_matches",
    oracle="""
    WITH nm AS (SELECT DISTINCT p_name AS n FROM part),
    b AS (SELECT n, string_split(n, ' ')[1] AS blk FROM nm)
    SELECT x.n AS name_a, y.n AS name_b,
           CAST(levenshtein(x.n, y.n) AS INT) AS distance
    FROM b x JOIN b y ON x.blk = y.blk AND x.n < y.n
    WHERE levenshtein(x.n, y.n) <= 3
    """,
    tags=("linkage",),
)
def er_blocked_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidates over the part-name vocabulary:
    block on the first name token (equi-join — never all-pairs), score
    candidates with exact edit distance ≤ 3."""
    names = T(spark, sf_dir, "part").select(
        F.col("p_name").alias("n")
    ).distinct()
    m = L.blocked_matches(
        names,
        key_col="n",
        name_col="n",
        block_expr=F.split(F.col("n"), " ").getItem(0),
        max_distance=3,
    )
    return m.select("name_a", "name_b", "distance")


# --------------------------------------------------------------------------
# Count-min sketch heavy hitters (portable-hash, integer-exact)
# --------------------------------------------------------------------------


@query(
    "sketch_countmin_topk",
    oracle="""
    WITH probes AS (
      SELECT user_id, r.i AS rw,
             CAST(CAST('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' ||
                  CAST(user_id AS VARCHAR)), 1, 14) AS BIGINT) % 64 AS INT) AS bucket
      FROM events, UNNEST([0, 1, 2, 3]) AS r(i)
    ),
    sketch AS (
      SELECT rw, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM probes GROUP BY rw, bucket
    ),
    keys AS (SELECT DISTINCT user_id, rw, bucket FROM probes),
    est AS (
      SELECT k.user_id, min(s.cnt) AS est
      FROM keys k JOIN sketch s ON k.rw = s.rw AND k.bucket = s.bucket
      GROUP BY k.user_id
    ),
    exact AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM events GROUP BY user_id
    )
    SELECT e.user_id, e.est, x.exact_cnt
    FROM est e JOIN exact x ON e.user_id = x.user_id
    ORDER BY e.est DESC, e.user_id
    LIMIT 10
    """,
    tags=("sketch",),
)
def sketch_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters by count-min estimate (4×64 sketch, portable md5
    hashes ⇒ the sketch itself is bit-identical across engines), with
    the exact count joined alongside.

    r14 shape (guide §2.3/§2.4): everything derives from ONE keyed
    aggregation of the stream.  The pre-r14 plan scanned events three
    times (sketch build, distinct keys, exact counts) and computed the
    4 md5 bucket hashes PER EVENT; now ``exact`` is the only pass over
    events, the sketch is built from (user_id, exact_cnt) via the
    operator's ``weight_col`` (bit-identical cnt: buckets depend only
    on the key), probes hash each distinct user once, and the
    est/exact join is co-partitioned (both sides descend from the same
    user_id aggregation — no extra exchange).  3 scans → 1,
    per-row hashing → per-key hashing; identical rows out."""
    ev = T(spark, sf_dir, "events")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    sketch = SK.countmin_sketch(
        exact, "user_id", depth=4, width=64, weight_col="exact_cnt"
    )
    est = SK.countmin_estimate(
        exact.select("user_id"), sketch, "user_id", depth=4, width=64
    )
    return (
        est.join(exact, "user_id")
        .orderBy(F.col("est").desc(), "user_id")
        .limit(10)
    )


# --------------------------------------------------------------------------
# PII scrubbing (regex redaction over semi-structured payloads)
# --------------------------------------------------------------------------


@query(
    "ns_pii_scrub",
    oracle="""
    WITH s AS (
      SELECT event_id,
             regexp_replace(
               regexp_replace(props, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+',
                              '<EMAIL>', 'g'),
               '[0-9]{2,}', '<NUM>', 'g') AS scrubbed,
             props
      FROM events
      WHERE event_id < 2000
    )
    SELECT event_id, scrubbed, (props <> scrubbed) AS changed FROM s
    """,
    tags=("northstar", "governance"),
)
def ns_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII redaction over event payloads: emails → <EMAIL>,
    digit runs (ids, phones) → <NUM>.  Pure JVM regexp_replace chain —
    one projection pass, no shuffle."""
    ev = T(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.col("props"), "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"
        ),
        "[0-9]{2,}",
        "<NUM>",
    )
    return ev.select(
        "event_id",
        scrubbed.alias("scrubbed"),
        (F.col("props") != scrubbed).alias("changed"),
    )


# --------------------------------------------------------------------------
# Connected components (general graph — reuses the dedup CC kernel)
# --------------------------------------------------------------------------


@query(
    "graph_cc",
    oracle="""
    WITH RECURSIVE
    e0 AS (
      SELECT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1
      JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    edges AS (
      SELECT a AS u, b AS v FROM e0
      UNION ALL
      SELECT b, a FROM e0
    ),
    reach AS (
      SELECT u AS id, v AS peer FROM edges
      UNION
      SELECT r.id, e.v FROM reach r JOIN edges e ON e.u = r.peer
    )
    SELECT id AS part_id, CAST(least(id, min(peer)) AS BIGINT) AS component_id
    FROM reach GROUP BY id
    """,
    tags=("graph",),
)
def graph_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the repeat-co-purchase graph (part
    pairs sharing ≥ 2 orders).  Reuses the min-label-propagation
    kernel from the dedup family (operators/dedup.dedup_clusters) —
    one keyed shuffle per round, early-stopped at the fixpoint;
    max_iters is raised because a general graph's diameter isn't the
    ≤3 of near-dup cliques.  Oracle: recursive-CTE transitive closure.
    """
    from ..operators import dedup as D

    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l2 = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("p2"))
    pairs = (
        li.join(l2, "l_orderkey")
        .where(F.col("l_partkey") < F.col("p2"))
        .groupBy(F.col("l_partkey").alias("a"), F.col("p2").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("a", "b")
    )
    cc = D.dedup_clusters(pairs, a_col="a", b_col="b", max_iters=100)
    return cc.select(
        F.col("doc_id").alias("part_id"),
        F.col("cluster_id").alias("component_id"),
    )


@query(
    "graph_degree_stats",
    oracle="""
    WITH e AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1
      JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    und AS (SELECT a AS v FROM e UNION ALL SELECT b FROM e),
    deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY v)
    SELECT CAST(length(bin(d)) - 1 AS INT) AS log2_bin,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(d) AS BIGINT) AS min_deg,
           CAST(max(d) AS BIGINT) AS max_deg
    FROM deg GROUP BY 1
    """,
    tags=("graph",),
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part co-purchase graph, log2-binned —
    the skew diagnostic every graph workload runs before choosing a
    partitioning (a heavy tail here is what the min-degree orientation
    in graph_triangles defends against).  Two keyed aggregations."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l2 = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("p2"))
    e = (
        li.join(l2, "l_orderkey")
        .where(F.col("l_partkey") < F.col("p2"))
        .select(F.col("l_partkey").alias("a"), F.col("p2").alias("b"))
        .distinct()
    )
    und = e.select(F.col("a").alias("v")).unionAll(e.select(F.col("b").alias("v")))
    deg = und.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    # floor(log2(d)) via binary-string length: exact integer logic —
    # ln(d)/ln(2) at exact powers of two is a cross-engine ULP hazard
    log2_bin = (F.length(F.bin(F.col("d"))) - 1).cast("int")
    return deg.groupBy(log2_bin.alias("log2_bin")).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("d").alias("min_deg"),
        F.max("d").alias("max_deg"),
    )


# --------------------------------------------------------------------------
# k-hop reachability (BFS with hop distances)
# --------------------------------------------------------------------------


@query(
    "graph_khop_reach",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    edges AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION ALL
      SELECT b AS src, a AS dst FROM pairs
    ),
    seeds AS (SELECT DISTINCT a AS node FROM pairs WHERE a % 200 = 0),
    s0 AS (SELECT node, 0 AS hop FROM seeds),
    s1 AS (
      SELECT node, min(hop) AS hop FROM (
        SELECT node, hop FROM s0
        UNION ALL
        SELECT e.dst, s0.hop + 1 FROM s0 JOIN edges e ON e.src = s0.node
      ) GROUP BY node
    ),
    s2 AS (
      SELECT node, min(hop) AS hop FROM (
        SELECT node, hop FROM s1
        UNION ALL
        SELECT e.dst, s1.hop + 1 FROM s1 JOIN edges e ON e.src = s1.node
      ) GROUP BY node
    ),
    s3 AS (
      SELECT node, min(hop) AS hop FROM (
        SELECT node, hop FROM s2
        UNION ALL
        SELECT e.dst, s2.hop + 1 FROM s2 JOIN edges e ON e.src = s2.node
      ) GROUP BY node
    )
    SELECT node, CAST(hop AS INT) AS hop FROM s3
    """,
    tags=("graph", "iterative"),
)
def graph_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop BFS reach from seed customers (custkey % 100 == 0) over
    the bidirected customer↔supplier trade graph, with min-hop
    distances.  Spark side is the frontier-optimized expansion
    (operators/graph.khop_reach: per-round work O(|frontier|·degree),
    settled nodes never re-shuffle); the oracle is the naive unrolled
    min-over-paths formulation — different algorithms, provably the
    same fixpoint, bit-equal output."""
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("a"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("b"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    seeds = pairs.where(F.col("a") % 200 == 0).select(
        F.col("a").alias("node")
    ).distinct()
    return G.khop_reach(edges, seeds, k=3)


def _ppr_oracle(iters: int = 3, scale: int = 10**9, damp_pct: int = 85) -> str:
    base = (100 - damp_pct) * scale // 100
    head = f"""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    edges AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION ALL
      SELECT b AS src, a AS dst FROM pairs
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
            FROM edges GROUP BY src),
    nodes AS (
      SELECT src AS node,
             CAST(CASE WHEN src % 200 = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS is_seed
      FROM deg
    ),
    r0 AS (SELECT node, CAST({scale} AS BIGINT) * is_seed AS r FROM nodes)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(
            f""",
    c{i} AS (
      SELECT e.dst AS node, sum(r{i - 1}.r // d.outdeg) AS cs
      FROM edges e
      JOIN deg d ON e.src = d.src
      JOIN r{i - 1} ON e.src = r{i - 1}.node
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT n.node,
             CAST({base} * n.is_seed
                  + (({damp_pct} * COALESCE(c{i}.cs, 0)) // 100)
               AS BIGINT) AS r
      FROM nodes n LEFT JOIN c{i} ON n.node = c{i}.node
    )"""
        )
    return head + "".join(steps) + f"\n    SELECT node, r AS ppr FROM r{iters}"


@query("graph_ppr_seeds", oracle=_ppr_oracle(), tags=("graph", "iterative"))
def graph_ppr_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PERSONALIZED PageRank from seed customers
    (custkey % 100 == 0) over the bidirected trade graph: teleport
    mass returns to the seeds, ranking every node by proximity to the
    seed set (seed-expansion retrieval).  Integer-scaled arithmetic,
    bit-exact vs the unrolled oracle (operators/graph.ppr_int)."""
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("a"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("b"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    seeds = (
        pairs.where(F.col("a") % 200 == 0)
        .select(F.col("a").alias("node"))
        .distinct()
    )
    ranks = G.ppr_int(edges, seeds, iters=3)
    return ranks.select("node", F.col("r").alias("ppr"))
