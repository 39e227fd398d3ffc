"""Unit tests for graph / linkage / sketch operators on known micro
graphs — semantics checks the oracle-parity sweep can't express
(conservation properties, hand-countable triangles, sketch bounds)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_datalake_framework_ingestion_spark.operators import graph as G
from aws_datalake_framework_ingestion_spark.operators import linkage as L
from aws_datalake_framework_ingestion_spark.operators import sketches as SK


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src: long, dst: long")


def test_pagerank_uniform_on_symmetric_cycle(spark):
    # 4-cycle, bidirected: perfectly symmetric ⇒ every node keeps the
    # initial mass exactly (base + 85% of scale = scale).
    und = [(0, 1), (1, 2), (2, 3), (3, 0)]
    edges = _edges(spark, und + [(b, a) for a, b in und])
    out = {r["node"]: r["r"] for r in G.pagerank_int(edges, iters=5).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert len(set(out.values())) == 1
    assert out[0] == 10**9


def test_pagerank_star_center_dominates(spark):
    # star: center 0 ↔ leaves 1..5; center must outrank every leaf
    und = [(0, i) for i in range(1, 6)]
    edges = _edges(spark, und + [(b, a) for a, b in und])
    out = {r["node"]: r["r"] for r in G.pagerank_int(edges, iters=5).collect()}
    assert out[0] > max(out[i] for i in range(1, 6))


def test_triangle_count_known_graph(spark):
    # K4 has 4 triangles; plus a pendant edge that adds none.
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = spark.createDataFrame(k4 + [(3, 9)], "a: long, b: long")
    assert G.triangle_count(edges).collect()[0]["n_triangles"] == 4


def test_triangle_count_triangle_free(spark):
    # bipartite (no odd cycles) ⇒ zero triangles
    edges = spark.createDataFrame(
        [(0, 10), (0, 11), (1, 10), (1, 11)], "a: long, b: long"
    )
    assert G.triangle_count(edges).collect()[0]["n_triangles"] == 0


def test_blocked_matches_blocks_and_threshold(spark):
    names = spark.createDataFrame(
        [("red widget",), ("red gadget",), ("red w1dget",), ("blue widget",)],
        "n: string",
    )
    out = L.blocked_matches(
        names,
        key_col="n",
        name_col="n",
        block_expr=F.split(F.col("n"), " ").getItem(0),
        max_distance=3,
    ).collect()
    pairs = {(r["name_a"], r["name_b"]): r["distance"] for r in out}
    # same block, within distance ("gadget"→"widget" is 2 subs: g→w, a→i)
    assert pairs[("red gadget", "red widget")] == 2
    assert pairs[("red w1dget", "red widget")] == 1
    # "blue widget" is 1 edit from "red widget" worth 4 — but more to
    # the point it's in another block, so it never surfaces
    assert not any("blue" in a or "blue" in b for a, b in pairs)


def test_blocked_matches_block_cap(spark):
    names = spark.createDataFrame(
        [(f"dup name{i % 2}",) for i in range(40)], "n: string"
    ).distinct()
    capped = L.blocked_matches(
        names,
        key_col="n",
        name_col="n",
        block_expr=F.split(F.col("n"), " ").getItem(0),
        max_distance=3,
        max_block_size=1,
    )
    assert capped.count() == 0  # block of 2 > cap ⇒ dropped entirely


def test_countmin_overestimates_never_under(spark):
    ev = spark.range(0, 2000).select(
        (F.col("id") % 37).alias("k")  # 37 keys, ~54 each
    )
    sketch = SK.countmin_sketch(ev, "k", depth=4, width=16)
    est = SK.countmin_estimate(
        ev.select("k").distinct(), sketch, "k", depth=4, width=16
    )
    exact = ev.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    joined = est.join(exact, "k").collect()
    assert len(joined) == 37
    for r in joined:
        assert r["est"] >= r["c"]  # CMS never underestimates
    # width 16 < 37 keys forces collisions: some overestimate must exist
    assert any(r["est"] > r["c"] for r in joined)


def test_countmin_absent_probe_estimates_zero(spark):
    """A probe key the sketched stream never saw gets est=0 (left join
    + coalesce), not an inflated min over its nonempty buckets and not
    a dropped row."""
    ev = spark.range(0, 100).select((F.col("id") % 3).alias("k"))
    sketch = SK.countmin_sketch(ev, "k", depth=4, width=512)
    probes = spark.createDataFrame([(0,), (999,)], ["k"])
    got = {r["k"]: r["est"] for r in
           SK.countmin_estimate(probes, sketch, "k", depth=4, width=512).collect()}
    assert got[999] == 0
    assert got[0] >= 34


def test_countmin_null_keys_excluded(spark):
    """NULL keys are excluded from both sketch and probes — concat_ws
    would otherwise collapse all NULLs into one phantom key, diverging
    from the DuckDB '||' NULL-propagation semantics."""
    ev = spark.createDataFrame([(1,), (1,), (None,), (None,)], "k int")
    sketch = SK.countmin_sketch(ev, "k", depth=2, width=64)
    assert sketch.agg(F.sum("cnt")).collect()[0][0] == 2 * 2  # depth × non-null rows
    est = SK.countmin_estimate(ev.select("k").distinct(), sketch, "k", depth=2, width=64)
    rows = est.collect()
    assert len(rows) == 1 and rows[0]["k"] == 1 and rows[0]["est"] == 2


def test_countmin_weight_contract(spark):
    """ADVICE r14: weight_col's count-equivalence only holds for
    non-null integer weights — NULL weights must raise at execution
    (not be silently skipped by sum), fractional weight types must
    raise at plan time (not truncate after summing)."""
    import pytest

    # equivalence: pre-aggregated (key, cnt) == raw-row sketch
    ev = spark.range(0, 500).select((F.col("id") % 7).alias("k"))
    raw = SK.countmin_sketch(ev, "k", depth=3, width=64)
    agg = ev.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    wtd = SK.countmin_sketch(agg, "k", depth=3, width=64, weight_col="c")
    assert raw.exceptAll(wtd).count() == 0 and wtd.exceptAll(raw).count() == 0

    # NULL weight: loud execution-time failure, never a silent skip
    bad = spark.createDataFrame([(1, 3), (2, None)], "k int, c int")
    with pytest.raises(Exception, match="NULL weight"):
        SK.countmin_sketch(bad, "k", depth=2, width=16, weight_col="c").collect()

    # fractional weight type: plan-time TypeError
    frac = spark.createDataFrame([(1, 1.5)], "k int, c double")
    with pytest.raises(TypeError, match="integer weights"):
        SK.countmin_sketch(frac, "k", depth=2, width=16, weight_col="c")


def test_countmin_exact_when_wide(spark):
    # width ≫ keys ⇒ w.h.p. no collisions in some row ⇒ est == exact
    ev = spark.range(0, 300).select((F.col("id") % 5).alias("k"))
    sketch = SK.countmin_sketch(ev, "k", depth=4, width=512)
    est = SK.countmin_estimate(
        ev.select("k").distinct(), sketch, "k", depth=4, width=512
    )
    for r in est.collect():
        assert r["est"] == 60


def test_pagerank_float_matches_dense_power_iteration(spark):
    """Float PageRank with dangling redistribution vs a dense numpy
    power iteration on the same 7-node graph (two danglers, one
    isolated-ish sink chain): agreement to 1e-9 after 25 rounds."""
    import numpy as np

    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (5, 2), (5, 6)]
    # nodes 4 and 6 are dangling (no out-edges)
    edges = _edges(spark, pairs)
    got = {
        r["node"]: r["r"] for r in G.pagerank(edges, iters=25).collect()
    }

    n, d = 7, 0.85
    out = {u: [v for a, v in pairs if a == u] for u in range(n)}
    r = np.ones(n)
    for _ in range(25):
        nxt = np.full(n, 1 - d)
        dang = sum(r[u] for u in range(n) if not out[u])
        for u in range(n):
            for v in out[u]:
                nxt[v] += d * r[u] / len(out[u])
        nxt += d * dang / n
        r = nxt
    assert set(got) == set(range(n))
    for u in range(n):
        assert abs(got[u] - r[u]) < 1e-9, (u, got[u], r[u])
    # mass conserved by redistribution
    assert abs(sum(got.values()) - n) < 1e-9


def test_pagerank_float_without_danglers_tracks_int_variant(spark):
    """On a graph where every node has out-edges, the float variant
    must agree with the integer-exact variant to ~div-truncation
    precision (the int variant leaks ≤1 unit per div, scale 1e9)."""
    und = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    edges = _edges(spark, und + [(b, a) for a, b in und])
    flt = {r["node"]: r["r"] for r in G.pagerank(edges, iters=6).collect()}
    scaled = {
        r["node"]: r["r"] / 1e9
        for r in G.pagerank_int(edges, iters=6).collect()
    }
    for u in flt:
        assert abs(flt[u] - scaled[u]) < 1e-6


def test_pagerank_float_prev_iterates_contract(spark):
    """with_prev exposes the last three iterates; the L1 delta must
    contract by at least the damping factor (the gate invariant)."""
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3)]  # 3 is dangling
    edges = _edges(spark, pairs)
    rows = G.pagerank(edges, iters=10, with_prev=True).collect()
    l1a = sum(abs(r["r"] - r["r_prev"]) for r in rows)
    l1b = sum(abs(r["r_prev"] - r["r_prev2"]) for r in rows)
    assert l1a <= 0.85 * l1b + 1e-12


def test_khop_reach_chain_and_truncation(spark):
    """Hand-check on a 6-node chain 0-1-2-3-4-5 (bidirected), seeds
    {0}: hops are exact distances and k=3 truncates the tail."""
    from aws_datalake_framework_ingestion_spark.operators.graph import khop_reach

    chain = [(i, i + 1) for i in range(5)]
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {r["node"]: r["hop"] for r in khop_reach(edges, seeds, k=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}

    # two seeds: min-hop semantics (node 3 is hop-2 from node 5)
    seeds2 = spark.createDataFrame([(0,), (5,)], ["node"])
    got2 = {r["node"]: r["hop"] for r in khop_reach(edges, seeds2, k=3).collect()}
    assert got2 == {0: 0, 5: 0, 1: 1, 4: 1, 2: 2, 3: 2}


def test_ppr_directed_sinks_and_edgeless_seed(spark):
    """ADVICE r4: on a DIRECTED graph, sink nodes (dst-only) must
    appear in the result with their inbound mass, and a seed with no
    out-edge must keep its teleport mass — neither may be silently
    dropped.  Hand-checked on 0->1->2 (2 is a sink) with seeds {0, 9}
    (9 has no edges at all)."""
    from aws_datalake_framework_ingestion_spark.operators.graph import ppr_int

    edges = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    seeds = spark.createDataFrame([(0,), (9,)], ["node"])
    scale, damp, base = 10**9, 85, (100 - 85) * 10**9 // 100
    got = {r["node"]: r["r"] for r in ppr_int(edges, seeds, iters=2).collect()}

    # hand computation (integer truncating division):
    # r0: 0 -> scale, 9 -> scale, others 0
    # r1: 0 -> base; 1 -> 85*(scale div 1) div 100; 2 -> 0; 9 -> base
    r1_1 = 85 * (scale // 1) // 100
    # r2: 0 -> base; 1 -> 85*(base div 1) div 100; 2 -> 85*(r1_1 div 1) div 100
    want = {
        0: base,
        1: 85 * (base // 1) // 100,
        2: 85 * (r1_1 // 1) // 100,
        9: base,
    }
    assert got == want
