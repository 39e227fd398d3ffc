"""sf10 heavy-tail soak (VERDICT r10 item 1: prove the next scale
decade).  Runs the 15+ slowest-at-sf1 queries plus the streaming exec
triad on the DERIVED scratch/sf10 dataset (gen_sf10.py — lineitem
60M, documents 500k, events ~5.5M, embeddings 200k), with the same
strict bit-equality as soak_sf1.py against DuckDB oracles.

Queries whose ORACLE cannot complete at sf10 are verified
operator-side (timed) and noted — the operator's exactness carries
from the sf1/slice evidence; what sf10 stresses is shuffle sizing,
state stores, driver memory, and the iterative loops at another 10×.

Run:  nohup python3 scratch/soak_sf10.py > scratch/soak_sf10_r11.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from exactness import rows  # noqa: E402

SF10 = os.path.join("/root/repo", "scratch", "sf10")

HEAVY = [
    # sf1 heavy tail (slowest first: fail fast on the hard ones)
    "graph_triangles",
    "ts_rolling_zscore_outliers",
    "graph_cc",
    "ns_kneser_ney_bigrams",
    "agg_approx_distinct",
    "graph_pagerank_dangling",
    "graph_pagerank",
    "graph_khop_reach",
    "agg_corr_regression",
    "ns_ccnet_ppl_buckets",
    "ns_semdedup_recall_gate",
    "ns_embedding_dedup",
    # streaming exec triad (output modes) + the stateful pair
    "stream_exec_tumbling_hour",
    "stream_exec_append_watermark",
    "stream_exec_update_mode",
    "stream_exec_cdc_upsert",
    "stream_exec_interval_join",
    # r11 additions at their first scale decade
    "ns_pack_fixed_windows",
    "ns_pack_fixed_report",
    "cur_pipeline_run",
    "stream_exec_shard_append",
    # last: the exact all-pairs ground-truth kernel — per-shingle
    # counts grow ~10x per decade on the replica-derived corpus, so
    # this is the one genuinely quadratic attempt (killable without
    # losing the rest of the sweep)
    "ns_containment_pairs",
]

# Quadratic-BY-CONTRACT kernels: the exact all-pairs ground truth is
# Σ per-shingle counts², and the replica-derived corpus grows per-
# shingle counts linearly with scale — measured at sf10: >70 GB of
# shuffle, disk-death on a 78 GB-free host (twice).  Its scale path
# is the approximate family (prefix filter / MinHash), all sf10-safe;
# the exact kernel is re-verified on a deterministic 10% slice of the
# sf10 corpus (~50k docs — the size class where it is sf1-green).
SLICE_10 = {
    "ns_containment_pairs": "exact all-pairs kernel, quadratic by "
    "contract (ground truth for the approximate family)",
    # every base doc has 100 cross-replica near-copies in the derived
    # corpus, so the TRUE near-dup pair set itself grows ~replicas²
    # (25M+ output pairs at sf10, OOM-killed the chunk JVM) — the
    # enumeration is inherently quadratic on this corpus shape; the
    # cluster/canonical form (ns_dedup_canonical, sf10-green) is the
    # scale representation
    "ns_prefix_jaccard_pairs": "near-dup PAIR enumeration is "
    "quadratic in replica multiplicity on the derived corpus",
    # bipartite shingle join whose PROBE side is a fixed % of the
    # synthetic corpus (real eval suites are fixed-size): on the
    # 31-token vocab Σ_s df_c(s)·df_p(s) grows ~n² with replicas
    "ns_fuzzy_contamination": "probe side scales with the synthetic "
    "corpus — bipartite join cost grows ~n² on the derived corpus",
    # the drift gate's recall verification is EXACT brute-force cosine
    # over n/10 planted queries × the full corpus BY CONTRACT (the
    # approximate path is the thing under test) — O(n²/10) at any SF;
    # the gate's emissions are scale-free ratios/booleans, and the
    # 10% slice is exactly the sf1 scale where the full gate ran
    # green (scratch/soak_sf1 r14: 119 s)
    "ns_ann_drift_retrain": "exact-recall verification is O(n²/10) "
    "by contract — slice = the proven sf1 operating scale",
}

# queries whose sf10 value is EXACTLY derivable from sf0.1: gen_sf10
# offsets l_orderkey AND l_partkey per replica, so the co-purchase
# graph is 100 DISJOINT copies of the sf0.1 graph and scalar graph
# counts scale exactly 100x.  The sf0.1 side is DuckDB-verified in
# the same run, so this is an exactness check, not a band.
REPLICA_SCALAR = {
    # name -> (scalar column, replica multiplier)
    "graph_triangles": ("n_triangles", 100),
}

# Per-NODE graph relations replicate exactly too: custkey offsets are
# multiples of 100 so the khop seed predicate (custkey % 100 == 0) is
# replica-invariant, and each replica's subgraph is disjoint and
# isomorphic — node n0 of sf0.1 maps to n0 + r*(200000 if even else
# 20000) with IDENTICAL rank/hop.  The sf0.1 side is DuckDB-verified
# in the same run; the sf10 side must equal the 100-way key expansion
# bit-for-bit.  (The sf10 DuckDB oracle itself is the blocker here:
# the unrolled iterative CTEs over the 100M-row edge list need >70 GB
# of temp and die on disk — measured twice this round.)
REPLICA_RELATION = {
    "graph_pagerank": ("node", ["pr"]),
    "graph_khop_reach": ("node", ["hop"]),
    # same graph, seed predicate a % 200 == 0 is replica-invariant
    # (even-node offset 200000 ≡ 0 mod 200); same DuckDB-temp blocker
    "graph_ppr_seeds": ("node", ["ppr"]),
}
_NODE_OFF_EVEN = 200_000  # custkey offset 100k * 2
_NODE_OFF_ODD = 20_000  # suppkey offset 10k * 2


def main(only: list[str] | None = None) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    os.chdir("/root/repo")

    spark = (
        SparkSession.builder.master("local[24]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from aws_datalake_framework_ingestion_spark.plans import REGISTRY
    from aws_datalake_framework_ingestion_spark.tables import TABLES

    duck = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF10, f"{t}.parquet")
        glob = f"{path}/*.parquet" if os.path.isdir(path) else path
        duck.sql(f"CREATE VIEW {t} AS SELECT * FROM '{glob}'")

    non_exact, timings = [], {}
    # explicit names run as given (whether or not in HEAVY); default
    # run sweeps the heavy-tail list
    names = list(only) if only else list(HEAVY)
    for name in names:
        spec = REGISTRY[name]
        try:
            if name in SLICE_10:
                slice_dir = os.path.join(
                    "/root/repo", "scratch", "sf10slice"
                )
                # deterministic md5 ~10% slices of the tables the
                # sliced queries read (documents; embeddings for the
                # ANN drift gate) — operator and oracle see the
                # identical sub-corpus
                slices = {
                    "documents": "doc_id",
                    "embeddings": "vec_id",
                }
                sduck = duckdb.connect()
                for tbl, key in slices.items():
                    out = os.path.join(slice_dir, f"{tbl}.parquet")
                    if not os.path.isdir(out):
                        from pyspark.sql import functions as F

                        (
                            spark.read.parquet(
                                os.path.join(SF10, f"{tbl}.parquet")
                            )
                            .where(
                                F.substring(
                                    F.md5(F.col(key).cast("string")), 1, 2
                                )
                                < "1a"
                            )
                            .repartition(8)
                            .write.mode("overwrite")
                            .parquet(out)
                        )
                    sduck.sql(
                        f"CREATE VIEW {tbl} AS SELECT * FROM "
                        f"'{out}/*.parquet'"
                    )
                t0 = time.perf_counter()
                sdf = spec.fn(spark, slice_dir).toPandas()
                t_spark = time.perf_counter() - t0
                t0 = time.perf_counter()
                odf = sduck.sql(spec.oracle).df()
                t_duck = time.perf_counter() - t0
                scols = sorted(sdf.columns)
                ok = scols == sorted(odf.columns) and rows(
                    sdf, scols
                ) == rows(odf, scols)
                timings[name] = (round(t_spark, 2), round(t_duck, 2))
                if not ok:
                    non_exact.append((name, "slice mismatch"))
                print(
                    f"# {name}: slice(~50k of sf10) spark "
                    f"{t_spark:.2f}s duck {t_duck:.2f}s "
                    f"{'slice-exact' if ok else 'SLICE-FAIL'} "
                    f"(full sf10: {SLICE_10[name]})",
                    flush=True,
                )
                continue
            # Corpus-sized per-row results (scan-speed projections over
            # 60M-row lineitem) cannot round-trip through pandas at
            # sf10 — the HARNESS caps the comparison to the first
            # CAP_ROWS under ORDER BY ALL COLUMNS, identical in both
            # engines (boundary ties are full-row duplicates, so the
            # selected multiset is well-defined).  The operator still
            # executes over the FULL sf10 input.
            CAP_AT, CAP_ROWS = 2_000_000, 500_000
            sdf_full = spec.fn(spark, SF10)
            t0 = time.perf_counter()
            n_rows = sdf_full.count()
            if n_rows > CAP_AT:
                from pyspark.sql import functions as F

                cols = sorted(sdf_full.columns)
                sdf = (
                    sdf_full.orderBy(*[F.col(c) for c in cols])
                    .limit(CAP_ROWS)
                    .toPandas()
                )
                t_spark = time.perf_counter() - t0
                t0 = time.perf_counter()
                odf = duck.sql(
                    f"SELECT * FROM ({spec.oracle}) _q ORDER BY "
                    + ", ".join(f'"{c}"' for c in cols)
                    + f" LIMIT {CAP_ROWS}"
                ).df()
                t_duck = time.perf_counter() - t0
                timings[name] = (round(t_spark, 2), round(t_duck, 2))
                ok = sorted(sdf.columns) == sorted(odf.columns) and rows(
                    sdf, cols
                ) == rows(odf, cols)
                if not ok:
                    non_exact.append(
                        (name, f"capped({CAP_ROWS} of {n_rows}) mismatch")
                    )
                print(
                    f"# {name}: spark {t_spark:.2f}s duck {t_duck:.2f}s "
                    f"{'ok' if ok else 'FAIL'} "
                    f"(capped compare: first {CAP_ROWS} of {n_rows} "
                    "under ORDER BY ALL)",
                    flush=True,
                )
                continue
            sdf = sdf_full.toPandas()
            t_spark = time.perf_counter() - t0
            if name in REPLICA_RELATION:
                import pandas as pd

                node_col, val_cols = REPLICA_RELATION[name]
                small = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
                d01 = duckdb.connect()
                from aws_datalake_framework_ingestion_spark.tables import (
                    TABLES as _T2,
                )

                for t in _T2:
                    d01.sql(
                        f"CREATE VIEW {t} AS SELECT * FROM "
                        f"'/root/testdata/sf0.1/{t}.parquet'"
                    )
                osm = d01.sql(spec.oracle).df()
                cols = sorted(small.columns)
                ok01 = rows(small, cols) == rows(osm, cols)
                reps = []
                for r in range(100):
                    e = small.copy()
                    off = (e[node_col] % 2 == 0) * (r * _NODE_OFF_EVEN) + (
                        e[node_col] % 2 == 1
                    ) * (r * _NODE_OFF_ODD)
                    e[node_col] = e[node_col] + off
                    reps.append(e)
                exp = pd.concat(reps, ignore_index=True)
                ok10 = rows(sdf, cols) == rows(exp, cols)
                timings[name] = (round(t_spark, 2), -1.0)
                if not (ok01 and ok10):
                    non_exact.append(
                        (name, f"replica relation: sf0.1 vs oracle "
                               f"{ok01}, sf10 vs 100x expansion {ok10}")
                    )
                print(
                    f"# {name}: spark {t_spark:.2f}s replica-relation "
                    f"(sf0.1 oracle {'ok' if ok01 else 'FAIL'}; 100x "
                    f"expansion {len(exp)} rows "
                    f"{'ok' if ok10 else 'FAIL'})",
                    flush=True,
                )
                continue
            if name in REPLICA_SCALAR:
                col, mult = REPLICA_SCALAR[name]
                # verify the sf0.1 scalar against DuckDB, then the
                # 100x disjoint-replica invariant against sf10
                small = spec.fn(spark, "/root/testdata/sf0.1").toPandas()
                d01 = duckdb.connect()
                from aws_datalake_framework_ingestion_spark.tables import (
                    TABLES as _T,
                )

                for t in _T:
                    d01.sql(
                        f"CREATE VIEW {t} AS SELECT * FROM "
                        f"'/root/testdata/sf0.1/{t}.parquet'"
                    )
                osm = d01.sql(spec.oracle).df()
                exp01 = int(osm[col].iloc[0])
                got01 = int(small[col].iloc[0])
                got10 = int(sdf[col].iloc[0])
                ok = got01 == exp01 and got10 == mult * exp01
                timings[name] = (round(t_spark, 2), -1.0)
                if not ok:
                    non_exact.append(
                        (name, f"replica invariant: sf0.1 {got01} vs "
                               f"oracle {exp01}; sf10 {got10} vs "
                               f"{mult}x={mult * exp01}")
                    )
                print(
                    f"# {name}: spark {t_spark:.2f}s "
                    f"replica-invariant({mult}x sf0.1 oracle "
                    f"{exp01}) -> {got10} "
                    f"{'ok' if ok else 'FAIL'}",
                    flush=True,
                )
                continue
            t0 = time.perf_counter()
            odf = duck.sql(spec.oracle).df()
            t_duck = time.perf_counter() - t0
            timings[name] = (round(t_spark, 2), round(t_duck, 2))
            scols = sorted(sdf.columns)
            if scols != sorted(odf.columns):
                non_exact.append((name, "schema"))
            else:
                sr, orr = rows(sdf, scols), rows(odf, scols)
                if sr != orr:
                    k = sum(1 for a, b2 in zip(sr, orr) if a != b2) + abs(
                        len(sr) - len(orr)
                    )
                    non_exact.append((name, f"{k} rows differ"))
        except Exception as ex:  # noqa: BLE001
            non_exact.append((name, f"ERROR {str(ex)[:200]}"))
        st = "ok" if not (non_exact and non_exact[-1][0] == name) else "FAIL"
        ts, td = timings.get(name, (-1, -1))
        print(f"# {name}: spark {ts}s duck {td}s {st}", flush=True)

    slowest = sorted(timings.items(), key=lambda kv: -kv[1][0])
    print("slowest spark:", [(n, t[0]) for n, t in slowest])
    if non_exact:
        for name, why in non_exact:
            print(f"non-exact: {name} ({why})")
        return 1
    print(f"NONE — all {len(names)} green at sf10")
    return 0


def wide_names(chunk: int, size: int) -> list[str]:
    """The i-th chunk of the WIDE sweep: every oracle-bearing
    registered query not already covered by the heavy-tail run and
    not quadratic-oracle (those are sf1-slice-verified).  Chunked so
    each chunk runs in a FRESH JVM — one long session accumulates
    shuffle files faster than the ContextCleaner frees them (the r11
    first-pass disk-fill lesson)."""
    from aws_datalake_framework_ingestion_spark.plans import REGISTRY

    QUAD = {
        "ns_ngram_jaccard_pairs",
        "ns_minhash_lsh_pairs",
        "ns_simhash_pairs",
        "ns_winnow_fingerprints",
        "ns_prefix_filter_join",
        "ns_dedup_clusters",
    }
    names = sorted(
        n
        for n, s in REGISTRY.items()
        if s.oracle is not None and n not in HEAVY and n not in QUAD
    )
    return names[chunk * size : (chunk + 1) * size]


if __name__ == "__main__":
    if sys.argv[1:2] == ["--wide"]:
        chunk, size = int(sys.argv[2]), int(sys.argv[3])
        # compute chunk membership before main() builds the session
        sys.path.insert(0, "/root/repo")
        os.chdir("/root/repo")
        names = wide_names(chunk, size)
        if not names:
            print("EMPTY CHUNK")
            raise SystemExit(0)
        HEAVY[:] = names  # reuse the main loop verbatim
        raise SystemExit(main(only=names))
    raise SystemExit(main(only=sys.argv[1:] or None))
