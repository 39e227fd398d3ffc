"""sf1 soak (VERDICT r4 item 2): exactness sweep + per-query timing at
lineitem-6M scale on the DERIVED scratch/sf1 dataset (gen_sf1.py).

Same strict bit-equality as scratch/exactness.py, with two
differences driven by the 10× data:

* sf1 tables are Spark-written DIRECTORIES (multi-file), so the DuckDB
  views glob ``<table>.parquet/*.parquet``;
* queries whose ORACLE is inherently quadratic in the corpus
  (all-pairs shingle/simhash joins, 2.5e9-pair broadcasts) are skipped
  with an explicit reason — the OPERATOR side stays bucketed and is
  covered at sf0.01/sf0.1; what sf1 stresses is shuffle sizing, state
  stores, AQE behavior, and the iterative loops in a shuffle-bound
  regime.  Every skip is printed so nothing silently drops.

Quadratic-ORACLE queries (SKIP below) are not skipped outright any
more (VERDICT r10 item 6): each is re-verified on a deterministic
md5-sampled ~10% SLICE of the sf1 corpus (≈5k docs — the size the
oracle already completes at, proven by the sf0.1 sweep) drawn from
sf1's replica-suffixed text, so every skip is retired to
"slice-verified" with a real exactness line.  The slice is a pure
row filter (md5(doc_id) prefix), so operator and oracle see the
identical sub-corpus.

Run:  python3 scratch/soak_sf1.py [names...]
      python3 scratch/soak_sf1.py --slice-only   (just the 6 slices)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from exactness import rows  # noqa: E402

SF1 = os.path.join("/root/repo", "scratch", "sf1")

# name -> reason.  Only oracle-cost skips belong here.
SKIP = {
    "ns_ngram_jaccard_pairs": "oracle is the exact all-pairs shingle join "
    "(Σ per-shingle counts² at 50k docs)",
    "ns_minhash_lsh_pairs": "self-check embeds the exact all-pairs "
    "shingle join (same cost as above)",
    "ns_simhash_pairs": "self-check embeds the 50k² brute-force "
    "Hamming broadcast (2.5e9 pairs)",
    "ns_winnow_fingerprints": "oracle materializes per-doc shingle "
    "minima lists across 50k docs — DuckDB list ops dominate, not Spark",
    "ns_prefix_filter_join": "oracle is the exact all-pairs shingle "
    "join (the operator itself is the prefix-filtered exact join — "
    "timed below against the corpus without the oracle)",
    "ns_fuzzy_contamination": "bipartite shingle join whose PROBE side "
    "is a fixed % of the synthetic corpus (real eval suites are fixed-"
    "size): on the 31-token vocab Σ_s df_c(s)·df_p(s) grows ~n² with "
    "replicas — slice-verified like the self-join family",
    "ns_dedup_clusters": "oracle is a recursive-CTE TRANSITIVE CLOSURE "
    "over the chunk-hash near-dup pair relation — Σ component² blowup "
    "at sf1's 50k-doc corpus (measured 30+ min / 38 GB in DuckDB; the "
    "Spark-side contraction loop itself is exercised by graph_cc, "
    "whose sparser closure oracle completes)",
}


def main(only: list[str] | None = None) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    # Python WORKERS import the package via their cwd (sys.path[0]),
    # which they inherit from the driver process — a scratch/-cwd
    # launch makes every Arrow-kernel query fail worker-side with
    # ModuleNotFoundError while pure-JVM queries pass (bitten r7).
    os.chdir("/root/repo")

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from aws_datalake_framework_ingestion_spark.plans import REGISTRY
    from aws_datalake_framework_ingestion_spark.tables import TABLES

    duck = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF1, f"{t}.parquet")
        glob = f"{path}/*.parquet" if os.path.isdir(path) else path
        duck.sql(f"CREATE VIEW {t} AS SELECT * FROM '{glob}'")

    non_exact, skipped, timings = [], [], {}
    n_checked = 0
    for name, spec in sorted(REGISTRY.items()):
        if spec.oracle is None or (only and name not in only):
            continue
        # quadratic-oracle queries NEVER run their full-sf1 oracle —
        # they are verified on the deterministic slice below
        if name in SKIP:
            skipped.append((name, SKIP[name]))
            continue
        n_checked += 1
        try:
            t0 = time.perf_counter()
            sdf = spec.fn(spark, SF1).toPandas()
            t_spark = time.perf_counter() - t0
            t0 = time.perf_counter()
            odf = duck.sql(spec.oracle).df()
            t_duck = time.perf_counter() - t0
            timings[name] = (round(t_spark, 2), round(t_duck, 2))
            scols = sorted(sdf.columns)
            if scols != sorted(odf.columns):
                non_exact.append((name, "schema"))
                continue
            sr, orr = rows(sdf, scols), rows(odf, scols)
            if sr != orr:
                k = sum(1 for a, b2 in zip(sr, orr) if a != b2) + abs(
                    len(sr) - len(orr)
                )
                non_exact.append((name, f"{k} rows differ"))
        except Exception as ex:  # noqa: BLE001
            non_exact.append((name, f"ERROR {str(ex)[:160]}"))
        st = "ok" if not (non_exact and non_exact[-1][0] == name) else "FAIL"
        ts, td = timings.get(name, (-1, -1))
        print(f"# {name}: spark {ts}s duck {td}s {st}", flush=True)

    # ---- slice verification of the quadratic-oracle queries ---------
    # ~10% deterministic slice (md5(doc_id) prefix < '1a' ≈ 5.1k of
    # 50k docs): the exact size class the oracles complete at (sf0.1),
    # but drawn from sf1's corpus so the operators see replica text.
    n_slice_ok = 0
    if skipped:
        slice_dir = os.path.join("/root/repo", "scratch", "sf1slice")
        doc_out = os.path.join(slice_dir, "documents.parquet")
        docs = spark.read.parquet(os.path.join(SF1, "documents.parquet"))
        from pyspark.sql import functions as F

        (
            docs.where(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
                < "1a"
            )
            .repartition(8)
            .write.mode("overwrite")
            .parquet(doc_out)
        )
        sduck = duckdb.connect()
        sduck.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{doc_out}/*.parquet'"
        )
        for name, why in skipped:
            spec = REGISTRY[name]
            try:
                t0 = time.perf_counter()
                sdf = spec.fn(spark, slice_dir).toPandas()
                t_spark = time.perf_counter() - t0
                t0 = time.perf_counter()
                odf = sduck.sql(spec.oracle).df()
                t_duck = time.perf_counter() - t0
                scols = sorted(sdf.columns)
                ok = scols == sorted(odf.columns) and rows(sdf, scols) == rows(
                    odf, scols
                )
            except Exception as ex:  # noqa: BLE001
                ok, t_spark, t_duck = False, -1, -1
                print(f"slice ERROR {name}: {str(ex)[:160]}")
            st = "slice-exact" if ok else "SLICE-FAIL"
            if ok:
                n_slice_ok += 1
            else:
                non_exact.append((name, "slice"))
            print(
                f"# {name}: slice(~5k of sf1) spark {t_spark:.2f}s "
                f"duck {t_duck:.2f}s {st} (full-sf1 oracle: {why})",
                flush=True,
            )

    slowest = sorted(timings.items(), key=lambda kv: -kv[1][0])[:10]
    print("slowest spark:", [(n, t[0]) for n, t in slowest])
    if non_exact:
        for name, why in non_exact:
            print(f"non-exact: {name} ({why})")
        return 1
    print(
        f"NONE — all {n_checked} bit-exact at sf1 + {n_slice_ok} "
        "quadratic-oracle queries slice-verified"
    )
    return 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv == ["--slice-only"]:
        # run only the slice pass: select an impossible name so the
        # main loop checks nothing, then the slice pass still runs
        raise SystemExit(main(only=list(SKIP)))
    raise SystemExit(main(only=argv or None))
