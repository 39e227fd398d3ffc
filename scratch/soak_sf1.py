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

Run:  python3 scratch/soak_sf1.py [names...]
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
        if name in SKIP and not only:
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

    for name, why in skipped:
        print(f"skipped (oracle cost): {name} — {why}")
    slowest = sorted(timings.items(), key=lambda kv: -kv[1][0])[:10]
    print("slowest spark:", [(n, t[0]) for n, t in slowest])
    if non_exact:
        for name, why in non_exact:
            print(f"non-exact: {name} ({why})")
        return 1
    print(f"NONE — all {n_checked} bit-exact at sf1 ({len(skipped)} oracle-cost skips)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(only=sys.argv[1:] or None))
