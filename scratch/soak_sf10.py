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

# oracle-side cost exceptions at sf10 (operator still runs + is timed)
ORACLE_SKIP = {
    "ns_containment_pairs": "exact all-pairs ground-truth kernel — both "
    "engines pay Σ per-shingle counts²; at 500k docs the DuckDB oracle "
    "is the bottleneck (operator timed, exactness carried from sf1)",
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
    names = [n for n in HEAVY if not only or n in only]
    for name in names:
        spec = REGISTRY[name]
        try:
            t0 = time.perf_counter()
            sdf = spec.fn(spark, SF10).toPandas()
            t_spark = time.perf_counter() - t0
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
            if name in ORACLE_SKIP:
                timings[name] = (round(t_spark, 2), -1.0)
                print(
                    f"# {name}: spark {t_spark:.2f}s "
                    f"operator-only ({ORACLE_SKIP[name]}) "
                    f"rows={len(sdf)}",
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


if __name__ == "__main__":
    raise SystemExit(main(only=sys.argv[1:] or None))
