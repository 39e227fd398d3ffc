"""Long-horizon incremental-curation soak (VERDICT r12 item 6).

Drives 50 delta batches of sf1 volume (50k docs, doc_id % 50) through
curation.run_curation_incremental against one accumulated store,
with registry/corpus compaction every 10 batches
(shard_append.compact_corpus + vacuum_corpus on all three versioned
stores), asserting:

* per-batch wall stays FLAT across the horizon (the cross-batch
  reads are pruned 32 B fingerprint columns; compaction keeps the
  segment count bounded) — reported as first-10 vs last-10 means;
* every store is BIT-EQUAL across each compaction (order-free
  crc32-of-row digest + count, checked before/after);
* a mid-horizon replay of an already-committed batch is a ledger
  no-op;
* the final ledger funnel is consistent (publish sum == corpus rows).

Run:  python3 scratch/soak_incremental_50.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

WORK = "/root/repo/scratch/inc_soak"
SF1_DOCS = "/root/repo/scratch/sf1/documents.parquet"
N_BATCHES = 50
COMPACT_EVERY = 10


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    os.chdir("/root/repo")
    spark = (
        SparkSession.builder.master("local[24]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from aws_datalake_framework_ingestion_spark.catalog import Catalog
    from aws_datalake_framework_ingestion_spark.curation import (
        LEDGER_TABLE,
        CurationSpec,
        run_curation_incremental,
    )
    from aws_datalake_framework_ingestion_spark.streaming.shard_append import (
        compact_corpus,
        read_corpus,
        vacuum_corpus,
    )

    docs = spark.read.parquet(SF1_DOCS).select("doc_id", "text", "n_chars")
    shutil.rmtree(WORK, ignore_errors=True)
    cat = Catalog(spark, f"{WORK}/cat")
    spec = CurationSpec(run_id="soak", shard_budget=2048)
    store = f"{WORK}/store"

    def digest(path):
        df = read_corpus(spark, path)
        cols = sorted(df.columns)
        return tuple(
            df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.crc32(F.to_json(F.struct(*cols))).cast("decimal(38,0)")
                ).alias("h"),
            ).first()
        )

    walls, compact_walls, published = [], [], 0
    for b in range(N_BATCHES):
        batch = docs.where(F.col("doc_id") % N_BATCHES == b)
        t0 = time.perf_counter()
        res = run_curation_incremental(cat, spec, batch, store, b)
        w = time.perf_counter() - t0
        walls.append(w)
        assert not res["replayed"]
        published += res["funnel"][-1][3]
        print(f"batch {b:02d}: {w:.2f}s  (+{res['funnel'][-1][3]} docs)",
              flush=True)
        if b % COMPACT_EVERY == COMPACT_EVERY - 1:
            for sub in ("corpus", "probes", "sigs"):
                p = f"{store}/{sub}"
                before = digest(p)
                t0 = time.perf_counter()
                cres = compact_corpus(spark, p)
                vac = vacuum_corpus(spark, p, tmp_ttl_ms=0, retain_ms=0)
                cw = time.perf_counter() - t0
                after = digest(p)
                assert before == after, (sub, before, after)
                compact_walls.append(cw)
                print(
                    f"  compact {sub}: folded "
                    f"{cres['n_live_segments_folded']} segs, vacuumed "
                    f"{len(vac['v_deleted'])} v-dirs, {cw:.2f}s, bit-equal",
                    flush=True,
                )
        if b == N_BATCHES // 2:
            # mid-horizon replay of a committed batch: ledger no-op
            rep = run_curation_incremental(
                cat, spec, docs.where(F.col("doc_id") % N_BATCHES == 0),
                store, 0,
            )
            assert rep["replayed"], "replay re-ran a committed batch"

    n_corpus = read_corpus(spark, f"{store}/corpus").count()
    n_ledger = (
        cat.read(LEDGER_TABLE)
        .where(F.col("status") == "succeeded")
        .count()
    )
    first, last = walls[:10], walls[-10:]
    m_first, m_last = sum(first) / len(first), sum(last) / len(last)
    print(
        f"\nbatches={N_BATCHES} published={published} corpus={n_corpus} "
        f"ledger_rows={n_ledger}\n"
        f"per-batch wall: first-10 mean {m_first:.2f}s, "
        f"last-10 mean {m_last:.2f}s, max {max(walls):.2f}s "
        f"(ratio {m_last / m_first:.2f})\n"
        f"compactions: {len(compact_walls)} x mean "
        f"{sum(compact_walls) / len(compact_walls):.2f}s",
        flush=True,
    )
    ok = (
        published == n_corpus
        and n_ledger == N_BATCHES * 6
        and m_last <= 1.5 * m_first
    )
    print("SOAK " + ("OK" if ok else
          "FAIL (publish/ledger mismatch or latency drift > 1.5x)"))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
