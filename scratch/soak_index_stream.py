"""Streaming ANN-index ingestion soak (round 14, VERDICT r13 item 6).

stream_index_append is pytest-green (exactly-once, crash-redelivery)
but had no scale evidence like the 50-batch curation soak.  This
drives 30 micro-batches of 2,000 vectors each (60k appended onto a
40k-vector base — sf1-class volume for the 64-dim embedding shape)
through ONE persisted IVF index via the real readStream/foreachBatch
path, with segment compaction + vacuum interleaved every 10 batches,
and gates after EVERY batch:

* planted-pair recall — each batch plants 20 near-duplicates
  (v + 0.05·noise) of known base vectors; ivf_index_topk@n_probe=4
  must put the planted source in the top-5 for ≥ 0.8 of them
  (in-distribution appends against the FROZEN model — the
  retrain_needed=FALSE regime; the TRUE regime is
  ns_ann_drift_retrain's job);
* wall-clock per batch — must stay FLAT (the append is
  O(|batch|·centroids) + an id anti-join against a pruned 8 B
  column; nothing re-reads the standing corpus);
* row-count exactness — index rows == base + Σ novel after every
  compaction (the compaction-aware + retrain-aware read).

Final checks: a full checkpoint re-run is a no-op, and re-staging the
first 5 batch files under a FRESH checkpoint appends nothing (id-level
exactly-once through the anti-join, not the checkpoint).

Run AFTER other JVMs are quiet:  python3 scratch/soak_index_stream.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

DIM = 64
BASE_N = 40_000
BATCHES = 30
BATCH_N = 2_000
PLANTED = 20
WORK = "/root/repo/scratch/inc_index_soak"


def unit_rows(rng, n):
    import numpy as np

    v = rng.standard_normal((n, DIM))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def main() -> int:
    import numpy as np

    os.chdir("/root/repo")
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(f"{WORK}/in", exist_ok=True)

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from aws_datalake_framework_ingestion_spark.operators import (
        similarity as S,
    )
    from aws_datalake_framework_ingestion_spark.session import get_session
    from aws_datalake_framework_ingestion_spark.streaming.index_append import (
        stream_index_append,
    )
    from aws_datalake_framework_ingestion_spark.streaming.shard_append import (
        compact_corpus,
        vacuum_corpus,
    )

    spark = get_session(app_name="soak_index_stream")
    rng = np.random.default_rng(7)
    base = unit_rows(rng, BASE_N)

    idx = f"{WORK}/index"
    base_df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(BASE_N)],
        "vec_id long, embedding array<double>",
    )
    t0 = time.perf_counter()
    S.build_ivf_index(spark, base_df, idx, n_centroids=32)
    print(f"# base index built: {time.perf_counter() - t0:.1f}s", flush=True)

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )

    total_appended = BASE_N
    walls = []
    for b in range(BATCHES):
        fresh = unit_rows(rng, BATCH_N - PLANTED)
        # planted near-dups of known base vectors (deterministic picks)
        src_ids = [(b * 997 + 13 * j) % BASE_N for j in range(PLANTED)]
        noise = unit_rows(rng, PLANTED)
        planted = base[src_ids] + 0.05 * noise
        planted /= np.linalg.norm(planted, axis=1, keepdims=True)
        ids0 = 1_000_000 + b * BATCH_N
        rows = [
            {"vec_id": ids0 + j, "embedding": [float(x) for x in fresh[j]]}
            for j in range(BATCH_N - PLANTED)
        ] + [
            {
                "vec_id": ids0 + BATCH_N - PLANTED + j,
                "embedding": [float(x) for x in planted[j]],
            }
            for j in range(PLANTED)
        ]
        with open(f"{WORK}/in/batch_{b:03d}.json", "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

        t0 = time.perf_counter()
        stream_index_append(
            spark, f"{WORK}/in", idx, f"{WORK}/ckpt", schema, kind="ivf"
        )
        wall = time.perf_counter() - t0
        walls.append(wall)
        total_appended += BATCH_N

        # recall gate on this batch's planted rows
        pid0 = ids0 + BATCH_N - PLANTED
        q = spark.createDataFrame(
            [
                (pid0 + j, [float(x) for x in planted[j]])
                for j in range(PLANTED)
            ],
            "vec_id long, embedding array<double>",
        )
        top = (
            S.ivf_index_topk(spark, idx, q, k=5, n_probe=4)
            .select("query_id", "nn_id")
            .collect()
        )
        hits = sum(
            1
            for j in range(PLANTED)
            if any(
                r["query_id"] == pid0 + j and r["nn_id"] == src_ids[j]
                for r in top
            )
        )
        rec = hits / PLANTED
        n_live = S.read_ivf_index(spark, idx).count()
        line = (
            f"# batch {b:02d}: wall {wall:.2f}s recall {rec:.2f} "
            f"rows {n_live}"
        )
        if (b + 1) % 10 == 0:
            res = compact_corpus(spark, idx)
            vac = vacuum_corpus(spark, idx)  # DEFAULT reader-grace
            n_after = S.read_ivf_index(spark, idx).count()
            line += (
                f" | compacted {res['n_live_segments_folded']} segs,"
                f" vacuum deferred={not vac['v_deleted']},"
                f" rows {n_after}"
            )
            assert n_after == n_live
        print(line, flush=True)
        assert rec >= 0.8, f"recall gate failed at batch {b}: {rec}"
        assert n_live == total_appended, (n_live, total_appended)

    # checkpoint re-run: consumes nothing, appends nothing
    n_before = S.read_ivf_index(spark, idx).count()
    stream_index_append(
        spark, f"{WORK}/in", idx, f"{WORK}/ckpt", schema, kind="ivf"
    )
    assert S.read_ivf_index(spark, idx).count() == n_before
    # id-level exactly-once: FRESH checkpoint over the first 5 batch
    # files — every id already stored, so nothing is published
    os.makedirs(f"{WORK}/in2", exist_ok=True)
    for b in range(5):
        shutil.copy(
            f"{WORK}/in/batch_{b:03d}.json",
            f"{WORK}/in2/batch_{b:03d}.json",
        )
    stream_index_append(
        spark, f"{WORK}/in2", idx, f"{WORK}/ckpt2", schema, kind="ivf"
    )
    assert S.read_ivf_index(spark, idx).count() == n_before
    print(
        f"# soak OK: {BATCHES} batches, rows {n_before}, "
        f"first-10 mean wall {sum(walls[:10]) / 10:.2f}s vs "
        f"last-10 {sum(walls[-10:]) / 10:.2f}s",
        flush=True,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
