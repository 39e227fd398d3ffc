"""Derive a deterministic sf10 dataset (100x sf0.1) for the heavy-tail
soak (VERDICT r10 item 1: "prove the next scale decade").

Same derivation contract as gen_sf1.py, scaled to 100 replicas and
restructured for that width: instead of a 100-way unionByName (100
plan branches), each table is replicated in ONE pass by cross-joining
a broadcast 100-row replica spine and applying the key offsets as
column arithmetic — one scan, one write, no plan blowup.

* key offsets: identical OFF map as gen_sf1.py, so replicas 0..9 of
  sf10 are KEY-IDENTICAL to sf1 (sf1 is a strict prefix of sf10 in
  key space — any sf1-vs-sf10 result discrepancy is therefore a
  scale effect, never a data-derivation effect);
* region/nation stay as-is (tiny dims — the 25-nation TPC-H shape);
* documents get the same " qrep{r}" suffix token (r in 1..99) with
  recomputed n_chars, so the corpus isn't 100 clones;
* embeddings get the same per-(dim, replica) deterministic sign
  flips — within a replica all cosines are preserved exactly;
* events keep the driver's TIMESTAMP(NANOS) physical schema via
  pyarrow (Spark can't write NANOS; tables.load depends on the
  nanosAsLong shape).

Pure column arithmetic — same bytes on every run.  Output is written
with 32 files per big table so sf10 scans are multi-split.

Run:  python3 scratch/gen_sf10.py        (~2 GB under scratch/sf10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.path.join("/root/repo", "scratch", "sf10")
REPLICAS = 100

OFF = {
    "c_custkey": 100_000,
    "s_suppkey": 10_000,
    "p_partkey": 100_000,
    "o_orderkey": 1_000_000,
    "event_id": 1_000_000,
    "doc_id": 10_000,
    "vec_id": 10_000,
}


def spine(spark: SparkSession) -> DataFrame:
    return F.broadcast(
        spark.range(REPLICAS).select(F.col("id").cast("int").alias("_rep"))
    )


def replicate(spark: SparkSession, df: DataFrame, keymap: dict[str, str]) -> DataFrame:
    out = df.crossJoin(spine(spark))
    for col, base in keymap.items():
        out = out.withColumn(
            col, (F.col(col) + F.col("_rep").cast("long") * OFF[base]).cast("long")
        )
    return out


def main() -> None:
    from aws_datalake_framework_ingestion_spark.session import get_session
    from aws_datalake_framework_ingestion_spark.tables import load

    spark = get_session(app_name="gen-sf10")
    os.makedirs(DST, exist_ok=True)

    def write(name: str, df: DataFrame, files: int = 32) -> None:
        df.drop("_rep").repartition(files).write.mode("overwrite").parquet(
            os.path.join(DST, f"{name}.parquet")
        )
        print(
            name,
            spark.read.parquet(os.path.join(DST, f"{name}.parquet")).count(),
            flush=True,
        )

    for name in ("region", "nation"):
        load(spark, SRC, name).repartition(1).write.mode("overwrite").parquet(
            os.path.join(DST, f"{name}.parquet")
        )
        print(name, "copied", flush=True)

    # events: pyarrow keeps TIMESTAMP(NANOS) (see module docstring)
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src_tbl = pq.read_table(os.path.join(SRC, "events.parquet"))
    ev_dir = os.path.join(DST, "events.parquet")
    os.makedirs(ev_dir, exist_ok=True)
    # 4 replicas per output file -> 25 files, bounded memory
    per_file = 4
    fidx = 0
    for start in range(0, REPLICAS, per_file):
        reps = []
        for r in range(start, min(start + per_file, REPLICAS)):
            t = src_tbl
            if r > 0:
                ids = pc.add(
                    t["event_id"], pa.scalar(r * OFF["event_id"], pa.int64())
                )
                t = t.set_column(
                    t.schema.get_field_index("event_id"), "event_id", ids
                )
            reps.append(t)
        pq.write_table(
            pa.concat_tables(reps), os.path.join(ev_dir, f"part-{fidx:03d}.parquet")
        )
        fidx += 1
    print("events", pq.read_table(ev_dir).num_rows, flush=True)

    plans = {
        "customer": {"c_custkey": "c_custkey"},
        "supplier": {"s_suppkey": "s_suppkey"},
        "part": {"p_partkey": "p_partkey"},
        "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
        "lineitem": {
            "l_orderkey": "o_orderkey",
            "l_partkey": "p_partkey",
            "l_suppkey": "s_suppkey",
        },
    }
    for name, keymap in plans.items():
        write(name, replicate(spark, load(spark, SRC, name), keymap))

    # documents: " qrep{r}" suffix keeps the corpus non-clonal (same
    # scheme as gen_sf1.py, so replicas 1..9 are text-identical to sf1)
    docs = replicate(spark, load(spark, SRC, "documents"), {"doc_id": "doc_id"})
    docs = (
        docs.withColumn(
            "text",
            F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" qrep"), F.col("_rep").cast("string"))
            ),
        ).withColumn("n_chars", F.length("text").cast("int"))
    )
    write("documents", docs, files=16)

    # embeddings: per-(dim, replica) sign flips — same hash family as
    # gen_sf1.py (101*i + 7919*r), cosine-preserving within a replica
    emb = replicate(spark, load(spark, SRC, "embeddings"), {"vec_id": "vec_id"})
    # NOTE: the hash input must stay INT (i, 101, _rep, 7919 all int)
    # to reproduce gen_sf1.py's F.hash(int) values bit-for-bit — a
    # long-typed operand switches hash semantics and breaks the
    # "replicas 1..9 identical to sf1" invariant.
    rep_i = F.col("_rep")
    emb = emb.withColumn(
        "embedding",
        F.when(F.col("_rep") == 0, F.col("embedding")).otherwise(
            F.transform(
                F.col("embedding"),
                lambda x, i: x
                * (
                    F.lit(1.0)
                    - F.lit(2.0)
                    * F.pmod(F.hash(i * F.lit(101) + rep_i * F.lit(7919)), F.lit(2))
                    .cast("double")
                ),
            ).cast("array<float>")
        ),
    )
    write("embeddings", emb, files=16)
    print("sf10 written to", DST, flush=True)


if __name__ == "__main__":
    main()
