"""Derive a deterministic sf1 dataset (10x sf0.1) for the soak run.

VERDICT r4 item 2 asks for an sf1 exactness + bench soak (lineitem
6M).  The driver only ships sf0.001/0.01/0.1 and /root/testdata is
read-only, so sf1 is DERIVED from sf0.1 into scratch/sf1 (gitignored,
soak-only — the driver contract keeps using the official dirs):

* 10 replicas with key-space offsets chosen to preserve referential
  integrity (orders.o_custkey follows customer's offset, lineitem
  follows orders/part/supplier, etc.);
* region/nation stay as-is (tiny dims — replication would break the
  25-nation TPC-H shape queries assume);
* documents get a per-replica suffix token (and recomputed n_chars)
  so the corpus isn't 10 exact clones of itself — dedup operators see
  realistic near-scale text, not a degenerate 10-way dup cluster;
* embeddings get per-(dim, replica) deterministic sign flips: within
  a replica all cosines are preserved exactly, across replicas the
  sign patterns decorrelate vectors, so similarity gates keep their
  planted/natural separation.

Everything is pure column arithmetic — same bytes on every run.
Output is written with 8 files per table so sf1 scans are multi-split
(exactness at sf1 therefore also re-proves aggregation order-freedom).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.getcwd(), "scratch", "sf1")
REPLICAS = 10

OFF = {
    "c_custkey": 100_000,
    "s_suppkey": 10_000,
    "p_partkey": 100_000,
    "o_orderkey": 1_000_000,
    "event_id": 1_000_000,
    "doc_id": 10_000,
    "vec_id": 10_000,
}


def replicate(df: DataFrame, rep: int, keymap: dict[str, str]) -> DataFrame:
    out = df
    for col, base in keymap.items():
        out = out.withColumn(col, (F.col(col) + rep * OFF[base]).cast("long"))
    return out


def main() -> None:
    from aws_datalake_framework_ingestion_spark.session import get_session
    from aws_datalake_framework_ingestion_spark.tables import load

    spark = get_session(app_name="gen-sf1")
    os.makedirs(DST, exist_ok=True)

    def write(name: str, df: DataFrame, files: int = 8) -> None:
        df.repartition(files).write.mode("overwrite").parquet(
            os.path.join(DST, f"{name}.parquet")
        )
        print(name, spark.read.parquet(os.path.join(DST, f"{name}.parquet")).count())

    # tiny dims: verbatim
    for name in ("region", "nation"):
        write(name, load(spark, SRC, name), files=1)

    # events keeps the DRIVER's physical schema — TIMESTAMP(NANOS),
    # which Spark can't write (outputTimestampType has no NANOS) but
    # pyarrow can.  Loading through tables.load / readStream depends
    # on the nanosAsLong bigint shape, and the DuckDB oracles CAST a
    # TIMESTAMP_NS column — a µs rewrite broke all 7 streaming rows
    # in the first soak run.
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src_tbl = pq.read_table(os.path.join(SRC, "events.parquet"))
    reps = []
    for r in range(REPLICAS):
        t = src_tbl
        if r > 0:
            ids = pc.add(t["event_id"], pa.scalar(r * OFF["event_id"], pa.int64()))
            t = t.set_column(t.schema.get_field_index("event_id"), "event_id", ids)
        reps.append(t)
    big = pa.concat_tables(reps)
    ev_dir = os.path.join(DST, "events.parquet")
    os.makedirs(ev_dir, exist_ok=True)
    n_files = 8
    per = (big.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        pq.write_table(
            big.slice(i * per, per), os.path.join(ev_dir, f"part-{i:03d}.parquet")
        )
    print("events", pq.read_table(ev_dir).num_rows)

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
        base = load(spark, SRC, name)
        parts = [replicate(base, r, keymap) for r in range(REPLICAS)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        write(name, df)

    # documents: suffix token per replica keeps the corpus non-clonal
    docs = load(spark, SRC, "documents")
    parts = []
    for r in range(REPLICAS):
        d = docs.withColumn(
            "doc_id", (F.col("doc_id") + r * OFF["doc_id"]).cast("long")
        )
        if r > 0:
            d = d.withColumn(
                "text", F.concat(F.col("text"), F.lit(f" qrep{r}"))
            ).withColumn("n_chars", F.length("text").cast("int"))
        parts.append(d)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    write("documents", df)

    # embeddings: deterministic per-(dim, replica) sign flips
    emb = load(spark, SRC, "embeddings")
    parts = []
    for r in range(REPLICAS):
        e = emb.withColumn(
            "vec_id", (F.col("vec_id") + r * OFF["vec_id"]).cast("long")
        )
        if r > 0:
            sign = (
                lambda rr: lambda x, i: x
                * (
                    F.lit(1.0)
                    - F.lit(2.0)
                    * F.pmod(F.hash(i * F.lit(101) + F.lit(rr * 7919)), F.lit(2))
                    .cast("double")
                )
            )(r)
            e = e.withColumn(
                "embedding",
                F.transform(F.col("embedding"), sign).cast("array<float>"),
            )
        parts.append(e)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    write("embeddings", df)
    print("sf1 written to", DST)


if __name__ == "__main__":
    main()
