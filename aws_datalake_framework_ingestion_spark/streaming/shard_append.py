"""Streaming shard-append: a document stream is deduplicated against
the already-ingested corpus per micro-batch and appended as immutable
versioned SEGMENTS that training-shard materialization reads.

Bridges three proven pieces into the continuous-ingestion seam a
training pipeline runs 24/7 (the reference's streaming landing zone,
dataIngestionUtils.py:251-286, upgraded from "concatenate JSON" to
"content-dedup and publish"):

* per-batch content dedup = ``ns_incremental_dedup``'s fingerprint
  anti-join (32 B md5 keys; the join shuffles hashes, never text);
* the corpus storage = ``sources/versioned.py``'s immutable
  ``v=NNNNN`` directories with optimistic claim + pointer flip — here
  each version is a batch DELTA (segment), and the corpus is the
  UNION of segments, read with partition discovery so ``v`` is a
  partition column (as-of reads prune segments at the scan);
* the stream machinery = ``streaming/upsert.py``'s foreachBatch +
  AvailableNow + checkpoint recipe.

Exactly-once is CONTENT-level and rests on two properties:

1. a segment directory rename is atomic (a crash mid-write leaves an
   unreferenced ``_stage.tmp.*`` the versioned vacuum reaps; readers
   glob ``v=*`` and never see it);
2. a batch redelivered after a crash-between-side-effect-and-
   checkpoint-commit re-runs the anti-join against a corpus that now
   CONTAINS its fingerprints, so zero survivors remain and no second
   segment is published (empty batches publish nothing).

Together: any prefix of crashes/restarts converges to the same corpus
bytes as an uninterrupted run — pinned by
tests/test_streaming.py::test_shard_append_crash_mid_batch_resume.

Within a batch, duplicates keep the LOWEST doc_id; across batches the
first-arriving fingerprint wins (later re-crawls of the same content
are dropped).  At 100 TB the anti-join's corpus side is one pruned
column (fp) of an append-only dataset — a compact fingerprint scan
per batch; for lower latency keep a dedicated fp index segment
alongside (same join, smaller scan).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.versioned import _version_dirs, write_version


def corpus_fps(spark: SparkSession, corpus_dir: str) -> DataFrame | None:
    """Fingerprint column of every committed segment (None when the
    corpus has no segments yet).  Column pruning means this scan reads
    ONLY the fp column at any corpus size."""
    if not _version_dirs(spark, corpus_dir):
        return None
    return read_corpus(spark, corpus_dir).select("fp")


def read_corpus(
    spark: SparkSession, corpus_dir: str, as_of: int | None = None
) -> DataFrame:
    """The corpus as the union of committed segments, with the segment
    number as partition column ``v``.  ``as_of`` time-travels to the
    corpus after segment N — partition pruning, not a data filter."""
    base = corpus_dir.rstrip("/")
    df = spark.read.option("basePath", base).parquet(f"{base}/v=*")
    if as_of is not None:
        df = df.where(F.col("v") <= as_of)
    return df


def append_batch(
    spark: SparkSession, batch_df: DataFrame, corpus_dir: str
) -> int:
    """Dedup one batch against itself and the corpus, publish the
    survivors as the next immutable segment (nothing published when
    no survivors — the idempotency hinge for redelivered batches).
    Returns the number of appended docs."""
    w = Window.partitionBy("fp").orderBy("doc_id")
    fresh = (
        batch_df.withColumn("fp", F.md5("text"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    existing = corpus_fps(spark, corpus_dir)
    if existing is not None:
        fresh = fresh.join(existing, "fp", "left_anti")
    survivors = fresh.select("doc_id", "text", "fp").persist()
    try:
        n = survivors.count()
        if n:
            write_version(spark, survivors, corpus_dir)
    finally:
        survivors.unpersist()
    return n


def stream_shard_append(
    spark: SparkSession,
    in_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> None:
    """Consume all currently staged JSON document files (AvailableNow)
    and append their novel content to the versioned corpus.  Re-running
    with the same checkpoint consumes only newly staged files; a
    redelivered batch appends nothing (see module doc)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(in_dir)

    def sink(batch_df: DataFrame, _epoch: int) -> None:
        append_batch(spark, batch_df, corpus_dir)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def shards_from_corpus(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    budget: int = 2048,
    as_of: int | None = None,
) -> DataFrame:
    """Materialize training shards from the (optionally as-of) corpus —
    byte-deterministic for a given corpus state, so re-publishing the
    same snapshot rewrites identical shards (shards.materialize_shards
    contract); returns the manifest."""
    from ..shards import materialize_shards

    docs = read_corpus(spark, corpus_dir, as_of=as_of).select(
        "doc_id", "text"
    )
    return materialize_shards(
        spark, docs, posixpath.join(out_dir), budget=budget
    )
