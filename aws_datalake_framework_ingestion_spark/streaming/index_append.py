"""Continuous ANN-index ingestion: an embedding stream is appended
to a persisted vector index per micro-batch — the similarity-search
twin of streaming/shard_append.py's corpus ingestion, completing the
round-13 index-maintenance family's 24/7 posture (a training-data
platform's embeddings arrive as a stream exactly like its documents;
the reference's streaming landing zone is dataIngestionUtils.py:
251-286).

Composes three proven pieces:

* the persisted index lifecycle (operators/similarity.py round 13):
  each batch is assigned/hashed/encoded against the FROZEN model —
  O(|batch| · model) work, the standing segments untouched;
* id-level exactly-once = shard_append's fingerprint posture applied
  to vector ids: a batch redelivered after a crash-between-publish-
  and-checkpoint-commit anti-joins against the index's stored id
  column (32 B/row pruned scan) and re-publishes nothing;
* the stream machinery = foreachBatch + AvailableNow + checkpoint.

Within a batch duplicate ids keep the first row (arbitrary-but-
deterministic via min struct ordering is unnecessary — embeddings
are keyed upstream; we dedup defensively on the id).  Segment counts
stay bounded by the same compaction story as the corpus store
(shard_append.compact_corpus works on any v=* segment union, and
read_ivf_index reads through a _BASE the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def append_batch_to_index(
    spark: SparkSession,
    batch_df: DataFrame,
    index_dir: str,
    kind: str = "ivf",
) -> int:
    """Append one micro-batch's NOVEL vectors to the persisted index
    (novel = id not already in any committed segment — the
    idempotency hinge for redelivered batches; nothing is published
    for an all-duplicate batch).  Returns the appended row count."""
    from ..operators import similarity as S

    model = S._read_index_model(spark, index_dir, kind)
    id_col = model["id_col"]
    fresh = batch_df.dropDuplicates([id_col])
    existing = S.read_ivf_index(spark, index_dir).select(id_col)
    fresh = fresh.join(existing, id_col, "left_anti").persist()
    try:
        n = fresh.count()
        if n:
            append = {
                "ivf": S.append_ivf_index,
                "lsh": S.append_lsh_index,
                "pq": S.append_pq_index,
            }[kind]
            append(spark, fresh, index_dir)
    finally:
        fresh.unpersist()
    return n


def stream_index_append(
    spark: SparkSession,
    in_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
    kind: str = "ivf",
    max_files_per_trigger: int | None = None,
) -> None:
    """Consume all currently staged JSON embedding files
    (AvailableNow) and append their novel vectors to the index.
    Re-running with the same checkpoint consumes only newly staged
    files; a redelivered batch appends nothing (module doc)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(in_dir)

    def sink(batch_df: DataFrame, _epoch: int) -> None:
        append_batch_to_index(spark, batch_df, index_dir, kind=kind)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
