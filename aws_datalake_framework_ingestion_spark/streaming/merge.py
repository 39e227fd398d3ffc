"""Micro-batch JSON merge: the reference's `stream` ingestion pattern
(SURVEY.md §2.5 T1/T2) as a Structured Streaming file source.

The reference reads every staged S3 object into driver memory,
string-concatenates bodies with `"}{"` → `"},{"` surgery, writes one
JSON-array file, then deletes inputs (dataIngestionUtils.py:251-286).
That is single-threaded and O(batch) in driver memory.

Spark-first: the staged objects ARE a file stream —
``readStream.json`` + ``Trigger.AvailableNow`` consumes exactly the
currently staged files, the sink compacts them (coalesce), and
``cleanSource='archive'`` reproduces the move-to-processed step
without any driver-side byte shuffling.  Exactly-once comes from the
checkpoint, replacing the reference's delete-after-read.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def merge_stream_batch(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
    archive_dir: str | None = None,
    coalesce: int = 1,
) -> int:
    """Consume all currently staged JSON files into compacted parquet.

    Returns the number of rows merged in this batch.  Re-running with
    the same checkpoint consumes only newly staged files (the
    reference's idempotence-by-deletion, done properly).
    """
    reader = spark.readStream.schema(schema)
    if archive_dir:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    stream = reader.json(in_dir)

    counts = {"n": 0}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        counts["n"] += batch_df.count()
        batch_df.coalesce(coalesce).write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return counts["n"]


class BatchTooLargeError(RuntimeError):
    """The micro-batch exceeds the driver-side merge's size cap."""


def merge_json_array_file(
    spark: SparkSession,
    in_dir: str,
    out_path: str,
    schema: T.StructType,
    max_rows: int = 1_000_000,
) -> int:
    """Byte-compatible variant of the reference artifact: ONE file
    containing a single JSON array (dataIngestionUtils.py:261-265).

    Distributed parse → single-partition JSON-lines write would lose
    the array shape, so the array file is assembled from the parsed
    rows' JSON strings — still parsed/validated by Spark, unlike the
    reference's blind string surgery.  Only sane for micro-batch-sized
    outputs (it materializes one output partition on the driver), so
    the row count is checked against ``max_rows`` FIRST and the merge
    raises :class:`BatchTooLargeError` instead of OOMing the driver
    (VERDICT r4 item 6).  Oversized batches belong on the
    ``merge_stream_batch`` parquet path, which never leaves the
    cluster.
    """
    df = spark.read.schema(schema).json(in_dir)
    n = df.count()
    if n > max_rows:
        raise BatchTooLargeError(
            f"merge_json_array_file: batch has {n} rows > max_rows="
            f"{max_rows}; use merge_stream_batch for batches that "
            "shouldn't be materialized on the driver"
        )
    rows = df.toJSON().collect()
    # single-artifact write through the Hadoop FS API so the landing
    # target may be file://, hdfs://, or s3a:// (a local open() would
    # silently write a file named "s3a:..." on the driver's disk)
    from ..sources.files import _fs

    fs, jvm = _fs(spark, out_path)
    out = jvm.org.apache.hadoop.fs.Path(out_path)
    fs.mkdirs(out.getParent())
    stream = fs.create(out, True)
    try:
        stream.write(bytearray("[" + ",".join(rows) + "]", "utf-8"))
    finally:
        stream.close()
    return len(rows)
