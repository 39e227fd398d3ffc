"""Stream-shaped queries over `events` (SURVEY.md §2.5 + green-field
windows/watermarks).  These run the *batch* expressions of the
streaming semantics so they are oracle-checkable; the genuinely
stateful Structured Streaming forms (readStream + AvailableNow,
watermarks, session state) live in streaming/ and are exercised by
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ._util import T, dec_sum
from .registry import query


@query(
    "stream_tumbling_hour",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("stream", "window"),
)
def stream_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregate via F.window — the exact
    expression a writeStream would run incrementally."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_sum("value", "total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "stream_sliding_10m_5m",
    oracle="""
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts FROM events),
    w AS (
      SELECT make_timestamp(CAST(floor(epoch(ts)/300)*300*1000000 AS BIGINT)) AS window_start, ts FROM e
      UNION ALL
      SELECT make_timestamp(CAST((floor(epoch(ts)/300)*300 - 300)*1000000 AS BIGINT)), ts FROM e
    )
    SELECT window_start, CAST(count(*) AS BIGINT) AS n
    FROM w GROUP BY window_start
    """,
    tags=("stream", "window"),
)
def stream_sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 — each event lands in exactly
    two windows (the oracle enumerates both bucket offsets)."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "n",
        )
    )


@query(
    "stream_session_windows",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    m AS (
      -- event_id tie-breaks make BOTH window sorts total: with
      -- duplicate (user, ts) rows an ORDER BY ts alone lets the two
      -- windows order ties differently, splitting a session across
      -- the cumsum (caught by the r5 sf1 soak's replicated events)
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                          >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM e
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM m
    )
    SELECT user_id, min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    tags=("stream", "window", "session"),
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute gap via F.session_window — the
    same operator Structured Streaming runs stateful; oracle is the
    classic lag+cumsum rewrite."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            "n_events",
        )
    )


@query(
    "stream_dedup_first",
    oracle="""
    SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts FROM (
      SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("stream", "dedup"),
)
def stream_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the earliest event — deterministic form of
    dropDuplicates([...]) / dropDuplicatesWithinWatermark."""
    ev = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


@query(
    "stream_json_enrich",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS avg_k
    FROM events GROUP BY event_type
    """,
    tags=("stream", "json"),
)
def stream_json_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON extraction + aggregate (the `props` payload is what
    the reference's stream merge concatenates blindly,
    dataIngestionUtils.py:251-269 — here it is parsed and queryable)."""
    ev = T(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.get_json_object("props", "$.k").cast("double")).alias("avg_k"),
    )


@query(
    "stream_running_user_totals",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
    tags=("stream", "stateful"),
)
def stream_running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of streaming/stateful.running_user_totals (custom
    applyInPandasWithState operator): the final per-user state after
    the whole stream equals this global aggregate — asserted across
    micro-batches in tests/test_streaming.py."""
    ev = T(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value", "total_value"),
    )


_SESSIONIZE_SQL = """
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             lag(CAST(ts AS TIMESTAMP)) OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ) AS prev_ts
      FROM events
    ),
    marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR ts > prev_ts + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_start
      FROM e
    ),
    numbered AS (
      SELECT user_id, event_id, ts,
             CAST(sum(is_start) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_seq
      FROM marked
    )
    SELECT user_id, session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM numbered
    GROUP BY user_id, session_seq
"""


@query(
    "stream_sessionize_ids",
    oracle=_SESSIONIZE_SQL,
    tags=("stream", "window", "session"),
)
def stream_sessionize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by 30-min gap: lag → new-session marker →
    running-sum session sequence → per-session aggregate.  The classic
    window composition (the streaming twin is F.session_window in
    streaming/windows.py); identical SQL runs on both engines."""
    from ._util import sql_both

    return sql_both(spark, sf_dir, _SESSIONIZE_SQL)


_FUNNEL_SQL = """
    WITH e AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    s1 AS (
      SELECT user_id, min(ts) AS t1 FROM e
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_signup,
           CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_then_click,
           CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_then_purchase
"""


@query(
    "stream_funnel_steps",
    oracle=_FUNNEL_SQL,
    tags=("stream", "funnel", "agg"),
)
def stream_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel: users who signed up, then clicked AFTER
    the signup, then purchased AFTER that click — each stage is a
    keyed min-aggregate joined forward (strictly-ordered semantics,
    not three independent counts).  Every join/agg shuffles on
    user_id, so AQE collapses them onto one partitioning; identical
    SQL runs on both engines."""
    from ._util import sql_both

    return sql_both(spark, sf_dir, _FUNNEL_SQL)


@query(
    "stream_interval_join",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      FROM events
    )
    SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
           p.event_id AS purchase_id, p.ts AS purchase_ts
    FROM e c
    JOIN e p ON p.user_id = c.user_id
            AND p.ts > c.ts
            AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
    tags=("stream", "join", "interval"),
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the stream-stream interval join (streaming twin:
    streaming/windows.interval_join with watermarks bounding state):
    purchases attributed to a click by the same user within 30
    minutes.  Equi-key on user_id + range predicates — plans as a
    keyed join, never a cross product; the range condition is what
    lets streaming purge state."""
    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("_pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("_pu"))
            & (F.col("purchase_ts") > F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
            ),
        )
        .select("user_id", "click_id", "click_ts", "purchase_id", "purchase_ts")
    )


@query(
    "stream_static_enrich",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    tags=("stream", "join"),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension join: each micro-batch enriches events
    against a broadcast customer dimension (the canonical streaming
    enrichment — static side broadcast, stream side never shuffles for
    the join), then windowed per-segment aggregation.  Batch twin of
    readStream.join(static_dim); oracle-checked."""
    ev = T(spark, sf_dir, "events")
    cust = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        ev.join(F.broadcast(cust), "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), dec_sum("value", "total_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "c_mktsegment",
            "n",
            "total_value",
        )
    )


def _events_stream(spark: SparkSession, sf_dir: str):
    """readStream file source over the events parquet (the real
    Structured Streaming entry used by the stream_exec_* gate queries):
    schema inferred from a batch read, directory + glob so the file
    source accepts it, ns→µs ts normalization matching tables.load.
    The single events file yields a single micro-batch under
    Trigger.AvailableNow (no maxFilesPerTrigger set)."""
    import os

    from ..session import prep

    prep(spark)
    path = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        # partitioned dataset directory (any Spark-written layout,
        # e.g. the derived sf1 soak data): stream the directory itself
        stream = spark.readStream.schema(raw_schema).parquet(path)
    else:
        # single file directly inside sf_dir (driver testdata layout):
        # the file source wants a directory, so stream sf_dir with a
        # leaf-name glob.  NOTE the glob matches LEAF FILE names — it
        # would silently match nothing against a directory layout
        # (zero-file stream, empty results; bitten in the r5 soak).
        stream = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)")
        )
    return stream


def _stage_chunks(
    df, chunk_col, n_chunks: int, work: str, in_dir: str, name_fmt: str
) -> None:
    """Stage ``df`` as ``n_chunks`` JSON arrival files with strictly
    increasing modification times — in ONE partitioned write job
    (r14 optimization; was one coalesce(1) write job per chunk).

    ``chunk_col`` is an int Column in [0, n_chunks).  partitionBy
    drops the chunk column from the file content, so each staged file
    carries exactly the original columns; hash-repartitioning on the
    chunk value sends each chunk's rows to one task, so each
    ``chunk=i`` dir holds exactly one part file.  Row ORDER within a
    file may differ from a per-chunk coalesce write, which is
    immaterial to every caller: within-batch winners are resolved by
    explicit order columns, never by file position.  Empty chunks
    stage no file (the callers' historical behavior)."""
    import glob as _glob
    import os
    import shutil

    staged = os.path.join(work, "_staged")
    (
        df.withColumn("chunk", chunk_col.cast("int"))
        .repartition("chunk")
        .write.partitionBy("chunk")
        .json(staged)
    )
    t0 = 1_600_000_000  # fixed base mtime; only ORDER matters
    for i in range(n_chunks):
        parts = _glob.glob(os.path.join(staged, f"chunk={i}", "part-*"))
        if not parts:
            continue
        dst = os.path.join(in_dir, name_fmt.format(i))
        shutil.move(parts[0], dst)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))


def _run_to_memory(
    agg, name_prefix: str, output_mode: str, state_partitions: int | None = 8
):
    """Execute a streaming DataFrame into a memory sink under
    Trigger.AvailableNow and return the sink table.

    ``state_partitions`` sizes the stateful-operator partitioning for
    THIS query (a fresh checkpoint pins the count at first start, so
    it must be chosen up front — AQE never re-plans streaming state).
    Each HDFS-backed state store instance costs a few ms of open/
    commit I/O per micro-batch; at gate/bench scale that fixed cost
    dominates (measured 7.4 s → 2.3 s on the stream-stream join going
    32 → 8), while at production volume you raise it so each store's
    state fits in executor memory.  The session's shuffle-partition
    conf is restored afterwards; results are partitioning-independent
    (decimal sums / set-equal join output), so the knob is pure
    performance."""
    import shutil
    import tempfile
    import uuid

    spark = agg.sparkSession
    name = f"{name_prefix}_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix=f"{name_prefix}_ckpt_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


@query(
    "stream_exec_tumbling_hour",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("stream", "window", "exec"),
)
def stream_exec_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming execution inside the driver gate —
    not the batch-equivalent expression: a readStream file source over
    the same events parquet, incrementally aggregated per micro-batch
    into a memory sink (Trigger.AvailableNow, complete output mode),
    then returned as the sink's table.  Bit-equality with the batch
    oracle proves the incremental state machine computes exactly what
    one-shot batch does (decimal sums make the answer independent of
    micro-batch boundaries).  Complete mode needs no watermark and
    emits every window at termination; the production append-mode +
    watermark path (late-data drop, bounded state) is exercised in
    tests/test_streaming.py — complete mode here keeps the gate's
    comparison total rather than watermark-truncated."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_sum("value", "total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    return _run_to_memory(agg, "se_tumbling", "complete")


@query(
    "stream_exec_sliding_10m_5m",
    oracle="""
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts FROM events),
    w AS (
      SELECT make_timestamp(CAST(floor(epoch(ts)/300)*300*1000000 AS BIGINT)) AS window_start, ts FROM e
      UNION ALL
      SELECT make_timestamp(CAST((floor(epoch(ts)/300)*300 - 300)*1000000 AS BIGINT)), ts FROM e
    )
    SELECT window_start, CAST(count(*) AS BIGINT) AS n
    FROM w GROUP BY window_start
    """,
    tags=("stream", "window", "exec"),
)
def stream_exec_sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming execution of the sliding window (10 min / 5 min
    hop) — readStream → overlapping F.window state → memory sink,
    complete mode, AvailableNow.  Bit-equality with the batch oracle
    (each event lands in exactly two windows) proves the overlapped
    window state machine matches one-shot batch."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "n",
        )
    )
    return _run_to_memory(agg, "se_sliding", "complete")


@query(
    "stream_exec_session_windows",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    m AS (
      -- event_id tie-breaks make BOTH window sorts total: with
      -- duplicate (user, ts) rows an ORDER BY ts alone lets the two
      -- windows order ties differently, splitting a session across
      -- the cumsum (caught by the r5 sf1 soak's replicated events)
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                          >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM e
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM m
    )
    SELECT user_id, min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    tags=("stream", "window", "session", "exec"),
)
def stream_exec_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming sessionization — readStream → F.session_window
    merging state → memory sink, AvailableNow.  Complete output mode
    keeps all session state, so no watermark is needed (withWatermark
    would also force ts to TIMESTAMP_LTZ — staying NTZ avoids any
    session-timezone round trip) and the emitted sessions equal the
    batch lag+cumsum oracle bit-for-bit."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            "n_events",
        )
    )
    return _run_to_memory(agg, "se_session", "complete")


@query(
    "stream_exec_running_totals",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
    tags=("stream", "stateful", "exec"),
)
def stream_exec_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL custom-stateful streaming execution in the gate:
    applyInPandasWithState (streaming/stateful.running_user_totals)
    over readStream, update mode, memory sink.  The value column is
    pre-quantized to integer cents (floor(value·100), still carried as
    double) so the kernel's float accumulation is EXACT in any
    accumulation order below 2^53 — making a custom GroupState
    operator hash-verifiable against SQL.  Final state per user =
    row with the highest n_events (totals are cumulative, so max-n is
    the latest emission even if the source ever split into several
    micro-batches)."""
    from ..streaming.stateful import running_user_totals

    stream = _events_stream(spark, sf_dir).withColumn(
        "value", F.floor(F.col("value") * 100).cast("double")
    )
    out = _run_to_memory(
        running_user_totals(stream), "se_stateful", "update"
    )
    latest = out.groupBy("user_id").agg(
        F.max(F.struct("n_events", "total_value")).alias("s")
    )
    return latest.select(
        "user_id",
        F.col("s.n_events").alias("n_events"),
        F.col("s.total_value").alias("total_value"),
    )


@query(
    "stream_exec_interval_join",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      FROM events
    )
    SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
           p.event_id AS purchase_id, p.ts AS purchase_ts
    FROM e c
    JOIN e p ON p.user_id = c.user_id
            AND p.ts > c.ts
            AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
    tags=("stream", "join", "interval", "exec"),
)
def stream_exec_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-stream interval join in the gate: two independent
    readStream file sources (clicks / purchases), watermarks on both
    event-time columns, equi-key on user_id + a bounded time-range
    predicate, append mode into a memory sink.  The watermark + range
    bound is exactly what lets the streaming join PURGE state (a click
    older than watermark - 30 min can never match again); inner-join
    matches are emitted as they are found, so the single AvailableNow
    micro-batch reproduces the batch answer bit-for-bit — proving the
    stateful symmetric-hash join machinery, not just the expression.
    Batch twin: stream_interval_join."""
    # Watermarks require TIMESTAMP (ltz): join on an ltz cast, render
    # back to ntz at the end (wall-clock identity in any fixed session
    # tz; the data window — Jan 2024 — avoids DST gaps).
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").cast("timestamp").alias("click_ts"),
        )
        .withWatermark("click_ts", "31 minutes")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("_pu"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").cast("timestamp").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "31 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("_pu"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
    ).select(
        "user_id",
        "click_id",
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
        "purchase_id",
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
    )
    return _run_to_memory(joined, "se_ssjoin", "append")


@query(
    "stream_exec_cdc_upsert",
    oracle="""
    SELECT user_id,
           event_id   AS last_event_id,
           event_type AS last_event_type,
           CAST(value AS DOUBLE) AS last_value
    FROM (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
             ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("stream", "cdc", "exec"),
)
def stream_exec_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming CDC pipeline through streaming/upsert.py: the
    events table is staged as four JSON change-files in ascending
    time order (modification times forced strictly increasing), a
    readStream file source consumes them ONE FILE PER MICRO-BATCH
    (maxFilesPerTrigger=1 — the file source picks files in mod-time
    order), and each batch folds into a keyed parquet table via
    upsert_batch (last-wins per user within the batch, keyed upsert
    against the table).  Because arrival order equals time order by
    construction, the surviving row per user is the row_number()=1
    row of the batch oracle — bit-equality proves the incremental
    keyed merge converges to exactly what one-shot batch computes,
    across four genuine table-rewrite generations.  Restart/
    exactly-once recovery for the same sink is exercised in
    tests/test_streaming.py.  Ref: the reference lands each
    extraction as a new file and tracks per-key state in its catalog
    (ingestion/utils/dataIngestionUtils.py:117-118, 234-249)."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T_

    from ..streaming.upsert import stream_upsert_parquet

    ev = T(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.col("value").cast("double").alias("value"),
        # total order key as a plain long (micros since epoch) —
        # JSON-safe, and computed with timestampdiff over NTZ (pure
        # field arithmetic): a cast through TIMESTAMP_LTZ would make
        # the order session-timezone-dependent (DST overlaps reorder)
        F.expr(
            "timestampdiff(MICROSECOND, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', "
            "CAST(ts AS TIMESTAMP_NTZ))"
        ).alias("seq"),
    )
    bounds = ev.agg(
        F.min("seq").alias("lo"), F.max("seq").alias("hi")
    ).collect()[0]
    lo, hi = bounds["lo"], bounds["hi"]
    n_chunks = 4
    step = max((hi - lo) // n_chunks + 1, 1)

    work = tempfile.mkdtemp(prefix="cdc_upsert_")
    in_dir = os.path.join(work, "changes")
    table_dir = os.path.join(work, "table")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(in_dir)
    try:
        # one-job staged arrival files (see _stage_chunks; the keyed
        # upsert resolves within-batch winners by (seq, event_id), so
        # in-file row order is immaterial)
        _stage_chunks(
            ev,
            F.expr(f"(seq - {lo}) DIV {step}"),
            n_chunks,
            work,
            in_dir,
            "chg_{:02d}.json",
        )

        schema = T_.StructType(
            [
                T_.StructField("user_id", T_.LongType()),
                T_.StructField("event_id", T_.LongType()),
                T_.StructField("event_type", T_.StringType()),
                T_.StructField("value", T_.DoubleType()),
                T_.StructField("seq", T_.LongType()),
            ]
        )
        stream_upsert_parquet(
            spark,
            in_dir,
            table_dir,
            ckpt,
            schema,
            key_cols=["user_id"],
            order_cols=["seq", "event_id"],
            max_files_per_trigger=1,
        )
        out = (
            spark.read.parquet(table_dir)
            .select(
                "user_id",
                F.col("event_id").alias("last_event_id"),
                F.col("event_type").alias("last_event_type"),
                F.col("value").alias("last_value"),
            )
            .localCheckpoint()  # pin before the temp table is removed
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


@query(
    "stream_exec_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("stream", "dedup", "exec"),
)
def stream_exec_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming exact deduplication — the ingestion-idempotency
    operator executed through Structured Streaming, not its batch
    equivalent: readStream file source → dropDuplicates on the key
    columns (keyed state store holds one entry per distinct key) →
    append-mode memory sink under Trigger.AvailableNow.

    The projection keeps ONLY the dedup keys before dropDuplicates,
    which is what makes the gate deterministic: WHICH physical row
    survives depends on arrival order across file-source partitions,
    but a keys-only row is identical for every duplicate, so the
    output is the exact distinct key set regardless of scheduling.
    (The payload-carrying variant with bounded state is
    streaming/windows.dedup_within_watermark, exercised in
    tests/test_streaming.py where arrival order is controlled.)

    At 100 TB the state is one entry per DISTINCT key — bounded by
    key cardinality, not stream length; unbounded-key streams use the
    watermarked variant so state ages out."""
    stream = _events_stream(spark, sf_dir)
    dedup = stream.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    return _run_to_memory(dedup, "se_dedup", "append")


@query(
    "stream_exec_append_watermark",
    oracle="""
    WITH e AS (
      SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
    ),
    wmb AS (SELECT ((max(us) // 1000) - 1800000) * 1000 AS wm FROM e),
    g AS (
      SELECT (us // 3600000000) * 3600000000 AS ws,
             CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY 1
    )
    SELECT make_timestamp(ws) AS window_start, n
    FROM g, wmb WHERE ws + 3600000000 <= wm
    """,
    tags=("stream", "window", "watermark", "exec"),
)
def stream_exec_append_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL append-mode watermark emission, checked bit-for-bit
    against a SQL mimic of the state machine: events split into two
    micro-batches by event-id parity (file source, mod-time order,
    one file per trigger), hour-windowed counts under a 30-minute
    watermark, APPEND output.  What the gate pins:

    * the emission BOUNDARY — append emits a window exactly when the
      watermark passes its end; windows still open at termination are
      withheld (the complete-mode twin stream_exec_tumbling_hour
      emits them — the two gates differ by exactly the tail set);
    * watermark ARITHMETIC to the millisecond — event-time stats
      truncate µs → ms before the 30-min delay subtraction, and the
      oracle reproduces ((max_µs div 1000) − 1 800 000) · 1000;
    * cross-batch state MERGE — batch B's rows land in windows whose
      end is behind the in-effect watermark but whose state has not
      yet been evicted (eviction happens at commit, after merge), so
      they are COUNTED, matching one-shot batch totals — verified
      empirically (numRowsDroppedByWatermark = 0; Spark's append
      aggregation merges into any not-yet-evicted window).

    The final no-data micro-batch advances the watermark to
    max(ts) − 30 min and flushes every closed window.  Append/
    watermark pytest coverage (restart, state bounds, UPDATE-mode
    late handling) lives in tests/test_streaming.py."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T_

    ev = T(spark, sf_dir, "events").select(
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', "
            "CAST(ts AS TIMESTAMP_NTZ))"
        ).alias("us"),
    )
    work = tempfile.mkdtemp(prefix="late_drop_")
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir)
    try:
        # one-job staged arrival files (even/odd split; aggregation
        # results are order-free)
        _stage_chunks(
            ev, F.col("event_id") % 2, 2, work, in_dir, "batch_{:02d}.json"
        )

        schema = T_.StructType(
            [
                T_.StructField("event_id", T_.LongType()),
                T_.StructField("us", T_.LongType()),
            ]
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(in_dir)
            .select(F.timestamp_micros(F.col("us")).alias("ts"))
            .withWatermark("ts", "30 minutes")
        )
        agg = (
            stream.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.col("w.start").cast("timestamp_ntz").alias("window_start"),
                "n",
            )
        )
        out = _run_to_memory(agg, "se_append_wm", "append").localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


@query(
    "stream_exec_update_mode",
    oracle="""
    WITH e AS (
      SELECT event_id,
             (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000)
               * 3600000000 AS ws
      FROM events
    ),
    a AS (SELECT ws FROM e WHERE event_id % 2 = 0),
    b AS (SELECT ws FROM e WHERE event_id % 2 = 1),
    ga AS (SELECT ws, CAST(count(*) AS BIGINT) AS n FROM a GROUP BY ws),
    gall AS (
      SELECT ws, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT ws FROM a UNION ALL SELECT ws FROM b) GROUP BY ws
    ),
    gb AS (SELECT DISTINCT ws FROM b)
    SELECT make_timestamp(ws) AS window_start, n FROM ga
    UNION ALL
    SELECT make_timestamp(gall.ws), gall.n FROM gall JOIN gb USING (ws)
    """,
    tags=("stream", "window", "exec"),
)
def stream_exec_update_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL update-mode emission — the third leg of the output-mode
    triad (complete: stream_exec_tumbling_hour; append:
    stream_exec_append_watermark): hour-window counts over two staged
    micro-batches (event-id parity, mod-time order, one file per
    trigger, no watermark so state never evicts), UPDATE output into a
    memory sink.  Update mode re-emits exactly the windows a batch
    CHANGED, so the sink is a MULTISET — batch A's counts for every
    window A touched, then batch B's refreshed A+B counts for every
    window B touched; a window touched by both appears twice with two
    different counts.  The oracle reproduces that multiset
    relationally, so per-batch change detection (not just the final
    state) is value-hash-pinned."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T_

    ev = T(spark, sf_dir, "events").select(
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', "
            "CAST(ts AS TIMESTAMP_NTZ))"
        ).alias("us"),
    )
    work = tempfile.mkdtemp(prefix="upd_mode_")
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir)
    try:
        # one-job staged arrival files (even/odd split; per-batch
        # multiset emissions depend on batch MEMBERSHIP, not order)
        _stage_chunks(
            ev, F.col("event_id") % 2, 2, work, in_dir, "batch_{:02d}.json"
        )

        schema = T_.StructType(
            [
                T_.StructField("event_id", T_.LongType()),
                T_.StructField("us", T_.LongType()),
            ]
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(in_dir)
            .select(F.timestamp_micros(F.col("us")).alias("ts"))
        )
        agg = (
            stream.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.col("w.start").cast("timestamp_ntz").alias("window_start"),
                "n",
            )
        )
        out = _run_to_memory(agg, "se_update", "update").localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


@query(
    "stream_exec_shard_append",
    oracle="""
    WITH win AS (
      SELECT doc_id, text, doc_id % 3 AS b
      FROM (
        SELECT doc_id, text,
               row_number() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id % 3, doc_id) AS rn
        FROM documents
      ) WHERE rn = 1
    )
    SELECT doc_id, md5(text) AS fp,
           CAST(dense_rank() OVER (ORDER BY b) AS INT) AS seg
    FROM win
    """,
    tags=("stream", "dedup", "exec", "versioned"),
)
def stream_exec_shard_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming corpus ingestion through
    streaming/shard_append.py: documents are staged as three JSON
    arrival files (doc_id % 3, modification times strictly
    increasing), a readStream file source consumes them ONE FILE PER
    MICRO-BATCH, and each batch's content-novel docs (md5(text)
    anti-join against all previously committed segments; lowest
    doc_id wins in-batch) are published as the next immutable
    versioned segment.  The query then materializes training shards
    from the corpus, AUDITS them against their manifest (any non-ok
    shard fails the query loudly), and returns the corpus with each
    doc's fingerprint and segment number.  The oracle recomputes
    first-arrival-wins dedup and the segment numbering (dense_rank
    over batches that contributed novel content — exactly the
    publish-only-nonempty rule); bit-equality proves the incremental
    stream converges to the one-shot dedup AND that segment
    assignment matches arrival order.  Crash/redelivery exactly-once
    for the same sink is pinned in tests/test_streaming.py.  Ref:
    reference streaming landing zone dataIngestionUtils.py:251-286."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T_

    from ..shards import validate_shards
    from ..streaming.shard_append import (
        read_corpus,
        shards_from_corpus,
        stream_shard_append,
    )

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="shard_append_")
    in_dir = os.path.join(work, "arrivals")
    corpus = os.path.join(work, "corpus")
    shard_dir = os.path.join(work, "shards")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(in_dir)
    try:
        # one-job staged arrival files (within-batch winners resolve
        # by doc_id, so in-file row order is immaterial)
        _stage_chunks(
            docs, F.col("doc_id") % 3, 3, work, in_dir, "arr_{:02d}.json"
        )

        schema = T_.StructType(
            [
                T_.StructField("doc_id", T_.LongType()),
                T_.StructField("text", T_.StringType()),
            ]
        )
        stream_shard_append(
            spark, in_dir, corpus, ckpt, schema, max_files_per_trigger=1
        )
        # end-to-end: corpus -> shards -> audit (loud on any drift)
        shards_from_corpus(spark, corpus, shard_dir, budget=2048)
        bad = (
            validate_shards(spark, shard_dir)
            .where(F.col("status") != "ok")
            .count()
        )
        if bad:
            raise RuntimeError(
                f"stream_exec_shard_append: {bad} shards failed the "
                "manifest audit"
            )
        out = (
            read_corpus(spark, corpus)
            .select("doc_id", "fp", F.col("v").cast("int").alias("seg"))
            .localCheckpoint()  # pin before the workspace is removed
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out
