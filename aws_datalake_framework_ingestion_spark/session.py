"""SparkSession factory + runtime conf preparation.

Two entry points:

* :func:`get_session` — build a tuned local session (tests, bench).
* :func:`prep` — apply the *runtime-settable* confs to an existing
  session (the correctness driver owns its own SparkSession; every
  query callable must be correct under a foreign session, so each one
  funnels through ``prep``).

Scale posture: AQE on (runtime coalescing, skew-join splitting,
runtime broadcast conversion), shuffle partitions sized to cores for
local mode (a real cluster would size to ~2-3x total cores and let AQE
coalesce), UTC session time so timestamp semantics are stable across
driver environments.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe to set on a live session (SQL runtime confs).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    # testdata events.parquet carries TIMESTAMP(NANOS) which Spark's
    # vectorized reader refuses by default; read as ns-longs and
    # convert explicitly (tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Split files at 4 MB so bench-scale single-file tables still scan
    # in parallel (defaults tuned for 128 MB+ cluster files).  Safe for
    # correctness: every oracle query aggregates order-free (decimal
    # sums / exact formulas — see plans/registry.py notes), so results
    # don't depend on the split count.
    "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
    # Arrow for every pandas interchange (toPandas, pandas_udf).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # r14: restore the pre-4.1 checkpoint write path.  Spark 4.1's
    # ChecksumCheckpointFileManager wraps EVERY state-store/commit-log
    # file in an async checksum write whose close() blocks on a
    # per-manager thread pool — profiled during the bench: 128 live
    # checksum pools, ~10 threads/s churn, and state-store commits
    # parked in awaitResult; disabling it took the stream-stream
    # interval-join gate from 6.4-7.2 s to 4.2-4.7 s warm (−35%).
    # Integrity of local-FS checkpoints is the filesystem's job here;
    # deployments on object storage that want end-to-end checksum
    # verification can re-enable per session (the reader honors
    # checksum-less files either way).
    "spark.sql.streaming.checkpoint.fileChecksum.enabled": "false",
}


_PREPPED: set[str] = set()


def prep(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to a possibly-foreign session. Idempotent —
    and applied once per application (each conf.set is a py4j round
    trip; load() calls prep on every table)."""
    app_id = spark.sparkContext.applicationId
    if app_id in _PREPPED:
        return spark
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # A conf may be non-settable on some builds; queries must
            # degrade rather than die on conf application.
            pass
    _PREPPED.add(app_id)
    return spark


def get_session(
    app_name: str = "aws_datalake_framework_ingestion_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a local session tuned for this host.

    ``SPARK_GRAFT_CPUS`` (bench contract) overrides core count.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The default JIT code cache (240 MB) overflows after ~15
        # codegen-heavy queries in one JVM; HotSpot then flushes hot
        # compiled methods and whole queries fall back to the
        # interpreter (measured: same plan 0.6 s early in a session,
        # 5 s late).  1 GB keeps every generated class JIT'd for a
        # full bench/verify sweep.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return prep(spark)
