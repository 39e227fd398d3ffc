"""Sinks (SURVEY.md §2.2): partitioned parquet/csv/json writers and
the single-file landing mode.

The reference's only data sink is `repartition(1).write.csv`
(dataIngestionUtils.py:117-118) — a full shuffle into one task.  The
engine default is partitioned parquet; single-file mode uses
coalesce(1) (no shuffle) and exists only for artifact-compatibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K1/K5: CSV landing/export, header on, distributed."""
    df.write.mode(mode).option("header", True).csv(path)


def write_single_file(df: DataFrame, path: str, fmt: str = "csv") -> None:
    """K1 single-artifact mode (reference repartition(1), :118) via
    coalesce — one output task without the round-robin shuffle.

    Formats: csv / json / orc / parquet (all built into the Spark
    distribution here; avro needs the external spark-avro module, so
    it is rejected with a clear error rather than a jar-not-found)."""
    w = df.coalesce(1).write.mode("overwrite")
    if fmt == "csv":
        w.option("header", True).csv(path)
    elif fmt == "json":
        w.json(path)
    elif fmt == "orc":
        w.orc(path)
    elif fmt == "parquet":
        w.parquet(path)
    elif fmt == "avro":
        raise ValueError(
            "avro needs the spark-avro package, which is not bundled "
            "with this Spark distribution — use parquet/orc/csv/json"
        )
    else:
        raise ValueError(
            f"unrecognized format {fmt!r}: supported formats are "
            "csv, json, orc, parquet"
        )


def compact_parquet(
    spark,
    path: str,
    target_files: int | None = None,
    target_mb: int = 128,
) -> int:
    """Small-file compaction — the OSS analog of Delta OPTIMIZE and the
    parquet-level version of the reference's stream-merge motivation
    (many tiny S3 objects → few right-sized files, SURVEY.md §4.1).

    Rewrites the dataset into ~``target_files`` files TOTAL (default:
    sized so each file is ~``target_mb``), staged + atomically swapped
    so readers never see a partial dataset.  Returns the number of
    parquet files actually written (counted from the rewritten
    dataset, not the requested budget).

    Sizing goes through the Hadoop FS API, RECURSIVELY: a flat local
    os.listdir would see zero parquet files for a hive-partitioned
    dataset (files live under ``col=value/`` subdirs) and silently
    coalesce the whole table into ONE file — the same listing bug
    class fixed in sources/manifest._live_parquet_files — and would
    fail outright on hdfs:// or s3a:// paths.

    A partitioned layout is preserved, and — critically for the
    100 TB nightly-OPTIMIZE posture — a HOT partition value is split
    across MANY tasks/files: the rewrite range-partitions on
    (partition_cols..., content_salt), so each partition value gets
    output slots proportional to its row share and a skewed value
    (one ``lang`` holding most of the corpus) never funnels through
    one task into one giant file.  (The r7 implementation
    hash-repartitioned on the partition columns ALONE, which put every
    row of a value in a single task — exactly the single-task cliff
    this module's grouped_ntile cousin exists to avoid; VERDICT r7
    item 2.)  The salt is ``xxhash64`` of the data columns —
    deterministic under task retry, unlike rand().  Range boundaries
    come from Spark's sampling pass, so the rewrite scans the source
    twice; that is the normal cost of a balanced maintenance rewrite.
    A range task can hold several SMALL partition values and writes
    one (small) file per value, so the true file count can exceed the
    budget for tiny partitions — which is why the actual count is
    re-listed and returned.

    Degenerate case (ADVICE r9): if EVERY column is a partition
    column, the salt falls back to hashing the partition columns
    themselves, so it is constant within each value group and the
    range split collapses to one file per group — target-size
    splitting cannot apply because rows within a group are literally
    identical and carry no data to split on.  Such frames are
    metadata-shaped (a partition-values inventory), not data-shaped;
    if one ever needs size-splitting, add a stable secondary key
    (e.g. a per-file ordinal from the input manifest) before
    compacting.  See SCALING.md §"Round-8 scale lessons" (compaction)
    for the posture.
    """
    import math
    import uuid

    from pyspark.sql import functions as F

    from .sources.files import _fs, staged_swap

    df = spark.read.parquet(path)
    fs, jvm = _fs(spark, path)

    def _scan(root: str) -> tuple[int, int, set]:
        """(n_parquet_files, total_bytes, partition_cols) below root —
        partition columns detected from name=value path segments."""
        base = (
            fs.makeQualified(jvm.org.apache.hadoop.fs.Path(root))
            .toString()
            .rstrip("/")
        )
        it = fs.listFiles(jvm.org.apache.hadoop.fs.Path(root), True)
        n, total, cols = 0, 0, set()
        while it.hasNext():
            st = it.next()
            p = st.getPath()
            if not p.getName().endswith(".parquet"):
                continue
            n += 1
            total += st.getLen()
            seg = p.getParent()
            while seg is not None and seg.toString().rstrip("/") != base:
                name = seg.getName()
                if "=" in name:
                    cols.add(name.split("=", 1)[0])
                seg = seg.getParent()
        return n, total, cols

    _, total, part_cols = _scan(path)
    if target_files is None:
        target_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    tmp = f"{path.rstrip('/')}.compact.{uuid.uuid4().hex[:8]}"
    pc = sorted(part_cols)
    if pc:
        data_cols = [c for c in df.columns if c not in part_cols]
        # content hash, not rand()/monotonically_increasing_id():
        # deterministic if a task retries (the all-partition-column
        # fallback hashes every column — constant per value group, so
        # the range split degenerates to one bucket per group, but
        # stays retry-stable)
        salt = F.xxhash64(*[df[c] for c in (data_cols or df.columns)])
        salt_col = f"_salt_{uuid.uuid4().hex[:8]}"
        (
            df.withColumn(salt_col, salt)
            .repartitionByRange(
                target_files, *[F.col(c) for c in pc], F.col(salt_col)
            )
            .drop(salt_col)
            .write.mode("overwrite")
            .partitionBy(*pc)
            .parquet(tmp)
        )
    else:
        df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    n_written, _, _ = _scan(tmp)
    # scheme-aware publish (file://+HDFS atomic; S3A posture in
    # SCALING.md §"Object-store (S3A) semantics")
    staged_swap(spark, path, tmp)
    return n_written


def write_bucketed(
    df,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table — the co-located-join layout (SURVEY §7):
    rows are hash-partitioned into ``n_buckets`` files by
    ``bucket_cols`` AT WRITE TIME, so later equi-joins/aggregations on
    those columns read pre-shuffled data and plan with ZERO Exchange
    (see tests/test_bucketing.py for the plan proof).

    At 100 TB this is the difference between re-shuffling the fact
    table on every join and paying the shuffle once at ingestion: two
    tables bucketed the same way sort-merge-join with no network at
    all.  Requires saveAsTable (bucket metadata lives in the session
    catalog / metastore)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table, format="parquet")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits_per_dim: int = 4,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered write — multi-dimensional data skipping
    (the OSS analog of Delta/Iceberg ``OPTIMIZE ZORDER BY``).

    Partitioning a file layout by ONE column prunes predicates on that
    column only; interleaving the bits of several columns' quantile
    ranks into one Morton key and range-partitioning + sorting on it
    makes every output file narrow in EVERY listed dimension, so
    parquet row-group min/max stats prune scans filtered on any of
    them.

    Mechanics (all scale-safe): per column, ``approxQuantile`` yields
    ``2^bits_per_dim`` bucket boundaries (driver model state, one pass);
    each row's bucket index per dim is a vectorized
    boundaries-below-value count; the z-value interleaves those index
    bits.  File placement is EXACT-block, not range-sampled:
    ``repartitionByRange`` draws a random-seeded sample per execution,
    so its boundaries wobble off the z-block edges and an unlucky file
    straddles a dimension's MSB flip (full-span file — observed
    flaky).  Instead each row's z-block id maps through a driver-built
    bijection onto hash-partition slots (one tiny deterministic job
    finds tokens whose Murmur3 pmod is a permutation), so every output
    file IS one contiguous z-block: per-file span is range/2 and
    range/4 for 2-D at n_files=8, by construction, every run.
    Pruning benefit is asserted in tests/test_bucketing.py.
    """
    from pyspark.sql import functions as F

    n_buckets = 1 << bits_per_dim
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bucket_cols = []
    for c in cols:
        bounds = df.approxQuantile(c, probs, 0.001)
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket_cols.append(
            F.aggregate(
                arr,
                F.lit(0),
                lambda acc, b: acc + (F.col(c).cast("double") > b).cast("int"),
            )
        )
    z = F.lit(0)
    for bit in range(bits_per_dim):
        for d, bc in enumerate(bucket_cols):
            z = z + F.shiftleft(
                F.shiftright(bc, bit).bitwiseAND(F.lit(1)),
                bit * len(bucket_cols) + d,
            )
    n_z = 1 << (bits_per_dim * len(cols))
    # token t_k per block k with pmod(hash(t_k), n_files) a permutation:
    # hash-repartitioning on the mapped token puts each z-block in its
    # own output partition, deterministically (F.hash == the Murmur3
    # HashPartitioning uses).
    spark = df.sparkSession
    tokens: dict[int, int] = {}
    width = 64 * n_files
    while len(tokens) < n_files:
        cand = (
            spark.range(width)
            .select(
                F.col("id"), F.pmod(F.hash(F.col("id")), F.lit(n_files)).alias("m")
            )
            .collect()
        )
        for r in cand:
            tokens.setdefault(r["m"], r["id"])
        width *= 4
    tok_arr = F.array(*[F.lit(int(tokens[i])) for i in range(n_files)])
    blk = F.floor(z * n_files / F.lit(n_z)).cast("int")
    (
        df.withColumn("_z", z)
        .withColumn("_zt", F.element_at(tok_arr, blk + 1))
        .repartition(n_files, "_zt")
        .sortWithinPartitions("_z")
        .drop("_z", "_zt")
        .write.mode(mode)
        .parquet(path)
    )
