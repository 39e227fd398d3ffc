"""Bucketed-table co-located joins: the pay-the-shuffle-once-at-write
layout.  The assertions are on the PHYSICAL PLAN — at 100 TB a missing
bucket pruning means every join re-shuffles the fact table."""

from __future__ import annotations

import io
from contextlib import contextmanager, redirect_stdout

from pyspark.sql import functions as F

from aws_datalake_framework_ingestion_spark import sinks
from aws_datalake_framework_ingestion_spark.tables import load

from .conftest import SF_SMALL


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@contextmanager
def _no_broadcast(spark):
    """Force shuffle-side join planning: at test scale everything fits
    a broadcast, which would hide whether bucketing removed the
    shuffle (a 100 TB fact-fact join can't broadcast either side)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_no_shuffle(spark, tmp_path):
    li = load(spark, SF_SMALL, "lineitem")
    o = load(spark, SF_SMALL, "orders")
    sinks.write_bucketed(li, "b_lineitem", ["l_orderkey"], n_buckets=8)
    sinks.write_bucketed(o, "b_orders", ["o_orderkey"], n_buckets=8)
    try:
        a = spark.table("b_lineitem")
        b = spark.table("b_orders")
        with _no_broadcast(spark):
            joined = a.join(b, a.l_orderkey == b.o_orderkey).select(
                "l_orderkey", "l_quantity", "o_orderpriority"
            )
            plan = _plan(joined)
            # co-located: the sort-merge join consumes both bucketed
            # scans directly — no shuffle on either side
            assert "SortMergeJoin" in plan, plan
            assert "Exchange" not in plan, plan
            assert plan.count("SelectedBucketsCount") == 2, plan
            # correctness identical to the plain (shuffling) join
            plain = li.join(o, li.l_orderkey == o.o_orderkey).select(
                "l_orderkey", "l_quantity", "o_orderpriority"
            )
            assert sorted(map(tuple, joined.collect())) == sorted(
                map(tuple, plain.collect())
            )
        # a groupBy on the bucket key also rides the bucketing:
        # partial+final aggregate with no exchange in between
        agg_plan = _plan(
            a.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        )
        assert "Exchange" not in agg_plan, agg_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    """Z-ordered layout: every output file must be narrow in BOTH
    clustering columns (that's what makes min/max pruning fire for
    predicates on either one), and the rewrite must lose no rows."""
    from pyspark.sql import functions as F

    from aws_datalake_framework_ingestion_spark.sinks import write_zordered
    from aws_datalake_framework_ingestion_spark.tables import load

    li = load(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    out = str(tmp_path / "zorder")
    write_zordered(li, out, ["l_orderkey", "l_partkey"], n_files=8)

    back = spark.read.parquet(out)
    assert back.count() == li.count()

    per_file = (
        back.withColumn("_f", F.input_file_name())
        .groupBy("_f")
        .agg(
            (F.max("l_orderkey") - F.min("l_orderkey")).alias("ok_span"),
            (F.max("l_partkey") - F.min("l_partkey")).alias("pk_span"),
        )
        .collect()
    )
    assert len(per_file) >= 4
    glob = li.agg(
        (F.max("l_orderkey") - F.min("l_orderkey")).alias("ok"),
        (F.max("l_partkey") - F.min("l_partkey")).alias("pk"),
    ).first()
    avg_ok = sum(r["ok_span"] for r in per_file) / len(per_file)
    avg_pk = sum(r["pk_span"] for r in per_file) / len(per_file)
    # unclustered layout would give ~full span per file on both dims;
    # z-order must shrink the AVERAGE span in every dimension
    assert avg_ok < 0.6 * glob["ok"], (avg_ok, glob["ok"])
    assert avg_pk < 0.6 * glob["pk"], (avg_pk, glob["pk"])


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-partitioned layout (sinks.write_parquet partition_by) must
    surface as PartitionFilters at scan time: a predicate on the
    partition column prunes whole directories BEFORE any I/O — at
    100 TB with date partitions this is the difference between
    scanning one day and scanning the archive."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from aws_datalake_framework_ingestion_spark.sinks import write_parquet
    from aws_datalake_framework_ingestion_spark.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type"
    )
    path = str(tmp_path / "ev_part")
    write_parquet(ev, path, partition_by=["event_type"])

    df = spark.read.parquet(path).filter(F.col("event_type") == "click")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1].split("\n")[0]
    # pruning is real: only the matching directory's rows are read
    n_click = ev.filter(F.col("event_type") == "click").count()
    assert df.count() == n_click


def test_schema_evolution_merge_read(spark, tmp_path):
    """Additive schema evolution: a dataset written in two generations
    (second adds a column) reads back under mergeSchema with the
    union schema, old rows NULL-filled — the append-only contract an
    ingestion pipeline needs when sources grow columns mid-stream."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id: long, v: string"
    ).write.parquet(p)
    spark.createDataFrame(
        [(3, "c", 30)], "id: long, v: string, extra: int"
    ).write.mode("append").parquet(p)
    df = spark.read.option("mergeSchema", True).parquet(p)
    assert sorted(df.columns) == ["extra", "id", "v"]
    rows = {r["id"]: (r["v"], r["extra"]) for r in df.collect()}
    assert rows[1] == ("a", None) and rows[3] == ("c", 30)


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Dynamic partition pruning: a fact table partitioned on the join
    key must get a runtime `dynamicpruning` filter injected when
    joined to a SELECTIVELY-FILTERED dim — at 100 TB this prunes fact
    partitions using the dim filter's result at execution time, which
    a static PartitionFilters guard can't express (the pruning values
    are only known after the dim side runs)."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from aws_datalake_framework_ingestion_spark.sinks import write_parquet
    from aws_datalake_framework_ingestion_spark.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = str(tmp_path / "ev_dpp")
    write_parquet(ev, path, partition_by=["event_type"])
    fact = spark.read.parquet(path)

    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("purchase", 3), ("signup", 4), ("error", 5)],
        "event_type: string, type_id: int",
    )
    joined = fact.join(dim.filter(F.col("type_id") == 1), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    n_click = ev.filter(F.col("event_type") == "click").count()
    assert joined.first()["n"] == n_click


def test_manifest_prunes_files(spark, tmp_path):
    """File-stats manifest: a range-clustered dataset + min/max
    manifest lets a bounded probe read a strict subset of files while
    returning exactly the full-scan answer (pruning is a superset cut
    — correctness never depends on the manifest)."""
    from pyspark.sql import functions as F

    from aws_datalake_framework_ingestion_spark.sources.manifest import (
        pruned_files,
        read_pruned,
        write_manifest,
    )
    from aws_datalake_framework_ingestion_spark.tables import load

    li = load(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    path = str(tmp_path / "li")
    li.repartitionByRange(8, "l_extendedprice").write.parquet(path)
    n_files = write_manifest(spark, path, ["l_extendedprice"])
    assert n_files == 8

    lo, hi = 2000.0, 9000.0
    kept = pruned_files(spark, path, "l_extendedprice", lo, hi)
    assert 0 < len(kept) < n_files, kept  # pruning actually bit

    got = (
        read_pruned(spark, path, "l_extendedprice", lo, hi)
        .where(F.col("l_extendedprice").between(lo, hi))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_orderkey").alias("s"),
        )
        .collect()[0]
    )
    want = (
        spark.read.parquet(path)
        .where(F.col("l_extendedprice").between(lo, hi))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_orderkey").alias("s"),
        )
        .collect()[0]
    )
    assert (got["n"], got["s"]) == (want["n"], want["s"]) and got["n"] > 0

    # unbounded probe keeps everything; absent column degrades to full
    assert len(pruned_files(spark, path, "l_extendedprice")) == n_files
    assert read_pruned(spark, path, "nope").count() == li.count()


def test_manifest_stale_reconciles_with_live_listing(spark, tmp_path):
    """A stale manifest must degrade to reading MORE, never to wrong
    results: files appended after write_manifest are read
    unconditionally (no silent row loss), and manifest entries whose
    file was deleted since are dropped (no path-not-found crash)."""
    import os

    from pyspark.sql import functions as F

    from aws_datalake_framework_ingestion_spark.sources.manifest import (
        read_pruned,
        write_manifest,
    )

    path = str(tmp_path / "t")
    spark.range(0, 100).select(F.col("id").alias("v")).repartitionByRange(
        4, "v"
    ).write.parquet(path)
    write_manifest(spark, path, ["v"])

    # append a file the manifest doesn't know about, with values OUTSIDE
    # the probed range of every manifest entry's [min, max]
    spark.range(1000, 1010).select(F.col("id").alias("v")).coalesce(
        1
    ).write.mode("append").parquet(path)
    got = (
        read_pruned(spark, path, "v", lo=1000)
        .where(F.col("v") >= 1000)
        .count()
    )
    assert got == 10  # stale manifest did not lose the appended rows

    # delete a data file the manifest still lists: reader must not
    # hand Spark the dead path
    victim = next(
        f for f in sorted(os.listdir(path)) if f.endswith(".parquet")
    )
    os.remove(os.path.join(path, victim))
    total = read_pruned(spark, path, "v").count()
    assert total == spark.read.parquet(path).count()


def test_manifest_posture_at_many_files(spark, tmp_path):
    """File-count scale posture (SCALING.md): the manifest is one row
    per FILE — at 10⁴ synthetic entries the driver-side prune must
    stay in-memory trivial (the collect in write_manifest is
    metadata-sized, ∝ #files, never ∝ rows).  Uses a synthetic
    manifest to keep the test seconds-fast; the pruning math is the
    same code path as the real one."""
    import json
    import os
    import time

    from aws_datalake_framework_ingestion_spark.sources.manifest import (
        MANIFEST_NAME,
        pruned_files,
    )

    path = str(tmp_path / "big")
    os.makedirs(path)
    n = 10_000
    files = {}
    for i in range(n):
        fname = os.path.join(path, f"part-{i:05d}.parquet")
        with open(fname, "wb"):
            pass  # listing only — pruning never opens data files
        files[f"file://{fname}"] = {"v": [i * 10, i * 10 + 9]}
    with open(os.path.join(path, MANIFEST_NAME), "w") as fh:
        json.dump({"stat_cols": ["v"], "files": files}, fh)

    t0 = time.monotonic()
    kept = pruned_files(spark, path, "v", lo=500, hi=1500)
    dt = time.monotonic() - t0
    # 500..1500 spans files 50..150 inclusive
    assert len(kept) == 101
    assert dt < 5.0, f"10k-file prune took {dt:.1f}s"


def test_manifest_partitioned_dataset_not_emptied(spark, tmp_path):
    """Regression (r7): write_manifest keys files via
    input_file_name(), which includes hive-partition subdirectories —
    the live listing must walk recursively or a partitioned dataset
    reconciles to an empty keep-set and read_pruned silently returns
    zero rows.  Also checks partition columns survive the leaf-file
    read (basePath)."""
    from pyspark.sql import functions as F

    from aws_datalake_framework_ingestion_spark.sinks import write_parquet
    from aws_datalake_framework_ingestion_spark.sources.manifest import (
        pruned_files,
        read_pruned,
        write_manifest,
    )
    from aws_datalake_framework_ingestion_spark.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events").select(
        "event_type", "user_id", "value"
    )
    path = str(tmp_path / "ev_part")
    write_parquet(ev, path, partition_by=["event_type"])
    n_files = write_manifest(spark, path, ["value"])
    assert n_files > 1

    # unbounded probe: recursive listing must keep every file
    assert len(pruned_files(spark, path, "value")) == n_files

    lo, hi = 10.0, 200.0
    got = (
        read_pruned(spark, path, "value", lo, hi)
        .where(F.col("value").between(lo, hi))
        .groupBy("event_type")  # partition column must exist post-prune
        .agg(F.count(F.lit(1)).alias("n"), F.sum("user_id").alias("s"))
    )
    want = (
        spark.read.parquet(path)
        .where(F.col("value").between(lo, hi))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("user_id").alias("s"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.count() > 0  # the probe actually matched rows


def test_update_manifest_incremental(spark, tmp_path):
    """update_manifest must stat ONLY the uncovered files (append
    cadence — never re-scan the indexed data), drop entries for
    deleted files, and leave pruning exact afterwards."""
    import json
    import os

    from pyspark.sql import functions as F

    from aws_datalake_framework_ingestion_spark.sources.manifest import (
        MANIFEST_NAME,
        pruned_files,
        read_pruned,
        update_manifest,
        write_manifest,
    )

    path = str(tmp_path / "inc")
    spark.range(0, 100).select(F.col("id").alias("v")).repartitionByRange(
        4, "v"
    ).write.parquet(path)
    assert write_manifest(spark, path, ["v"]) == 4

    # poison the existing entries' stats marker-style: incremental
    # update must NOT touch them (proof it didn't re-read those files)
    mpath = os.path.join(path, MANIFEST_NAME)
    m = json.load(open(mpath))
    for stats in m["files"].values():
        stats["_marker"] = True
    json.dump(m, open(mpath, "w"))

    # append files outside the existing value range
    spark.range(1000, 1100).select(F.col("id").alias("v")).coalesce(
        1
    ).write.mode("append").parquet(path)
    n_new = update_manifest(spark, path, ["v"])
    assert n_new == 1

    m2 = json.load(open(mpath))
    assert len(m2["files"]) == 5
    assert sum(1 for s in m2["files"].values() if s.get("_marker")) == 4

    # pruning uses the merged manifest: a probe in the appended range
    # must keep ONLY the new file, and the answer stays exact
    kept = pruned_files(spark, path, "v", lo=1000, hi=1100)
    assert len(kept) == 1
    got = (
        read_pruned(spark, path, "v", 1000, 1100)
        .where(F.col("v").between(1000, 1100))
        .count()
    )
    assert got == 100

    # delete a file: update drops its entry (no dead paths)
    victim = next(
        f for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    os.remove(os.path.join(path, victim))
    update_manifest(spark, path, ["v"])
    m3 = json.load(open(mpath))
    assert len(m3["files"]) == 4
    assert read_pruned(spark, path, "v").count() == spark.read.parquet(path).count()


def test_update_manifest_partitioned_stat_col(spark, tmp_path):
    """Regression (ADVICE r8): update_manifest read the uncovered
    leaf files WITHOUT basePath, so a hive-partition column was
    invisible to the incremental stat pass — a manifest whose
    stat_cols include a partition column (legal, write_manifest reads
    the root) raised AnalysisException on the very first append."""
    import json
    import os

    from pyspark.sql import functions as F

    from aws_datalake_framework_ingestion_spark.sources.manifest import (
        MANIFEST_NAME,
        update_manifest,
        write_manifest,
    )

    path = str(tmp_path / "inc_part")
    spark.range(0, 60).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        F.col("id").alias("v"),
    ).repartition(2).write.partitionBy("grp").parquet(path)
    # stat BOTH a data column and the partition column
    n0 = write_manifest(spark, path, ["v", "grp"])
    assert n0 >= 2

    spark.range(1000, 1010).select(
        F.lit("9").alias("grp"), F.col("id").alias("v")
    ).coalesce(1).write.mode("append").partitionBy("grp").parquet(path)

    n_new = update_manifest(spark, path, ["v", "grp"])
    assert n_new == 1
    m = json.load(open(os.path.join(path, MANIFEST_NAME)))
    # partition-column values are type-inferred from the dir names at
    # read time (both full and incremental paths behave alike)
    new_stats = [
        s for s in m["files"].values() if [str(x) for x in s["grp"]] == ["9", "9"]
    ]
    assert len(new_stats) == 1
    assert [str(x) for x in new_stats[0]["v"]] == ["1000", "1009"]


def test_manifest_remote_branch_io(spark, tmp_path, monkeypatch):
    """Exercise the REMOTE (Hadoop FS stream / recursive listing)
    branches of the manifest I/O against Hadoop's LocalFileSystem —
    the exact code path an hdfs:// or s3a:// dataset takes, minus the
    wire.  _is_local is forced False so file: URIs route through the
    FS branch."""
    from pyspark.sql import functions as F

    from aws_datalake_framework_ingestion_spark.sources import manifest as M

    monkeypatch.setattr(M, "_is_local", lambda p: False)

    # text roundtrip + absent-file None
    p = f"file:{tmp_path}/meta/m.json"
    M._write_text(spark, p, '{"a": 1}')
    assert M._read_text(spark, p) == '{"a": 1}'
    assert M._read_text(spark, f"file:{tmp_path}/meta/nope.json") is None

    # end-to-end write_manifest → prune over the FS-listing branch,
    # on a partitioned layout (recursive listing required)
    path = f"file:{tmp_path}/ds"
    spark.range(0, 100).select(
        (F.col("id") % 2).alias("p"), F.col("id").alias("v")
    ).write.partitionBy("p").parquet(path)
    n = M.write_manifest(spark, path, ["v"])
    assert n >= 2
    kept = M.pruned_files(spark, path, "v", lo=0, hi=1000)
    assert len(kept) == n
    got = (
        M.read_pruned(spark, path, "v", 10, 20)
        .where(F.col("v").between(10, 20))
        .count()
    )
    assert got == 11
