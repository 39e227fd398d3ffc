"""JDBC dialect factory: URL/query generation per dialect (no live DB
in this environment — string-level contracts, including the reference
bugs that must NOT be reproduced: MSSQL port, unquoted timestamps)."""

from __future__ import annotations

import pytest

from aws_datalake_framework_ingestion_spark.sources.jdbc import DIALECTS, JdbcSource


def src(db_type: str) -> JdbcSource:
    return JdbcSource(
        db_type=db_type, hostname="h", port=5432, db_name="db",
        username="u", password="p", db_schema="s",
    )


def test_urls_per_dialect():
    assert src("postgres").url() == "jdbc:postgresql://h:5432/db"
    assert src("mysql").url() == "jdbc:mysql://h:5432/db"
    assert src("oracle").url() == "jdbc:oracle:thin:@h:5432:db"
    # reference bug (dataIngestionUtils.py:162) put hostname in the
    # port slot — fixed form:
    assert src("sqlserver").url() == "jdbc:sqlserver://h:5432;databaseName=db"


def test_query_shapes():
    s = src("postgres")
    assert s.full_scan_sql("t") == "SELECT * FROM s.t"
    assert s.max_probe_sql("t", "c") == "SELECT max(c) AS max_val FROM s.t"
    q = s.incremental_sql("t", "c", "2024-01-01 00:00:00", "2024-02-01 00:00:00")
    assert q == (
        "SELECT * FROM s.t WHERE c > TIMESTAMP '2024-01-01 00:00:00' "
        "AND c <= TIMESTAMP '2024-02-01 00:00:00'"
    )


@pytest.mark.parametrize("d", DIALECTS)
def test_incremental_timestamps_always_quoted(d):
    """Reference emitted bare `timestamp 2024-...` for non-PG dialects
    (:150, :159, :168) — every dialect must quote here."""
    q = src(d).incremental_sql("t", "c", "2024-01-01 00:00:00", "2024-02-01 00:00:00")
    assert "'2024-01-01 00:00:00'" in q
    assert "timestamp 2024" not in q.lower().replace("'", " ")


def test_oracle_timestamp_literal():
    q = src("oracle").incremental_sql("t", "c", "2024-01-01 00:00:00", "2024-02-01 00:00:00")
    assert "TO_TIMESTAMP('2024-01-01 00:00:00'" in q


def test_reader_options_partitioned():
    s = src("postgres")
    plain = s.reader_options("SELECT * FROM s.t")
    assert plain["query"] == "SELECT * FROM s.t"
    assert "partitionColumn" not in plain

    part = s.reader_options(
        "SELECT * FROM s.t", partition_column="id",
        num_partitions=32, lower_bound="0", upper_bound="1000000",
    )
    assert part["dbtable"] == "(SELECT * FROM s.t) src"
    assert part["numPartitions"] == "32"  # reference read 1 partition
    assert part["partitionColumn"] == "id"


def test_jdbc_roundtrip_embedded_derby(spark):
    """Live end-to-end JDBC: seed an embedded Derby database through
    Spark's JDBC writer, then drive every read shape (S1 full scan,
    S2 max probe, S3 incremental range, partitioned scan) through
    JdbcSource against the real driver."""
    from pyspark.sql import functions as F

    src = JdbcSource(
        db_type="derby", hostname="", port=0, db_name="graftdb", username="app"
    )
    seed = spark.range(100).select(
        F.col("id").alias("K"),
        (F.col("id") * 2).alias("V"),
        F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id*3600)")
        .alias("TS"),
    )
    (
        seed.write.format("jdbc")
        .option("url", src.url())
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .option("dbtable", "T1")
        .mode("overwrite")
        .save()
    )

    full = src.read(spark, src.full_scan_sql("T1"))
    assert full.count() == 100

    mx = src.read(spark, src.max_probe_sql("T1", "K")).collect()
    assert mx[0][0] == 99

    inc_sql = src.incremental_sql(
        "T1", "TS", "2024-01-01 10:00:00", "2024-01-01 20:00:00"
    )
    inc = src.read(spark, inc_sql)
    assert inc.count() == 10  # hours 11..20 inclusive-exclusive (lo, hi]

    part = src.read(
        spark,
        src.full_scan_sql("T1"),
        partition_column="K",
        num_partitions=4,
        lower_bound=0,
        upper_bound=100,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == 100
