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
