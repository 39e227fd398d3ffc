"""Shared fixtures: one SparkSession per test session, DuckDB oracle
connection with the driver's view registration mirrored."""

from __future__ import annotations

import duckdb
import pytest

from aws_datalake_framework_ingestion_spark.session import get_session
from aws_datalake_framework_ingestion_spark.tables import TABLES

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Mirror the driver: each table pre-registered as a view."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


@pytest.fixture(scope="session")
def duck_small():
    return make_duck(SF_SMALL)


@pytest.fixture(scope="session")
def duck_medium():
    return make_duck(SF_MEDIUM)
