"""Physical-plan regression guards: the scale properties we rely on
(filter pushdown, column pruning, broadcast dimension joins) must stay
visible in the optimized plans — a silent regression here is a 100×
cost change at 100 TB even when results stay correct."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from aws_datalake_framework_ingestion_spark.plans import REGISTRY

from .conftest import SF_MEDIUM


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_MEDIUM)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reached the scan
    # pruned: only the 7 needed columns, never the whole table
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "l_quantity" in read and "l_returnflag" in read


def test_q3_broadcasts_dimensions(spark):
    plan = plan_of(spark, "q3_shipping_priority")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan  # all dims broadcastable here


def test_projection_prunes_scan(spark):
    plan = plan_of(spark, "r1_projection")
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "c_custkey" in read and "c_name" in read
    assert "c_acctbal" not in read and "c_mktsegment" not in read


def test_point_lookup_pushes_equality(spark):
    plan = plan_of(spark, "s7_point_lookup")
    assert "EqualTo(c_custkey,42)" in plan


@pytest.mark.parametrize(
    "name", ["q5_local_supplier_volume", "join_broadcast_dims"]
)
def test_dim_joins_broadcast(spark, name):
    plan = plan_of(spark, name)
    assert plan.count("BroadcastHashJoin") >= 2
