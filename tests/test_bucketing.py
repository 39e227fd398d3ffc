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
