"""Plan-shape statistics for headline queries: counts of Scan parquet,
Exchange, BroadcastExchange, Sort, Window, *EvalPython nodes per
query — finds structural outliers (repeated scans, unexpected
exchanges) without executing anything.

Usage: python scratch/plan_stats.py [query ...]   (default: headline
minus pipeline gates, whose construction runs real Spark jobs)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_datalake_framework_ingestion_spark.plans import REGISTRY  # noqa: E402
from aws_datalake_framework_ingestion_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import bench

    names = sys.argv[1:] or [
        q for q in bench.HEADLINE if q not in bench.PIPELINE_GATES
    ]
    spark = get_session(app_name="plan_stats")
    print(f"{'query':32s} scans exch bcast sort win pyeval gen agg")
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} ERROR {e}")
            continue
        # count only the numbered tree nodes (each node appears once in
        # the tree and once in the detail section; the tree lines are
        # '(n) NodeName' in the detail, so count detail headers)
        def c(pat):
            return len(re.findall(rf"^\(\d+\) {pat}", txt, re.M))

        print(
            f"{name:32s} "
            f"{c('Scan parquet'):5d} {c('Exchange'):4d} "
            f"{c('BroadcastExchange'):5d} {c('Sort'):4d} "
            f"{c('Window'):3d} "
            f"{c('(Batch|Arrow)EvalPython') + c('MapInPandas') + c('PythonMapInArrow'):6d} "
            f"{c('Generate'):3d} "
            f"{c('[A-Za-z]*HashAggregate'):3d}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
