"""Dump .explain('formatted') for registry queries to plans/<r>/ (env SPARK_GRAFT_PLANS_DIR, default r15).

Usage: python scratch/dump_plans.py SUFFIX query [query...]
Writes plans/<r>/<query>_<SUFFIX>.txt.  For queries whose construction
runs Spark jobs (gates/loops), the explain covers the RETURNED frame;
the job counts live in tests/_construction_budget.py (equality-pinned).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_datalake_framework_ingestion_spark.plans import REGISTRY  # noqa: E402
from aws_datalake_framework_ingestion_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r15"))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_session(app_name="dump_plans")
    for name in names:
        df = REGISTRY[name].fn(spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
