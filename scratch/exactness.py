"""Bit-exactness sweep at sf0.01 (see .claude/skills/verify/SKILL.md).

The driver hashes exact values, so floats must match BIT-FOR-BIT —
no tolerance.  Runs every oracle-bearing registered query on a
vanilla session and compares against DuckDB with strict equality.
Prints the non-exact set; expect "NONE — all N bit-exact".
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"


def canon(v):
    import pandas as pd
    from decimal import Decimal

    if v is None or v is pd.NaT:
        return None
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        return ("f", "nan") if math.isnan(v) else ("f", v.hex())
    if isinstance(v, bytes):
        return ("b", v.hex())
    return v


def rows(df, cols):
    return sorted(
        (tuple(canon(v) for v in r) for r in df[cols].itertuples(index=False, name=None)),
        key=repr,
    )


def main(sf_dir: str = SF_DIR, spark_conf: dict | None = None, only: list[str] | None = None) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        # the sweep runs 130+ queries in one JVM: the 1g default driver
        # heap OOMs near the end of the sf0.1 pass (py4j then reports
        # "Connection refused" for every remaining query)
        .config("spark.driver.memory", "12g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
    )
    for k, v in (spark_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from aws_datalake_framework_ingestion_spark.plans import REGISTRY
    from aws_datalake_framework_ingestion_spark.tables import TABLES

    duck = duckdb.connect()
    for t in TABLES:
        duck.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    non_exact = []
    n_checked = 0
    for name, spec in sorted(REGISTRY.items()):
        if spec.oracle is None or (only and name not in only):
            continue
        n_checked += 1
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
            odf = duck.sql(spec.oracle).df()
            scols = sorted(sdf.columns)
            if scols != sorted(odf.columns):
                non_exact.append((name, "schema"))
                continue
            sr, orr = rows(sdf, scols), rows(odf, scols)
            if sr != orr:
                k = sum(1 for a, b2 in zip(sr, orr) if a != b2) + abs(
                    len(sr) - len(orr)
                )
                non_exact.append((name, f"{k} rows differ"))
        except Exception as ex:  # noqa: BLE001
            non_exact.append((name, f"ERROR {str(ex)[:120]}"))
    if non_exact:
        for name, why in non_exact:
            print(f"non-exact: {name} ({why})")
        return 1
    print(f"NONE — all {n_checked} bit-exact")
    return 0


if __name__ == "__main__":
    import sys as _sys

    raise SystemExit(main(only=_sys.argv[1:] or None))
