"""Driver-contract simulation (see .claude/skills/verify/SKILL.md).

Builds a FOREIGN vanilla SparkSession — no UTC timezone, no
nanosAsLong conf, nothing from tests/conftest — exactly like the
external driver, then:

1. runs ``entry(spark)`` and collects it;
2. runs EVERY registered query at sf0.01 and fails on errors or on
   0-row results not whitelisted in EMPTY_OK (vacuous-query guard);
3. asserts the first 50 ``queries()`` names are the rotation's
   not-yet-driver-verified prefix, not plain registration order.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.01"

# Queries allowed to return 0 rows at sf0.01 (semantically-empty on
# the synthetic corpus; each has a pytest asserting non-vacuity on
# planted data instead).
EMPTY_OK: set[str] = {
    # sf0.01 embeddings have no near-dup pairs: max pairwise cosine is
    # 0.513 (probed brute-force via DuckDB), far below the 0.95
    # threshold — 0 rows is the correct answer, not vacuity.  Recall
    # is asserted on planted duplicates in tests/test_northstar.py::
    # test_embedding_dedup_pairs_threshold.
    "ns_embedding_dedup",
}


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    rows = E.entry(spark).collect()
    print(f"entry(): {len(rows)} rows")
    assert rows, "entry() returned no rows"

    q = E.queries()
    o = E.oracle_sql()
    missing_oracles = [n for n in o if n not in q]
    assert not missing_oracles, f"oracle_sql keys not in queries: {missing_oracles}"

    from aws_datalake_framework_ingestion_spark.plans.registry import (
        DRIVER_VERIFIED,
    )

    head = list(q)[:50]
    stale = [n for n in head if n in DRIVER_VERIFIED]
    if len(stale) > len(DRIVER_VERIFIED) - max(len(q) - 50, 0) and len(q) > 50:
        # only flag when unverified queries were left OUT of the head
        left_out = [n for n in list(q)[50:] if n not in DRIVER_VERIFIED]
        if left_out and stale:
            print(f"ROTATION BUG: verified-in-head={stale[:5]} while "
                  f"unverified-out-of-head={left_out[:5]}")
            return 1

    bad: list[tuple[str, str]] = []
    t0 = time.time()
    for i, (name, fn) in enumerate(q.items()):
        try:
            n = fn(spark, SF_DIR).count()
        except Exception as ex:  # noqa: BLE001
            bad.append((name, f"ERROR {type(ex).__name__}: {str(ex)[:160]}"))
            continue
        if n == 0 and name not in EMPTY_OK:
            bad.append((name, "0 rows (vacuous?)"))
    dt = time.time() - t0
    print(f"ran {len(q)} queries in {dt:.0f}s")
    if bad:
        for name, why in bad:
            print(f"FAIL {name}: {why}")
        return 1
    print("drive contract OK — all queries ran, none vacuous")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
