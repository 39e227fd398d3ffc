"""Local mirror of the driver's correctness gate: run every registered
query on Spark and its oracle on DuckDB, compare row count, column
names, and order-insensitive values.

Comparison is strict: exact equality for ints/strings/timestamps/
decimals; floats must agree to 1e-9 relative (the driver hashes
values, so any lasting float divergence is a red flag — queries are
written to be order-deterministic, see plans/registry.py notes).
"""

from __future__ import annotations

import math
from decimal import Decimal

import pandas as pd
import pytest

from aws_datalake_framework_ingestion_spark.plans import REGISTRY

from .conftest import SF_MEDIUM, make_duck

ORACLE_SPECS = sorted(
    (name, spec) for name, spec in REGISTRY.items() if spec.oracle is not None
)
ROWS_ONLY_SPECS = sorted(
    (name, spec) for name, spec in REGISTRY.items() if spec.oracle is None
)


def _canon(v):
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v)
    if isinstance(v, bytes):
        return ("b", v.hex())
    return v


def _rows(df_pandas, cols):
    out = []
    for row in df_pandas[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon(v) for v in row))
    return sorted(out, key=repr)


def _float_close(a, b):
    if isinstance(a, tuple) and isinstance(b, tuple) and a[0] == "f" and b[0] == "f":
        if a[1] == "nan" or b[1] == "nan":
            return a == b
        x, y = a[1], b[1]
        return x == y or abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y))
    return a == b


@pytest.fixture(scope="module")
def duck():
    return make_duck(SF_MEDIUM)


@pytest.mark.parametrize("name,spec", ORACLE_SPECS, ids=[n for n, _ in ORACLE_SPECS])
def test_oracle_parity(spark, duck, name, spec):
    sdf = spec.fn(spark, SF_MEDIUM)
    spdf = sdf.toPandas()
    ddf = duck.execute(spec.oracle).df()

    scols = sorted(spdf.columns)
    dcols = sorted(ddf.columns)
    assert scols == dcols, f"{name}: column names differ: {scols} vs {dcols}"
    assert len(spdf) == len(ddf), f"{name}: row count {len(spdf)} vs {len(ddf)}"

    srows = _rows(spdf, scols)
    drows = _rows(ddf, dcols)
    # STRICT bit-equality: the driver hashes exact values, so a row
    # that only passes a float tolerance here still fails the real
    # gate (this caught ns_tfidf's cross-runtime ln() ULP drift).
    mismatches = [(a, b) for a, b in zip(srows, drows) if a != b]
    near = sum(
        1
        for a, b in mismatches
        if all(_float_close(x, y) for x, y in zip(a, b))
    )
    assert not mismatches, (
        f"{name}: {len(mismatches)} non-bit-exact rows of {len(srows)} "
        f"({near} within 1e-9 — ULP drift, not logic); first: {mismatches[:3]}"
    )


@pytest.mark.parametrize(
    "name,spec", ROWS_ONLY_SPECS, ids=[n for n, _ in ROWS_ONLY_SPECS]
)
def test_rows_only_queries_run(spark, name, spec):
    """Queries without an oracle must at least run and return a stable
    schema at sf0.01 (deeper semantics in their dedicated test files)."""
    df = spec.fn(spark, SF_MEDIUM)
    assert df.columns, f"{name}: no columns"
    assert df.count() >= 0
