"""Query registry: name → (spark callable, DuckDB oracle SQL).

Every implemented operator from SURVEY.md §2 registers here; the
driver contract (``__spark_entry__.queries`` / ``oracle_sql``) is a
thin view over this registry.

Oracle-parity rules (learned empirically, see tests/test_oracle_parity.py):

* Alias every computed column identically in Spark and SQL — the
  driver sorts columns by name before value-hashing.
* DuckDB ``sum(BIGINT)`` returns HUGEINT → ``CAST(... AS BIGINT)`` in
  the oracle; Spark's ``sum(bigint)`` is already bigint.
* ``events.ts`` is ns in parquet: Spark side loads via
  ``timestamp_micros(ts div 1000)`` (tables.load); oracle SQL must
  ``CAST(ts AS TIMESTAMP)`` to match µs truncation.
* Double aggregation order matters at the ULP level: never insert a
  gratuitous ``repartition`` before a sum; with one input split Spark's
  partial aggregation accumulates in file order, matching DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    tags: tuple[str, ...] = field(default=())
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
