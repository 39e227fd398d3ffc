"""Session-lifetime registry for operator-created caches.

Operators that persist/cache intermediate frames (MinHash shingle
arrays, Q11's grouped part values, …) register them here via
``track``.  CALLERS own the lifetime: materialize results first, then
``release_caches()``.  Re-invoking an operator on the same input does
NOT grow storage (Spark's CacheManager dedupes identical plans), but a
long-lived session sweeping many inputs does — the release hook keeps
executor storage flat (bench.py and the test-suite teardown use it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an already persisted/cached DataFrame for release."""
    _LIVE.append(df)
    return df


def release_caches() -> None:
    """Unpersist every tracked cache (newest first)."""
    while _LIVE:
        _LIVE.pop().unpersist()
