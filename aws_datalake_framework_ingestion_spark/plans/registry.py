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
* DuckDB's ``CAST(DECIMAL AS DOUBLE)`` is NOT correctly rounded at
  large magnitudes (int128·1e-scale double-rounds); Spark's
  BigDecimal→double IS.  Oracle SQL must convert decimal sums via
  ``CAST(CAST(x AS VARCHAR) AS DOUBLE)`` (string parse is correctly
  rounded) — caught by the r5 sf1 soak, applied to all 53 sites.
* Window-function oracles must order by a TOTAL key: with duplicate
  (partition, ts) rows, two window sorts in one query may order ties
  differently and e.g. split a session across a lag pass and a cumsum
  pass.  Always add the unique id to every ORDER BY.
* Gate parameters that bound bucket/cluster population (LSH bits,
  k-means k) must scale with the corpus (target ~250/bucket), or the
  hot-bucket caps silently eat planted recall at 10× data.
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

# Queries with a green (rows+schema+hash) driver row in a past round's
# CORRECTNESS_r*.json.  The driver verifies a bounded prefix of
# ``queries()`` each round, so we emit not-yet-driver-verified queries
# FIRST, rotating the whole registry through the gate across rounds.
# The set self-maintains: _scan_correctness_files() unions green rows
# from every CORRECTNESS_r*.json present at import time; the literal
# below is the round-1 backstop in case the files are absent.
_R1_VERIFIED: set[str] = {
    "q1_pricing_summary", "s1_full_table_scan", "s2_watermark_max_probe",
    "s3_incremental_range_scan", "s4_custom_sql_passthrough", "s7_point_lookup",
    "r1_projection", "r2_filter_predicate", "r3_sort_multikey", "r4_topk_limit",
    "r5_offset_pagination", "r8_scalar_subquery",
    "join_inner_agg", "join_broadcast_dims", "join_left_outer_counts",
    "join_full_outer", "join_semi_exists", "join_anti_not_exists",
    "join_cross_small", "join_asof_last_purchase", "join_range_followups",
    "join_salted_skew",
    "q3_shipping_priority", "q4_order_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "q10_returned_items", "q13_customer_distribution",
    "q14_promo_revenue", "q15_top_supplier",
    "agg_global_stats", "agg_count_distinct", "agg_distinct_rows",
    "agg_rollup", "agg_cube", "agg_grouping_sets", "agg_pivot_status",
    "agg_having", "agg_percentiles",
    "setop_union_all", "setop_union_distinct", "setop_intersect",
    "setop_except", "setop_intersect_all", "setop_except_all",
}


def _scan_correctness_files() -> dict[str, int]:
    """name → latest round with a fully green (rows+schema+hash) row,
    from every CORRECTNESS_r*.json found at the repo root."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    roots = {os.path.abspath(os.path.join(here, "..", "..")), os.getcwd()}
    out: dict[str, int] = {}
    for root in roots:
        for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
            m = re.search(r"CORRECTNESS_r(\d+)", os.path.basename(path))
            rnd = int(m.group(1)) if m else 0
            try:
                with open(path) as f:
                    rows = json.load(f)
            except (OSError, ValueError):
                continue
            for name, row in rows.items():
                if isinstance(row, dict) and row.get("hash_match"):
                    out[name] = max(out.get(name, 0), rnd)
    return out


_VERIFIED_ROUND: dict[str, int] = {
    **{n: 1 for n in _R1_VERIFIED},
    **_scan_correctness_files(),
}
DRIVER_VERIFIED: set[str] = set(_VERIFIED_ROUND)

# Family rank for the unverified prefix: cheap, high-signal families first
# (the driver's per-round budget may be time-bound, not count-bound).
_FAMILY_RANK: tuple[str, ...] = (
    "fn_", "win_", "dq_", "mask_", "agg_", "ns_doc", "q", "stream_", "mm_", "ns_",
)


def _family_rank(name: str) -> int:
    for i, prefix in enumerate(_FAMILY_RANK):
        if name.startswith(prefix):
            return i
    return len(_FAMILY_RANK)


def driver_order() -> list[str]:
    """Registry names, not-yet-driver-verified first (stable within
    group); among verified queries, LEAST-recently-verified first so
    the driver's bounded sweep re-verifies everything cyclically over
    rounds instead of re-checking the same fixed prefix."""
    names = list(REGISTRY)
    pos = {n: i for i, n in enumerate(names)}
    return sorted(
        names,
        key=lambda n: (
            n in DRIVER_VERIFIED,
            (REGISTRY[n].oracle is None, _family_rank(n), pos[n])
            if n not in DRIVER_VERIFIED
            else (False, _VERIFIED_ROUND.get(n, 0), pos[n]),
        ),
    )


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
    return {name: REGISTRY[name].fn for name in driver_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in driver_order()
        if REGISTRY[name].oracle is not None
    }
