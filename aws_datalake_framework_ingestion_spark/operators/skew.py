"""Skew-mitigation join: salting for hot keys.

AQE's skew-join split (on in session.py) handles moderate skew by
splitting oversized partitions, but a single pathological key still
lands every matching row of BOTH sides in one task pair.  Salting
breaks that: the big side scatters each row into one of ``salt``
sub-keys; the small(er) side replicates into all of them; the join key
becomes (key, salt) so one hot key spreads over ``salt`` tasks.

Result is EXACTLY the plain join (each left row meets each matching
right row exactly once — the right copy with the left row's salt), so
the technique is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 8,
    salt_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join on common columns ``on`` with the left (big/skewed) side
    salted and the right side replicated ``salt``×.

    ``salt_cols`` picks the columns hashed into the salt — default all
    left columns; pass a unique-ish subset for cheaper hashing.  The
    salt is deterministic (xxhash64), so results are reproducible.

    Only inner/left/semi/anti are exact under this rewrite: with
    right/full joins, replicated right rows with no left match would
    surface once per salt value.
    """
    if how.lower().replace("_", "") not in {
        "inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti",
    }:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched right rows "
            f"(each appears once per salt); use inner/left/semi/anti"
        )
    cols = salt_cols or left.columns
    l = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt)).cast("int"),
    )
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l.join(r, [*on, "_salt"], how).drop("_salt")
