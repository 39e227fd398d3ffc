"""Entity resolution / record linkage: blocked fuzzy matching.

The reference ingests per-table rows verbatim (no cross-row matching
surface); this extends the engine with the dedup-adjacent linkage step
a curation pipeline runs over entity names (suppliers, authors,
sources): candidate generation by BLOCKING (an equi-join on a cheap
key) followed by exact edit-distance scoring on candidates only.

Scale posture: never all-pairs.  The block key turns the quadratic
candidate space into Σ_b |block_b|², and ``max_block_size`` drops
degenerate blocks (the empty-normalized-name block, "unknown", etc.)
the same way the LSH operators cap hot buckets (dedup.capped_left).
Scoring (levenshtein) runs only on surviving candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_matches(
    names: DataFrame,
    key_col: str,
    name_col: str,
    block_expr: Column,
    max_distance: int = 3,
    max_block_size: int | None = 10_000,
) -> DataFrame:
    """Candidate pairs within a block whose names are within
    ``max_distance`` edits.  Returns (key_a, key_b, name_a, name_b,
    distance) with key_a < key_b.

    ``block_expr`` is the blocking key (e.g. first token, soundex,
    normalized prefix).  Recall is bounded by the blocking choice —
    pairs in different blocks are never compared; callers union
    multiple blocking passes for higher recall (standard practice).
    """
    b = names.select(
        F.col(key_col).alias("k"),
        F.col(name_col).alias("nm"),
        block_expr.alias("blk"),
    )
    if max_block_size is not None:
        sizes = b.groupBy("blk").agg(F.count(F.lit(1)).alias("_bn"))
        b = b.join(sizes.where(F.col("_bn") <= max_block_size), "blk").drop("_bn")
    left = b.select(
        F.col("blk"), F.col("k").alias("key_a"), F.col("nm").alias("name_a")
    )
    right = b.select(
        F.col("blk"), F.col("k").alias("key_b"), F.col("nm").alias("name_b")
    )
    return (
        left.join(right, "blk")
        .where(F.col("key_a") < F.col("key_b"))
        .withColumn(
            "distance", F.levenshtein(F.col("name_a"), F.col("name_b")).cast("int")
        )
        .where(F.col("distance") <= max_distance)
        .drop("blk")
    )
