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


def fastss_pairs(
    vocab: DataFrame,
    word_col: str = "w",
) -> DataFrame:
    """All DISTINCT word pairs at Levenshtein distance exactly 1, via
    the FastSS deletion neighborhood (Bocek et al. 2007): every word
    emits its 0- and 1-deletion variants; two words at edit distance
    ≤ 1 necessarily share a variant (substitution: delete the edited
    position from both; insertion/deletion: the longer word's deletion
    IS the shorter word), so candidates come from an EQUI-JOIN on the
    variant — never the |V|² comparison a naive fuzzy join plans —
    and an exact levenshtein verify keeps only true pairs.  This is
    the typo-pair / token-normalization miner of a text-curation
    pipeline.

    Returns (w_a, w_b, lev=1) with w_a < w_b.  Scale shape: variants
    = Σ(len+1) rows of ≤ len bytes (vocabulary-sized, not
    corpus-sized); one equi-join on the variant + one pair-distinct;
    candidate volume per variant is bounded by the two adjacent
    length classes, and the exact verify runs only on candidates."""
    w = vocab.select(F.col(word_col).alias("w")).distinct()
    variants = (
        w.select(
            "w",
            F.explode(
                F.sequence(F.lit(0), F.length("w"))
            ).alias("_i"),
        )
        .select(
            "w",
            F.when(F.col("_i") == 0, F.col("w"))
            .otherwise(
                F.concat(
                    F.substring(F.col("w"), 1, F.col("_i") - F.lit(1)),
                    F.col("w").substr(
                        F.col("_i") + F.lit(1), F.length("w")
                    ),
                )
            )
            .alias("_v"),
        )
    )
    a = variants.select(F.col("w").alias("w_a"), "_v")
    b = variants.select(F.col("w").alias("w_b"), "_v")
    return (
        a.join(b, "_v")
        .where(F.col("w_a") < F.col("w_b"))
        .select("w_a", "w_b")
        .distinct()
        .withColumn(
            "lev", F.levenshtein(F.col("w_a"), F.col("w_b")).cast("int")
        )
        .where(F.col("lev") == 1)
    )
