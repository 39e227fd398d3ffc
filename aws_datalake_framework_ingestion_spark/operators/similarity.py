"""Similarity search over embedding columns (array<float>).

* cosine_topk        — exact brute-force top-k for a (small) query set:
                       broadcast the queries against the candidate
                       corpus; dot products via zip_with/aggregate
                       (JVM-side, no Python).  O(|Q|·N) — the baseline
                       and the verifier.
* lsh_topk           — the scale path: random-hyperplane LSH buckets
                       candidates; queries only meet candidates in
                       their own bucket.  Deterministic planes from a
                       seeded LCG.  Recall is checked against
                       cosine_topk in tests.

At 100 TB the corpus side stays partitioned; only queries (or the
plane matrix) are broadcast.  An IVF variant would replace the random
planes with k-means centroids — same join shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential over the array (order-
    deterministic, matching an explicit SQL list_transform oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(e: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(e, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", norm_col(F.col(vec_col)))


def cosine_topk(
    df: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for rows matching query_pred.

    Returns (query_id, nn_id, cosine, rn) with rn in 1..k, ranked by
    (cosine desc, nn_id) — unique tiebreak ⇒ deterministic.
    """
    base = with_norm(df, vec_col)
    q = base.filter(query_pred).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    c = base.select(
        F.col(id_col).alias("nn_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    sim = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nn_id"))
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("nn_id"))
        .select("query_id", "nn_id", sim.alias("cosine"))
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )


def _planes(num_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1)^dim."""
    state = seed
    planes = []
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
            row.append((state % 2000001) / 1000000.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket_col(vec_col: str, num_planes: int = 8, dim: int = 64, seed: int = 7) -> Column:
    """Random-hyperplane signature: bit j = sign(v·plane_j)."""
    planes = _planes(num_planes, dim, seed)
    bucket = F.lit(0)
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bit = (_dot(F.col(vec_col), plane) > 0).cast("int")
        bucket = bucket + F.shiftleft(bit, j)
    return bucket


def lsh_topk(
    df: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within the query's
    LSH bucket.  2^num_planes buckets ⇒ candidate set shrinks ~256×
    at num_planes=8; recall measured against cosine_topk in tests.
    """
    base = with_norm(df, vec_col).withColumn(
        "_bucket", lsh_bucket_col(vec_col, num_planes, dim)
    )
    q = base.filter(query_pred).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
        F.col("_bucket").alias("_qb"),
    )
    c = base.select(
        F.col(id_col).alias("nn_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
        F.col("_bucket").alias("_cb"),
    )
    sim = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nn_id"))
    return (
        c.join(
            F.broadcast(q),
            (F.col("_qb") == F.col("_cb")) & (F.col("query_id") != F.col("nn_id")),
        )
        .select("query_id", "nn_id", sim.alias("cosine"))
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )


def embedding_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ threshold),
    LSH-bucketed: only pairs sharing a bucket are compared.  Returns
    (id_a, id_b, cosine) with id_a < id_b."""
    base = with_norm(df, vec_col).withColumn(
        "_bucket", lsh_bucket_col(vec_col, num_planes, dim)
    )
    a = base.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_av"),
        F.col("_norm").alias("_an"),
        F.col("_bucket").alias("_ab"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_bv"),
        F.col("_norm").alias("_bn"),
        F.col("_bucket").alias("_bb"),
    )
    sim = _dot(F.col("_av"), F.col("_bv")) / (F.col("_an") * F.col("_bn"))
    return (
        a.join(b, (F.col("_ab") == F.col("_bb")) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
