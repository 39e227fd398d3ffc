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

import numpy as np
import pandas as pd
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


def lsh_table_buckets(
    vec_col: str,
    num_tables: int = 16,
    bits: int = 4,
    dim: int = 64,
    seed: int = 7,
) -> Column:
    """Multi-table random-hyperplane LSH: array of (table, bucket)
    structs — one b-bit signature per table.

    Collision probability per bit for cosine c is 1 - arccos(c)/π, so
    recall across L tables is 1-(1-p^b)^L while the candidate fraction
    stays ~L/2^b.  Multiple small tables (not one wide signature) is
    what makes hyperplane LSH usable on weakly-clustered data.
    """
    planes = _planes(num_tables * bits, dim, seed)
    entries = []
    for t in range(num_tables):
        bucket = F.lit(0)
        for j in range(bits):
            p = planes[t * bits + j]
            plane = F.array(*[F.lit(x) for x in p])
            bit = (_dot(F.col(vec_col), plane) > 0).cast("int")
            bucket = bucket + F.shiftleft(bit, j)
        entries.append(
            F.struct(F.lit(t).alias("t"), bucket.alias("b"))
        )
    return F.array(*entries)


def _bucketed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    num_tables: int,
    bits: int,
    dim: int,
    prefix: str,
    impl: str = "arrow",
) -> DataFrame:
    """(id, vec, norm, table, bucket) rows — one per (row, table).

    Fails fast on dimension mismatch: a vector shorter/longer than the
    plane dim would silently null-pad in zip_with and degrade bucket
    quality — raise instead.

    ``impl="arrow"`` (default) computes ALL table buckets in one Arrow
    batch: a single (n×dim)·(dim×L·b) numpy matmul replaces L·b
    interpreted zip_with dots per row (the Catalyst higher-order fold
    evaluates ~4k multiplies/row interpreted — measured the dominant
    cost of every hyperplane-LSH query).  ``impl="expr"`` is the
    pure-Catalyst reference path.  Sign bits can differ between the two
    only for dots within float rounding of zero — bucket recall is
    asserted in tests for both.

    Output is deliberately SLIM — (id, table, bucket) only.  Vectors
    re-join by id after the candidate pairs are deduped, so the bucket
    self-join and the distinct shuffle never carry embeddings
    (measured 3-5× on the KNN shape, and at 100 TB it is the
    difference between shuffling 24 B and ~0.5 KB per candidate).
    """
    if impl == "expr":
        checked = df.withColumn(
            vec_col,
            F.when(F.size(F.col(vec_col)) == dim, F.col(vec_col)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(f"lsh: embedding dim != configured dim={dim} (got "),
                        F.size(F.col(vec_col)).cast("string"),
                        F.lit(")"),
                    )
                )
            ),
        )
        base = checked.withColumn(
            "_tb", F.explode(lsh_table_buckets(vec_col, num_tables, bits, dim))
        )
        return base.select(
            F.col(id_col).alias(f"{prefix}id"),
            F.col("_tb.t").alias(f"{prefix}t"),
            F.col("_tb.b").alias(f"{prefix}b"),
        )
    if impl != "arrow":
        raise ValueError(f"lsh impl must be arrow|expr, got {impl!r}")

    from pyspark.sql.types import IntegerType, StructField, StructType

    P = np.asarray(_planes(num_tables * bits, dim), dtype=np.float64)  # (L·b, dim)
    shifts = 1 << np.arange(bits, dtype=np.int64)
    id_type = df.select(F.col(id_col)).schema.fields[0].dataType
    out_schema = StructType(
        [
            StructField(f"{prefix}id", id_type, True),
            StructField(f"{prefix}t", IntegerType(), True),
            StructField(f"{prefix}b", IntegerType(), True),
        ]
    )

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if v.shape[1] != dim:
                raise ValueError(
                    f"lsh: embedding dim != configured dim={dim} "
                    f"(got {v.shape[1]})"
                )
            n = len(pdf)
            bits_m = (v @ P.T) > 0  # (n, L·b)
            buckets = (
                bits_m.reshape(n, num_tables, bits) * shifts
            ).sum(axis=2).astype("int32")  # (n, L)
            idx = np.repeat(np.arange(n), num_tables)
            yield pd.DataFrame(
                {
                    f"{prefix}id": pdf[id_col].to_numpy()[idx],
                    f"{prefix}t": np.tile(
                        np.arange(num_tables, dtype="int32"), n
                    ),
                    f"{prefix}b": buckets.reshape(-1),
                }
            )

    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(gen, out_schema)


def cosine_pudf():
    """Vectorized cosine for candidate-pair scoring: one einsum per
    Arrow batch instead of an interpreted zip_with fold per row — norms
    included, so callers never carry norm columns through joins.  Used
    on the non-oracled LSH/KNN paths (numpy's pairwise summation
    rounds differently at the ULP than the sequential fold, so the
    oracle-checked exact query keeps the expression path)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(qv: pd.Series, cv: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype="float64")
        a = np.stack(qv.to_numpy()).astype(np.float64)
        b = np.stack(cv.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", a, b)
        return pd.Series(
            num
            / (np.sqrt((a * a).sum(axis=1)) * np.sqrt((b * b).sum(axis=1)))
        )

    return cos


def _vec_rel(df: DataFrame, id_col: str, vec_col: str, out_id: str, out_vec: str) -> DataFrame:
    """Slim (id → vector) relation for post-dedup score joins."""
    return df.select(
        F.col(id_col).alias(out_id), F.col(vec_col).alias(out_vec)
    )


def lsh_topk(
    df: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 16,
    bits: int = 4,
    dim: int = 64,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: exact cosine over the union of same-bucket
    candidates across L tables.  Candidates meet only through bucket
    equi-joins — never a full cross join — so the shape survives any
    corpus size; L and b tune the recall/cost point.

    ``broadcast_queries=True`` is the search shape (small query set vs
    big corpus); False is the KNN-JOIN shape (query side = the corpus
    itself, too big to broadcast — both sides shuffle on the bucket
    key).
    """
    q = _bucketed(df.filter(query_pred), id_col, vec_col, num_tables, bits, dim, "_q")
    c = _bucketed(df, id_col, vec_col, num_tables, bits, dim, "_c")
    # bucket join and pair-dedup over SLIM (id, t, b) rows; vectors
    # re-join by id only for the deduped pairs (AQE broadcasts the
    # vector relation when it is small; keyed equi-join otherwise)
    pairs = (
        c.join(
            F.broadcast(q) if broadcast_queries else q,
            (F.col("_qt") == F.col("_ct"))
            & (F.col("_qb") == F.col("_cb"))
            & (F.col("_qid") != F.col("_cid")),
        )
        .select(
            F.col("_qid").alias("query_id"), F.col("_cid").alias("nn_id")
        )
        .dropDuplicates(["query_id", "nn_id"])
    )
    cos = cosine_pudf()
    cand = (
        pairs.join(
            _vec_rel(df.filter(query_pred), id_col, vec_col, "query_id", "_qv"),
            "query_id",
        )
        .join(_vec_rel(df, id_col, vec_col, "nn_id", "_cv"), "nn_id")
        .select("query_id", "nn_id", cos("_qv", "_cv").alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nn_id"))
    return cand.withColumn("rn", F.row_number().over(w).cast("int")).filter(
        F.col("rn") <= k
    )


def embedding_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 16,
    bits: int = 4,
    dim: int = 64,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ threshold) via
    multi-table LSH self-join.  At threshold 0.95 the per-bit collision
    probability is ~0.9, so 16×4-bit tables give essentially total
    recall.  Buckets hotter than ``max_bucket_size`` (mass-duplicated
    embeddings) degrade to star candidates around the min-id member —
    linear instead of quadratic, cluster recall preserved through
    connected components.  Returns (id_a, id_b, cosine), id_a < id_b."""
    from .dedup import annotate_buckets, capped_left

    bucketed = annotate_buckets(
        _bucketed(df, id_col, vec_col, num_tables, bits, dim, "_"),
        ["_t", "_b"],
        "_id",
    )
    a = capped_left(bucketed, "_id", max_bucket_size).select(
        *[F.col(f"_{s}").alias(f"_a{s}") for s in ("id", "t", "b")]
    )
    b = bucketed.select(
        *[F.col(f"_{s}").alias(f"_b{s}") for s in ("id", "t", "b")]
    )
    pairs = (
        a.join(
            b,
            (F.col("_at") == F.col("_bt"))
            & (F.col("_ab") == F.col("_bb"))
            & (F.col("_aid") < F.col("_bid")),
        )
        .select(F.col("_aid").alias("id_a"), F.col("_bid").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = cosine_pudf()
    return (
        pairs.join(_vec_rel(df, id_col, vec_col, "id_a", "_av"), "id_a")
        .join(_vec_rel(df, id_col, vec_col, "id_b", "_bv"), "id_b")
        .select("id_a", "id_b", cos("_av", "_bv").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the clustered-data scale path
# --------------------------------------------------------------------------


def _centroid_df(df: DataFrame, cents: list[list[float]]) -> DataFrame:
    """Tiny (n_centroids, dim) DataFrame — joined via broadcast so the
    per-row work is one zip_with dot per centroid ROW, not a literal
    expression tree per centroid (which blows up codegen at c×dim
    scale and was ~10× slower)."""
    spark = df.sparkSession
    return spark.createDataFrame(
        [(j, [float(x) for x in c]) for j, c in enumerate(cents)],
        "cid int, cvec array<double>",
    )


def _assign_cells(df: DataFrame, cents: list[list[float]], id_col: str, vec_col: str) -> DataFrame:
    """(id, vec, cell) — nearest-centroid id per row.

    Vectorized Arrow path: the centroid matrix rides along as a numpy
    constant and each batch is ONE (n×dim)·(dim×c) matmul + argmax —
    no shuffle, no join, embarrassingly parallel over any corpus size.
    (The DataFrame alternative — broadcast cross join + argmin agg —
    shuffles n×c rows with array keys; measured ~4× slower even at
    bench scale.)  Ties: argmax returns the lowest cid, matching an
    orderBy(-dot, cid) tie-break.  Centroids are unit vectors, so dot
    order == cosine order per row."""
    import numpy as np
    from pyspark.sql.types import IntegerType, StructField, StructType

    C = np.asarray(cents, dtype=np.float64).T  # (dim, c)
    in_schema = df.select(id_col, vec_col).schema
    out_schema = StructType(
        list(in_schema.fields) + [StructField("_cell", IntegerType(), False)]
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            pdf = pdf.copy()
            pdf["_cell"] = (v @ C).argmax(axis=1).astype("int32")
            yield pdf

    return df.select(id_col, vec_col).mapInPandas(assign, out_schema)


def train_ivf_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_mod: int = 1,
    max_train: int = 65536,
) -> list[list[float]]:
    """Deterministic Lloyd iterations → unit-norm centroids (driver-side
    model state, n_centroids × dim floats).

    Training is sample-local: ONE Spark job collects a bounded,
    deterministic sample (id-ordered top-k after the optional
    ``id % train_mod == 0`` thinning — at 100 TB raise train_mod so
    the per-partition top-k skims a thin slice), then all Lloyd
    iterations run as driver NumPy matmuls on ≤ max_train × dim
    float64 (~32 MB at the default).  The previous version ran each
    iteration as a distributed assign + posexplode + avg + collect —
    correct, but 2 extra Spark jobs per iteration to compute means of
    a sample that fits in driver memory by construction; only the
    final corpus assignment pass (_assign_cells) needs the cluster.

    Determinism: the sample is id-sorted, init = first n_centroids
    vectors, assignment ties take the lowest cid (np.argmax), means
    accumulate in fixed row order — same inputs, bit-same model on
    any partitioning.  Empty cells keep their previous centroid.
    """
    import numpy as np

    train = df if train_mod <= 1 else df.filter(F.col(id_col) % train_mod == 0)
    rows = (
        train.select(id_col, vec_col).orderBy(id_col).limit(max_train).collect()
    )
    V = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    if len(V) == 0:
        raise ValueError("empty training set for IVF centroids")
    k = min(n_centroids, len(V))

    def _unit_rows(M: "np.ndarray") -> "np.ndarray":
        n = np.sqrt((M * M).sum(axis=1, keepdims=True))
        n[n == 0.0] = 1.0
        return M / n

    cents = _unit_rows(V[:k].copy())
    for _ in range(iters):
        cell = (V @ cents.T).argmax(axis=1)  # ties → lowest cid
        nxt = cents.copy()
        for c in range(k):
            members = V[cell == c]
            if len(members):
                nxt[c] = members.mean(axis=0)
        cents = _unit_rows(nxt)
    return [[float(x) for x in c] for c in cents]


def ivf_topk(
    df: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    iters: int = 2,
    train_mod: int = 1,
) -> DataFrame:
    """IVF approximate top-k: corpus inverted by nearest centroid;
    each query probes its n_probe nearest cells and ranks exact cosine
    inside them.  Complements LSH: IVF wins on clustered corpora
    (cells match density), LSH needs no training.  Candidates meet
    through a (cell) equi-join — cost ~ n_probe/n_centroids of brute
    force, no cross join at any size."""
    import numpy as np
    from pyspark.sql.types import IntegerType, StructField, StructType

    cents = train_ivf_centroids(df, n_centroids, iters, id_col, vec_col, train_mod)
    base = with_norm(df, vec_col)

    c = _assign_cells(df, cents, id_col, vec_col).withColumn(
        "_norm", norm_col(F.col(vec_col))
    ).select(
        F.col(id_col).alias("nn_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
        "_cell",
    )

    # queries: one row per (query, probed cell) — same Arrow matmul,
    # stable argsort so ties break on the lower cid
    C = np.asarray(cents, dtype=np.float64).T
    qin = base.filter(query_pred).select(id_col, vec_col, "_norm")
    q_schema = StructType(
        list(qin.schema.fields) + [StructField("_qcell", IntegerType(), False)]
    )

    def probe(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            order = np.argsort(-(v @ C), axis=1, kind="stable")[:, :n_probe]
            rep = pdf.loc[pdf.index.repeat(n_probe)].copy()
            rep["_qcell"] = order.reshape(-1).astype("int32")
            yield rep

    q = qin.mapInPandas(probe, q_schema).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
        "_qcell",
    )
    sim = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nn_id"))
    return (
        c.join(
            F.broadcast(q),
            (F.col("_qcell") == F.col("_cell"))
            & (F.col("query_id") != F.col("nn_id")),
        )
        .select("query_id", "nn_id", sim.alias("cosine"))
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )
