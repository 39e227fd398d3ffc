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


def _np_block_topk(S, ids, keep: int, tie_margin: int):
    """Per-row exact (value desc, id asc) top-``keep`` over a score
    block ``S`` (n_queries × n_candidates) with candidate ids
    ``ids``: preselect ``keep + tie_margin`` by value (argpartition),
    order the preselection id-ascending, then stable-sort by -value —
    so ties rank by id exactly like the Catalyst window's
    (cosine desc, nn_id asc).  Returns (sel_ids, sel_vals), each
    (n_queries, t) with t = min(keep, n_candidates).  Exact unless
    MORE than ``tie_margin`` candidates tie bit-identically at the
    selection boundary (only possible with duplicate vectors) — the
    shared contract of every consumer's docstring."""
    import numpy as np

    n = S.shape[0]
    m = S.shape[1]
    sel_w = min(m, keep + tie_margin)
    rows_ix = np.arange(n)[:, None]
    if sel_w < m:
        part = np.argpartition(-S, sel_w - 1, axis=1)[:, :sel_w]
    else:
        part = np.broadcast_to(np.arange(m), (n, m))
    Ssel = S[rows_ix, part]
    id_order = np.argsort(ids[part], axis=1, kind="stable")
    Ssel = Ssel[rows_ix, id_order]
    part = part[rows_ix, id_order]
    top = np.argsort(-Ssel, axis=1, kind="stable")[:, :keep]
    sel = part[rows_ix, top]
    return ids[sel], Ssel[rows_ix, top]


def cosine_topk_kernel(
    df: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 65536,
    q_chunk: int = 2048,
    tie_margin: int = 16,
) -> DataFrame:
    """Arrow/numpy brute-force exact cosine top-k — the vectorized
    twin of ``cosine_topk`` for LARGE query sets.

    ``cosine_topk``'s broadcast pair-join evaluates the dot product
    as an interpreted Catalyst fold (~1.4 µs/pair measured), which is
    right for probe-set parity checks (tens of queries) but quadratic
    pain for verification sweeps: the r14 drift gate's n/10-query
    exact pass would cost hours at sf10 through it.  Here the query
    matrix is collected driver-side (bounded, loud-fail past
    ``max_queries`` — same guard as pq_topk's LUT build) and closed
    over a ``mapInPandas`` kernel: each corpus batch computes its
    (q_chunk × batch) cosine block as one einsum matmul and emits
    only its per-batch top-(k+1) rows per query; one window reduces
    batch winners to the global top-k.  Corpus-side cost is a single
    pruned (id, vec) scan — ~50-100× the expression path's
    throughput, and the shuffle carries ≤ (k+1)·|Q| rows per batch
    instead of |Q|·|corpus| pairs.

    Ranking contract is identical to ``cosine_topk`` (cosine desc,
    nn_id asc; self-pair excluded).  Two documented envelope edges:

    * float sums are einsum-ordered (pairwise summation), so cosine
      VALUES can differ from the interpreted sequential fold in the
      last ULP — route emissions through recall/boolean gates or
      tolerance checks, never value-hashed oracles (the repo's
      Arrow-kernel discipline, cosine_pudf's note);
    * per-batch preselection keeps the top (k + ``tie_margin``) by
      value before the exact (cosine desc, nn_id) ordering, so the
      result is exact unless MORE than ``tie_margin`` candidates tie
      bit-identically at a batch's selection boundary — only possible
      with duplicate vectors; raise ``tie_margin`` for
      planted-duplicate corpora.
    """
    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    qrows = (
        df.filter(query_pred)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .limit(max_queries + 1)
        .collect()
    )
    if not qrows:
        raise ValueError("empty query set for cosine_topk_kernel")
    if len(qrows) > max_queries:
        raise ValueError(
            f"cosine_topk_kernel query set exceeds max_queries="
            f"{max_queries}; narrow query_pred or raise the cap "
            "deliberately"
        )
    qids = np.asarray([r[0] for r in qrows])
    Q = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    qn = np.sqrt((Q * Q).sum(axis=1))
    nq = len(qids)
    keep = k + 1  # self-pair may occupy one slot; dropped post-window

    id_dt = df.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("query_id", id_dt, False),
            StructField("nn_id", id_dt, False),
            StructField("cosine", DoubleType(), False),
        ]
    )

    def block_topk(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vn = np.sqrt((V * V).sum(axis=1))
            ids = pdf[id_col].to_numpy()
            for lo in range(0, nq, q_chunk):
                hi = min(lo + q_chunk, nq)
                S = (Q[lo:hi] @ V.T) / np.outer(qn[lo:hi], vn)
                sel_ids, sel_vals = _np_block_topk(
                    S, ids, keep, tie_margin
                )
                t = sel_ids.shape[1]
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(qids[lo:hi], t),
                        "nn_id": sel_ids.reshape(-1),
                        "cosine": sel_vals.reshape(-1),
                    }
                )

    scored = (
        df.select(id_col, vec_col)
        .mapInPandas(block_topk, out_schema)
        .where(F.col("query_id") != F.col("nn_id"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nn_id")
    )
    return scored.withColumn(
        "rn", F.row_number().over(w).cast("int")
    ).filter(F.col("rn") <= k)


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
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus inverted by nearest centroid;
    each query probes its n_probe nearest cells and ranks exact cosine
    inside them.  Complements LSH: IVF wins on clustered corpora
    (cells match density), LSH needs no training.  Candidates meet
    through a (cell) equi-join — cost ~ n_probe/n_centroids of brute
    force, no cross join at any size.

    Pass ``centroids`` (e.g. from train_ivf_centroids) to reuse a
    trained model across calls — an nprobe sweep over the same model
    then probes strictly nested candidate sets, which makes recall
    monotone in n_probe (asserted by the ns_ann_ivf_topk gate)."""
    import numpy as np
    from pyspark.sql.types import IntegerType, StructField, StructType

    cents = (
        centroids
        if centroids is not None
        else train_ivf_centroids(df, n_centroids, iters, id_col, vec_col, train_mod)
    )
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


# --------------------------------------------------------------------------
# int8 quantization: the 4x-memory ANN path.  At 100 TB the float32
# corpus rarely fits the cluster's aggregate RAM; int8 codes do.  Two
# schemes: absmax per-dimension calibration (storage / re-ranking) and
# unit-norm symmetric codes (integer dot products ~ cosine ranking).
# Everything is deterministic arithmetic — integer dot products make
# the ranking EXACTLY portable across engines (no float-order hazard).
# --------------------------------------------------------------------------


def quantize_absmax(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension symmetric int8 codes with absmax calibration.

    code[p] = floor(x[p] / amax[p] * 127 + 0.5) — the standard absmax
    scheme (as in LLM.int8() activation quantization).  The per-dim
    scales are a 64-value global aggregate computed IN-PLAN (one-row
    array, broadcast cross join) — no driver action, so the calibration
    pass scales to any corpus size.  Returns (id, pos, code) exploded
    rows; a columnar consumer would keep the array form.
    """
    x = df.select(F.col(id_col), F.posexplode(vec_col).alias("pos", "_v"))
    scales = (
        x.groupBy("pos")
        .agg(F.max(F.abs(F.col("_v").cast("double"))).alias("amax"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "amax"))),
                lambda s: s["amax"],
            ).alias("_scales")
        )
    )
    code = F.zip_with(
        F.col(vec_col),
        F.col("_scales"),
        lambda v, s: F.when(s == 0.0, F.lit(0)).otherwise(
            F.floor(v.cast("double") / s * F.lit(127.0) + F.lit(0.5)).cast("int")
        ),
    )
    return df.crossJoin(F.broadcast(scales)).select(
        F.col(id_col), F.posexplode(code).alias("pos", "code")
    )


def unit_codes(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, _codes): int8-range codes of the UNIT-NORMALIZED vector
    (scale fixed at 127 since |x/‖x‖| ≤ 1).  Integer dot(q, c) then
    approximates cosine(q, c) · 127² — monotone enough to rank with,
    exact integers so the ranking is engine-portable.

    Portability caveat (ADVICE r4): the DOT PRODUCTS over given codes
    are exactly portable, but the codes themselves derive from
    floor(v/‖v‖·127 + 0.5) where ‖v‖ is a float fold — a last-ULP
    difference in two engines' norm accumulation can flip a code at a
    rounding boundary and change the integer ranking.  Cross-engine
    bit-equality of the codes therefore requires bit-identical norm
    accumulation (sequential fold order on both engines — same
    rationale as sqdist_seq_pudf).

    r14 (guide §1.2 step 2, per-task work): the norm is computed ONCE
    per row in its own projection and the transform lambda references
    the materialized column.  Inlining ``norm_col`` in the lambda (the
    pre-r14 shape) re-evaluated the 64-multiply interpreted fold for
    EVERY element — twice per element through the CASE branches, so
    ~128 folds ≈ 8k interpreted ops per row where one suffices.
    CollapseProject will not merge the two projections because the
    alias is non-cheap and referenced twice — asserted by the plan
    capture (plans/r14).  Same value, same bits: the fold itself is
    unchanged, it just runs once."""
    base = df.select(
        F.col(id_col),
        F.col(vec_col),
        norm_col(F.col(vec_col)).alias("_n"),
    )
    codes = F.transform(
        F.col(vec_col),
        lambda v: F.when(F.col("_n") == F.lit(0.0), F.lit(0)).otherwise(
            F.floor(
                v.cast("double") / F.col("_n") * F.lit(127.0) + F.lit(0.5)
            ).cast("int")
        ),
    )
    return base.select(F.col(id_col), codes.alias("_codes"))


def quantized_topk(
    df: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by int8-quantized dot product (unit-norm codes).

    Same join shape as cosine_topk (queries broadcast, corpus stays
    partitioned) but the per-pair arithmetic is 64 int multiplies into
    a BIGINT accumulator — the production trick for memory-bound ANN
    re-ranking.  Returns (query_id, nn_id, dot_q, rn), ranked by
    (dot_q desc, nn_id); integer scores ⇒ deterministic and portable.
    """
    base = unit_codes(df, id_col, vec_col)
    q = unit_codes(df.filter(query_pred), id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_codes").alias("_qc")
    )
    c = base.select(F.col(id_col).alias("nn_id"), F.col("_codes").alias("_cc"))
    # Arrow int64 einsum per batch — integer addition is associative,
    # so this is bit-identical to the zip_with fold (asserted in
    # tests) at ~100× the throughput of the interpreted HOF.
    dot = int_dot_pudf()(F.col("_qc"), F.col("_cc"))
    w = W.partitionBy("query_id").orderBy(F.col("dot_q").desc(), F.col("nn_id"))
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("nn_id"))
        .select("query_id", "nn_id", dot.alias("dot_q"))
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )


# --------------------------------------------------------------------------
# Distributed k-means (oracle-exact) + SemDeDup-style semantic dedup.
# train_ivf_centroids is the DRIVER-SAMPLE training path (bounded
# collect); kmeans_assign is the fully-distributed one — every Lloyd
# step is a DataFrame plan, so it runs when even the training sample
# must stay on the cluster.  Centroid means go through decimal-exact
# sums (plans/_util.dec_sum rationale): double addition is order-
# dependent, and a centroid that differs in the last ULP can flip an
# assignment — decimal sums make every iteration bit-reproducible on
# ANY partitioning (and match the DuckDB oracle exactly).
# --------------------------------------------------------------------------


def _sqdist(a: Column, b: Column) -> Column:
    """Σ (aᵢ-bᵢ)² — sequential fold, order-deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign_step(v: DataFrame, cents: DataFrame, n: int = 1) -> DataFrame:
    """n nearest centroids per row (ties → lowest cluster id).
    Centroids broadcast (k × dim doubles); the corpus never moves.
    Distances via the sequential-accumulation Arrow kernel — bit-equal
    to the zip_with fold (same per-row addition order), so assignment
    stays oracle-exact at Arrow speed.

    r14 (guide §2.3 aggregate-before-shuffle): the hard top-1
    assignment is ``min(struct(_dist, cluster))`` — struct comparison
    is field-lexicographic, exactly the window's (dist asc, cluster
    asc) order, but a plain aggregate does PARTIAL map-side
    aggregation, so only one partial winner per (row, partition)
    crosses the exchange instead of all n·k scored pairs through a
    window sort (measured ~1.8× on the assign path, digest-identical).
    n > 1 (IVF multi-probe) keeps the window."""
    scored = v.crossJoin(F.broadcast(cents)).select(
        "_id",
        "cluster",
        sqdist_seq_pudf()(F.col("_e"), F.col("_ce")).alias("_dist"),
    )
    if n == 1:
        return (
            scored.groupBy("_id")
            .agg(F.min(F.struct("_dist", "cluster")).alias("_m"))
            .select("_id", F.col("_m.cluster").alias("cluster"))
        )
    w = W.partitionBy("_id").orderBy(F.col("_dist").asc(), F.col("cluster").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .select("_id", "cluster")
    )


def _update_step(a: DataFrame, v: DataFrame) -> DataFrame:
    """Per-cluster mean vectors via decimal-exact per-dimension sums.
    One shuffle on (cluster, pos); empty clusters drop out (same
    semantics on the oracle side)."""
    m = a.join(v, "_id").select(
        "cluster", F.posexplode("_e").alias("pos", "_val")
    )
    per = m.groupBy("cluster", "pos").agg(
        (
            F.sum(F.col("_val").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_mean")
    )
    return per.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "_mean"))),
            lambda s: s["_mean"],
        ).alias("_ce")
    )


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """Fully-distributed Lloyd k-means: (id, cluster) after n_iter
    update rounds.  Init = the k lowest-id vectors (deterministic).
    Each iteration is one broadcast-assign + one (cluster, pos)
    shuffle — no driver actions, no collect, so it scales to corpora
    whose TRAINING SET doesn't fit the driver (the regime where
    train_ivf_centroids' bounded sample stops being representative).

    n_probe > 1 returns that many (id, cluster) rows per point — the
    FINAL assignment becomes a soft/multi-probe one (updates always
    use the hard top-1 assignment), the IVF trick that recovers
    cluster-boundary neighbors for downstream candidate joins.
    """
    v = df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_e"),
    )
    wseed = W.orderBy("_id")
    cents = (
        v.orderBy("_id")
        .limit(k)
        .select(
            (F.row_number().over(wseed) - 1).cast("int").alias("cluster"),
            F.col("_e").alias("_ce"),
        )
    )
    for _ in range(n_iter):
        a = _assign_step(v, cents)
        cents = _update_step(a, v)
    return _assign_step(v, cents, n=n_probe).select(
        F.col("_id").alias(id_col), "cluster"
    )


def semantic_dedup_pairs(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 1,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 2,
) -> DataFrame:
    """SemDeDup: cluster with k-means, then emit cosine pairs ≥
    threshold WITHIN shared clusters only — candidate volume Σ n_c²
    instead of n².  Points probe their n_probe nearest centroids so a
    near-dup pair split by a cluster boundary still meets (the IVF
    multi-probe trick; n_probe=2 recovers boundary pairs that hard
    assignment provably misses).  The join follows the house candidate
    pattern: slim (id, cluster) rows shuffle through the self-join and
    the pair-distinct; vectors re-join by id only for scoring.  At
    100 TB pick k ≈ n/10⁴ so clusters stay joinable, and cap hot
    clusters the way dedup.capped_left caps hot buckets."""
    assigned = kmeans_assign(df, k, n_iter, id_col, vec_col, n_probe=n_probe)
    a = assigned.select(F.col(id_col).alias("id_a"), "cluster")
    b = assigned.select(F.col(id_col).alias("id_b"), "cluster")
    cand = (
        a.join(b, ["cluster"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    # einsum cosine (norms inside the kernel): the pair volume is the
    # hot path here, and SemDeDup decisions sit far from the threshold
    # (dups ≈ 0.99 vs corpus max ≈ 0.51), so the kernel's pairwise-
    # summation ULP drift cannot flip a pair; the gate query pins
    # booleans, never raw cosine hashes.
    cos = cosine_pudf()(F.col("_va"), F.col("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= F.lit(threshold))
    )


def int_dot_pudf():
    """Vectorized BIGINT dot product for quantized-code pairs: one
    int64 einsum per Arrow batch.  Integer addition is associative, so
    ANY summation order gives the same bits — unlike the float cosine,
    this kernel is exactly interchangeable with the zip_with fold and
    safe on oracle-checked paths (asserted in tests)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def idot(qc: pd.Series, cc: pd.Series) -> pd.Series:
        if len(qc) == 0:
            return pd.Series([], dtype="int64")
        a = np.stack(qc.to_numpy()).astype(np.int64)
        b = np.stack(cc.to_numpy()).astype(np.int64)
        return pd.Series(np.einsum("ij,ij->i", a, b))

    return idot


def sqdist_seq_pudf():
    """Vectorized squared-L2 distance that accumulates SEQUENTIALLY
    over dimensions (one vectorized add per dim, rows in parallel):
    per row the float additions happen in exactly the zip_with fold's
    order ((0+d₀²)+d₁²)+…, so the kernel is BIT-identical to the
    expression path — Arrow speed without the pairwise-summation ULP
    drift that bars numpy einsum from oracle-checked float paths."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def sqd(av: pd.Series, bv: pd.Series) -> pd.Series:
        if len(av) == 0:
            return pd.Series([], dtype="float64")
        a = np.stack(av.to_numpy()).astype(np.float64)
        b = np.stack(bv.to_numpy()).astype(np.float64)
        acc = np.zeros(len(a), dtype=np.float64)
        for j in range(a.shape[1]):
            d = a[:, j] - b[:, j]
            acc += d * d
        return pd.Series(acc)

    return sqd


# --------------------------------------------------------------------------
# Product quantization (PQ): the 32×-compression ANN path.  A 100 TB
# float32 corpus is ~25 TB of raw vectors; PQ codes (m bytes/vector)
# bring the searchable representation down to ~0.8 TB — the standard
# way the shortlist stage of a billion-vector index fits in cluster
# RAM (Jégou et al., "Product Quantization for Nearest Neighbor
# Search", TPAMI 2011).  Pipeline: train m per-subspace codebooks →
# encode corpus to m uint8 codes → ADC scoring (per-query lookup
# table of query·centroid partial dots, summed by code) → exact
# re-rank of the ADC shortlist.
# --------------------------------------------------------------------------


def train_pq_codebooks(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train: int = 65536,
) -> list:
    """Deterministic per-subspace Lloyd codebooks (driver-side model
    state, m × k × dim/m floats — same sample-local training posture
    and determinism discipline as train_ivf_centroids: id-ordered
    bounded sample, first-k init, lowest-index tie-break, fixed row
    order).  Returns codebooks[s][c] = centroid vector of cell c in
    subspace s."""
    import numpy as np

    rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(max_train).collect()
    )
    V = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    if len(V) == 0:
        raise ValueError("empty training set for PQ codebooks")
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    books = []
    # Deterministic STRIDED init (r14): first-k init drew every seed
    # from the lowest ids, so a retrain over a corpus whose drifted
    # region sits at high ids could never allocate codewords inside
    # it (Lloyd has no split move — a cluster with no seed collapses
    # to one codeword forever, and ADC can't rank within it).  Evenly
    # spaced sample indices keep bit-determinism (same inputs → same
    # seeds) while seeding every id region proportionally.
    n_tr = len(V)
    for s in range(m):
        X = V[:, s * d_sub : (s + 1) * d_sub]
        kk = min(k, len(X))
        seed_idx = np.linspace(0, n_tr - 1, kk).round().astype(np.int64)
        cents = X[seed_idx].copy()
        for _ in range(iters):
            # EXACT squared-difference distances, row-chunked: the r7
            # matmul form (-2x·c + ||c||²) was fast but its FP
            # cancellation made near-tied cell assignments depend on
            # the BLAS backend — trained codebooks stopped being
            # platform-deterministic, at odds with the repo's
            # reproducibility posture (ADVICE r7).  Chunking bounds
            # the broadcast-difference temp instead of the 327 MB
            # whole-array materialization the matmul was introduced
            # to avoid; elementwise numpy ops with a fixed reduction
            # shape are deterministic across platforms, so "ties →
            # lowest index" is again a real cross-engine contract.
            # r15: the chunk is SIZED FROM k·d_sub to keep the temp
            # ≈4 MB — the old constant 4096 was tuned for k=16
            # (4096×16×8 ≈ 4 MB) but pq_topk trains k=256 cells,
            # where 4096×256×8 ≈ 67 MB temps fall out of cache and
            # the driver-side Lloyd measured 6× slower than the
            # cache-sized chunk (2.3 s of ns_pq_topk's 4.0 s profile
            # was this loop).  Per-row distances are chunk-INVARIANT
            # (each row's d2 row is computed independently), verified
            # bit-identical across chunk sizes.
            chunk = max(128, (1 << 22) // (8 * kk * d_sub))
            cell = np.empty(len(X), dtype=np.int64)
            for i in range(0, len(X), chunk):
                blk = X[i : i + chunk]
                d2 = ((blk[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                cell[i : i + chunk] = d2.argmin(axis=1)  # ties → lowest
            for c in range(kk):
                members = X[cell == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append([[float(x) for x in c] for c in cents])
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, _codes array<int>): nearest per-subspace centroid indices
    via an Arrow kernel (one matmul per subspace per batch)."""
    import numpy as np
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StructField,
        StructType,
    )

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    d_sub = books[0].shape[1]
    id_field = df.schema[id_col]
    schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("_codes", ArrayType(IntegerType(), False), False),
        ]
    )

    def enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(V), m), dtype=np.int32)
            for s in range(m):
                X = V[:, s * d_sub : (s + 1) * d_sub]
                C = books[s]
                # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant
                # per row → argmin over (-2x·c + ||c||²).  Matmul form
                # is kept HERE (unlike the trainer): encode runs over
                # the whole corpus per batch, and a near-tie flipping
                # a code only perturbs the ADC shortlist — the
                # operator's contract is the exact-rerank recall gate,
                # not code-level determinism (trainer docstring).
                d2 = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "_codes": list(codes)}
            )

    return df.select(id_col, vec_col).mapInPandas(enc, schema)


def pq_topk(
    df: DataFrame,
    query_pred: Column,
    k: int = 5,
    shortlist: int = 50,
    m: int = 8,
    n_cells: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list | None = None,
    max_queries: int = 4096,
) -> DataFrame:
    """Two-stage PQ search: ADC shortlist + exact cosine re-rank.

    Stage 1 scores every (query, code) pair with the asymmetric
    distance Σ_s LUT[q][s][code_s] — LUT built driver-side (|Q|·m·k
    doubles) and broadcast closed over the Arrow kernel, so the
    corpus side touches only the m-byte codes, never the vectors.
    Stage 2 re-ranks the per-query top-``shortlist`` codes with exact
    cosine over the re-joined vectors (shortlist·|Q| rows — tiny).
    This is the memory-bound 100 TB shape: full-vector I/O happens
    for shortlist·|Q| rows instead of N·|Q|.

    Returns (query_id, nn_id, cosine, rn ≤ k) like the other *_topk
    operators — rankings come from EXACT cosine, so recall against
    cosine_topk only depends on shortlist coverage."""
    import numpy as np

    # r15 (guide §2.6 overlap independent jobs): the two bounded
    # driver collects — the codebook TRAINING sample and the QUERY
    # vectors for the ADC LUTs — read disjoint model-state slices and
    # neither depends on the other, but they ran back-to-back, each
    # paying its own plan + driver round trip serially (profiled r14:
    # ~2.1 s wall on 0.5 s of job time, the gap being sequential
    # driver dispatch).  Submit both from a 2-thread pool so the
    # second job's tasks back-fill the first's tail; results and
    # bounds are unchanged (same plans, same collects).
    def _collect_queries():
        # query vectors come to the driver to build the ADC LUTs — a
        # bounded probe-set path, guarded like max_train: an unbounded
        # query_pred (say, the whole corpus) must fail loudly here,
        # not OOM the driver.  Batched/mapInPandas LUT builds are the
        # path past the cap, not raising it.
        return (
            df.filter(query_pred)
            .select(id_col, vec_col)
            .orderBy(id_col)
            .limit(max_queries + 1)
            .collect()
        )

    if codebooks is None:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            fut_q = pool.submit(_collect_queries)
            books = train_pq_codebooks(
                df, m=m, k=n_cells, dim=dim, id_col=id_col, vec_col=vec_col
            )
            qrows = fut_q.result()
    else:
        books = codebooks
        qrows = _collect_queries()
    npbooks = [np.asarray(b, dtype=np.float64) for b in books]
    d_sub = dim // m
    if not qrows:
        raise ValueError("empty query set for pq_topk")
    if len(qrows) > max_queries:
        raise ValueError(
            f"pq_topk query set exceeds max_queries={max_queries}; "
            "narrow query_pred or raise the cap deliberately"
        )
    qids = np.asarray([r[0] for r in qrows])
    Q = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    # LUT[q, s, c] = q_sub · centroid  (ADC inner-product tables)
    lut = np.stack(
        [Q[:, s * d_sub : (s + 1) * d_sub] @ npbooks[s].T for s in range(m)],
        axis=1,
    )

    codes = pq_encode(df, books, id_col=id_col, vec_col=vec_col)
    from pyspark.sql.types import DoubleType, StructField, StructType

    # id type follows the input relation (pq_index_topk's r14 fix:
    # hardcoded long broke string-keyed ids only at search time)
    id_dt = df.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("query_id", id_dt, False),
            StructField("nn_id", id_dt, False),
            StructField("_adc", DoubleType(), False),
        ]
    )
    nq = len(qids)

    # r15 (guide §4 — bound the rows leaving the kernel): emitting all
    # nq·n scored pairs per batch shipped the whole cross product into
    # the shortlist window's exchange; the window keeps only the top
    # ``shortlist`` per query, so a per-batch preselection of the
    # top-(shortlist+1) WITH BOUNDARY TIES is sufficient — any dropped
    # row has > shortlist batch rows with STRICTLY greater _adc (at
    # most one of which is the query's self-pair, filtered later), all
    # of which rank ahead of it under the window's
    # (_adc desc, nn_id asc) order, so it could never reach the global
    # top-``shortlist``.  Ties at the keep-threshold are all kept, so
    # the window's nn_id tie-break still sees every contender: the
    # surviving shortlist SET is exactly the unpruned one (same
    # pattern as cosine_topk_kernel / ivf_index_topk).
    keep = shortlist + 1

    def adc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack(pdf["_codes"].to_numpy()).astype(np.int64)  # (n, m)
            n = len(C)
            # scores[q, i] = Σ_s lut[q, s, C[i, s]]
            scores = np.zeros((nq, n), dtype=np.float64)
            for s in range(m):
                scores += lut[:, s, :][:, C[:, s]]
            ids = pdf[id_col].to_numpy()
            if n > keep:
                # per-query keep-threshold = the keep-th largest score;
                # keep every row scoring >= it (boundary ties included)
                part = np.partition(scores, n - keep, axis=1)
                thr = part[:, n - keep]
                qi, ci = np.nonzero(scores >= thr[:, None])
                yield pd.DataFrame(
                    {
                        "query_id": qids[qi],
                        "nn_id": ids[ci],
                        "_adc": scores[qi, ci],
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(qids, n),
                        "nn_id": np.tile(ids, nq),
                        "_adc": scores.reshape(-1),
                    }
                )

    scored = codes.mapInPandas(adc, out_schema).where(
        F.col("query_id") != F.col("nn_id")
    )
    w = W.partitionBy("query_id").orderBy(F.col("_adc").desc(), F.col("nn_id"))
    short = (
        scored.withColumn("_srn", F.row_number().over(w))
        .filter(F.col("_srn") <= shortlist)
        .select("query_id", "nn_id")
    )
    # exact cosine re-rank of the shortlist
    cos = cosine_pudf()
    cand = (
        short.join(
            _vec_rel(df.filter(query_pred), id_col, vec_col, "query_id", "_qv"),
            "query_id",
        )
        .join(_vec_rel(df, id_col, vec_col, "nn_id", "_cv"), "nn_id")
        .select("query_id", "nn_id", cos("_qv", "_cv").alias("cosine"))
    )
    w2 = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nn_id"))
    return cand.withColumn("rn", F.row_number().over(w2).cast("int")).filter(
        F.col("rn") <= k
    )


def matryoshka_fidelity(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefixes: tuple[int, ...] = (8, 16, 32),
) -> DataFrame:
    """Per-vector truncation fidelity for Matryoshka-style embedding
    prefixes (Kusupati et al. 2022): for each prefix length m,
    cos(full, truncate_m(full)) — which collapses algebraically to
    ‖v[:m]‖ / ‖v‖, since the truncated vector is the full one with
    the tail zeroed.  This is the audit an embedding pipeline runs
    before shipping truncatable vectors: how much cosine mass does
    each candidate serving dimension keep?

    Emits one row per (id, m): (id, m, fidelity), fidelity rounded
    to 6 dp.  Construction is a single posexplode + ONE keyed
    aggregation on id (conditional prefix power sums as exact
    DECIMAL — partition-order-free, the agg_global_stats rule), then
    a 1→len(prefixes) stack of the per-vec row.  Shuffle volume is
    the element relation; no UDF, no HOF lambda in the hot path
    (IEEE sqrt and division are correctly rounded, so the double
    math is bit-identical in any engine once the sums are exact).
    """
    ms = sorted(int(m) for m in prefixes)
    x = df.select(
        F.col(id_col), F.posexplode(vec_col).alias("_pos", "_f")
    ).select(
        id_col,
        "_pos",
        (F.col("_f").cast("double") * F.col("_f").cast("double"))
        .cast("decimal(28,6)")
        .alias("_v2"),
    )
    aggs = [
        F.sum(F.when(F.col("_pos") < m, F.col("_v2"))).alias(f"_ss{m}")
        for m in ms
    ] + [F.sum("_v2").alias("_ssall")]
    per = x.groupBy(id_col).agg(*aggs)
    stack = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(m).alias("m"),
                    F.round(
                        F.sqrt(
                            F.coalesce(F.col(f"_ss{m}"), F.lit(0)).cast(
                                "double"
                            )
                            / F.col("_ssall").cast("double")
                        ),
                        6,
                    ).alias("fidelity"),
                )
                for m in ms
            ]
        )
    )
    return per.select(id_col, stack.alias("_s")).select(
        id_col, F.col("_s.m").alias("m"), F.col("_s.fidelity").alias("fidelity")
    )


def jl_project(
    df: DataFrame,
    out_dim: int = 16,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss sign projection: (id, _jl array<double>)
    with _jl = V·S/√out_dim, S a deterministic ±1 matrix derived from
    the same portable LCG as the LSH hyperplanes (_planes) — no
    platform RNG, so projections are reproducible anywhere.

    One Arrow matmul kernel per batch; the projected corpus is
    out_dim/dim the size of the original (4× smaller at 64→16), which
    is the point at 100 TB: the shortlist search runs over the small
    projection and only shortlist·|Q| full vectors are ever touched.
    """
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StructField,
        StructType,
    )

    S = (
        np.asarray(
            [
                [1.0 if x >= 0 else -1.0 for x in row]
                for row in _planes(out_dim, dim, seed)
            ],
            dtype=np.float64,
        ).T
        / np.sqrt(out_dim)
    )
    id_field = df.schema[id_col]
    schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("_jl", ArrayType(DoubleType(), False), False),
        ]
    )

    def kern(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if V.shape[1] != dim:
                raise ValueError(
                    f"jl_project: vector dim {V.shape[1]} != declared {dim}"
                )
            P = V @ S
            yield pd.DataFrame({id_col: pdf[id_col], "_jl": list(P)})

    return df.select(id_col, vec_col).mapInPandas(kern, schema)


def jl_shortlist_fraction(
    df: DataFrame,
    out_dim: int = 32,
    sample: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Measure corpus clusteredness and return the JL shortlist
    fraction the operating curve prescribes (VERDICT r8 item 4 — the
    fixed worst-case n/3 knob made every corpus pay the isotropic
    price).

    Statistic: over a deterministic ``sample``-vector slice (top-N by
    xxhash64 of the id — stable across runs and partitionings), the
    median top-1 EXACT cosine ``m`` and the robust bulk spread
    ``s_bulk`` (IQR/1.349 of all pairwise cosines).  A true neighbor
    at cosine ``m`` must out-rank the bulk in PROJECTED order, where
    both carry extra JL noise ``s_proj = sqrt((1+m^2)/out_dim)``; the
    expected fraction of corpus out-ranking it is the normal tail
    ``P(N(0, s_bulk^2 + s_proj^2) > m)``.

    Curve: ``fraction = clamp(5 * tail, 0.02, 1/3)`` — the 5x pads the
    tail estimate so the 5th neighbor (weaker than the median top-1
    anchor) still lands inside the shortlist.  Measured on 2000-vector
    64-dim corpora, recall@5 after exact re-rank at the chosen
    fraction:

      isotropic        m=0.34  tail=0.067  -> 1/3   (cap)   recall 0.98
      clustered c=0.41 m=0.54  tail=0.012  -> 0.062         recall 0.93
      clustered c=0.71 m=0.78  tail=0.001  -> 0.02  (floor) recall 0.94

    The isotropic case reproduces the shipped r8 worst-case knob; a
    genuinely clustered corpus (every real embedding corpus) stops
    paying a 33% scan.  Cost: one TakeOrdered job over (id, vec) and
    a ``sample^2`` driver-side numpy pass — independent of corpus
    size."""
    from math import erfc, sqrt

    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(sample)
        .collect()
    )
    if len(rows) < 8:
        return 1 / 3  # too small to measure; worst case is also cheap
    V = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    C = V @ V.T
    np.fill_diagonal(C, -2.0)
    m = float(np.median(C.max(axis=1)))
    iu = np.triu_indices(len(V), 1)
    q75, q25 = np.quantile(C[iu], [0.75, 0.25])
    s_bulk = float(q75 - q25) / 1.349
    s_proj = sqrt((1.0 + m * m) / out_dim)
    s_b = sqrt(s_bulk * s_bulk + s_proj * s_proj)
    tail = 0.5 * erfc(m / (s_b * sqrt(2.0)))
    return min(1 / 3, max(0.02, 5.0 * tail))


def jl_topk(
    df: DataFrame,
    query_pred: Column,
    k: int = 5,
    out_dim: int = 16,
    shortlist: int = 50,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage dim-reduced ANN: JL-projected cosine shortlist +
    exact cosine re-rank — the third member of the shortlist family
    (IVF probes cells, PQ scores codes, JL searches a 4×-smaller
    dense projection; all three re-rank exactly, so recall against
    cosine_topk depends only on shortlist coverage).

    ``query_pred`` may reference any column of ``df`` (it is applied
    to the ORIGINAL frame; the matching ids are broadcast onto the
    projection).  Returns (query_id, nn_id, cosine, rn ≤ k) ranked by
    exact cosine (desc, nn_id) like the other *_topk operators.
    """
    proj = jl_project(
        df, out_dim=out_dim, dim=dim, seed=seed, id_col=id_col, vec_col=vec_col
    )
    qids = df.filter(query_pred).select(F.col(id_col))
    pf = proj.join(
        F.broadcast(qids.withColumn("_isq", F.lit(True))), id_col, "left"
    ).withColumnRenamed("_jl", vec_col)
    short = cosine_topk(
        pf,
        F.col("_isq").isNotNull(),
        k=shortlist,
        id_col=id_col,
        vec_col=vec_col,
    ).select("query_id", "nn_id")
    v = with_norm(df, vec_col)
    qv = v.join(F.broadcast(qids), id_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    cv = v.select(
        F.col(id_col).alias("nn_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    sim = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nn_id"))
    return (
        short.join(F.broadcast(qv), "query_id")
        .join(cv, "nn_id")
        .select("query_id", "nn_id", sim.alias("cosine"))
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )


def triplet_mining(
    df: DataFrame,
    query_pred: Column,
    dup_threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Contrastive-training triplet mining: for each anchor matching
    ``query_pred``, its POSITIVE (top-1 exact-cosine neighbor) and its
    HARDEST NEGATIVE (top-1 neighbor with cosine below
    ``dup_threshold`` — the most-confusable vector that is not a
    near-duplicate), plus the margin between them.  This is the
    mining step of every embedding-model training loop (in-batch
    negatives are easy; the hard ones come from a corpus sweep like
    this).

    Returns (anchor_id, positive_id, cos_pos, negative_id, cos_neg,
    margin), one row per anchor that has at least one candidate on
    each side of the threshold.

    Shape: the cosine_topk pattern — |Q| anchors broadcast onto one
    partitioned corpus scan — feeding ONE aggregation that computes
    both argmaxes at once (lexicographic struct max realizes the
    (cosine desc, cand_id asc) order; the filtered negative is a
    conditional max in the same pass), so the corpus is swept exactly
    once and partial aggregation runs map-side.  Scale path: replace
    the exact sweep with any shortlist generator (IVF / JL / PQ)
    feeding the same aggregate."""
    base = with_norm(df, vec_col)
    q = base.filter(query_pred).select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    c = base.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    sim = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    sims = (
        c.join(F.broadcast(q), F.col("anchor_id") != F.col("cand_id"))
        .select("anchor_id", "cand_id", sim.alias("cosine"))
    )
    # BOTH argmaxes in ONE aggregation pass: struct max is
    # lexicographic, so max(struct(cosine, -cand_id)) realizes the
    # (cosine desc, cand_id asc) total order without a window — a
    # two-window formulation duplicates the whole corpus-sweep
    # subtree per ranking (Catalyst has no CTE reuse across windows;
    # measured 8 scans vs 4 on this query's plan).
    ranked = F.struct(F.col("cosine"), (-F.col("cand_id")).alias("_nc"))
    agg = sims.groupBy("anchor_id").agg(
        F.max(ranked).alias("_p"),
        F.max(
            F.when(F.col("cosine") < F.lit(dup_threshold), ranked)
        ).alias("_n"),
    )
    return agg.filter(F.col("_n").isNotNull()).select(
        "anchor_id",
        (-F.col("_p._nc")).alias("positive_id"),
        F.col("_p.cosine").alias("cos_pos"),
        (-F.col("_n._nc")).alias("negative_id"),
        F.col("_n.cosine").alias("cos_neg"),
        (F.col("_p.cosine") - F.col("_n.cosine")).alias("margin"),
    )


# --------------------------------------------------------------------------
# Persisted IVF index + incremental maintenance (round 13, VERDICT
# r11 item 5 / r12 item 2).  A 100 TB corpus appends daily; retraining
# and re-assigning the whole corpus per query batch (what a bare
# ivf_topk call does) re-pays the corpus-wide assignment pass every
# time.  This section makes the index a PERSISTED artifact with an
# append path:
#
#     {index_dir}/_CENTROIDS         json model (single-object,
#                                    atomically replaced on retrain)
#     {index_dir}/v=00001/...        assignment segments:
#     {index_dir}/v=00002/...        (id, vec, _norm, _cell), one per
#                                    build/append, via the versioned
#                                    store's claim-checked publish
#
# * build_ivf_index     — train once, assign the corpus, persist both.
# * append_ivf_index    — assign ONLY the new vectors to the EXISTING
#                         centroids (no retrain, no corpus re-scan)
#                         and publish them as the next segment — the
#                         daily-delta cost is O(|delta|·c), exactly
#                         ns_incremental_dedup's posture for dedup.
# * ivf_index_topk      — probe the STORED assignments: query-time
#                         corpus work is one pruned scan of the
#                         segment union + the cell equi-join.
# * ivf_index_cell_stats / appended drift — the structural half of
#   the retrain trigger: appends can only degrade recall by LANDING
#   BADLY relative to frozen centroids, which shows up as occupancy
#   skew of appended rows vs the trained baseline.  The behavioral
#   half (planted-pair recall after appends) is the ns_ann_index_append
#   gate's job; retrain = rebuild at the same index_dir (fresh
#   segment history, atomically re-pointed centroids).
# --------------------------------------------------------------------------

IVF_CENTROIDS_MARKER = "_CENTROIDS"


def _ivf_assigned_rel(
    df: DataFrame, cents: list[list[float]], id_col: str, vec_col: str
) -> DataFrame:
    """(id, vec, _norm, _cell) — the persisted index row shape."""
    return _assign_cells(df, cents, id_col, vec_col).withColumn(
        "_norm", norm_col(F.col(vec_col))
    )


def build_ivf_index(
    spark,
    df: DataFrame,
    index_dir: str,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_mod: int = 1,
    max_train: int = 65536,
) -> dict:
    """Train centroids on ``df``, assign every row, persist the model
    + assignments.  Rebuilding at an existing ``index_dir`` is the
    RETRAIN path: a fresh segment carries the full re-assignment and
    the centroid pointer is atomically replaced, so a reader holds
    either the old complete model or the new one.  Single-flight like
    all maintenance here (shard_append.compact_corpus's contract)."""
    import json as _json

    from ..sources.manifest import _write_text_atomic
    from ..sources.versioned import write_version

    cents = train_ivf_centroids(
        df, n_centroids, iters, id_col, vec_col, train_mod, max_train
    )
    assigned = _ivf_assigned_rel(df, cents, id_col, vec_col)
    ver = write_version(spark, assigned, index_dir)
    _write_text_atomic(
        spark,
        f"{index_dir.rstrip('/')}/{IVF_CENTROIDS_MARKER}",
        _json.dumps(
            {
                "kind": "ivf",
                "metric": "cosine",
                "id_col": id_col,
                "vec_col": vec_col,
                "base_version": ver,
                "centroids": cents,
            }
        ),
    )
    return {"version": ver, "n_centroids": len(cents)}


def load_ivf_model(spark, index_dir: str) -> dict:
    return _read_index_model(spark, index_dir, "ivf")


def append_ivf_index(spark, new_df: DataFrame, index_dir: str) -> dict:
    """Assign ONLY ``new_df`` to the index's existing centroids and
    publish the assignments as the next immutable segment — the
    incremental-maintenance path: cost O(|delta| · n_centroids) Arrow
    matmul + one segment write; the existing corpus is never re-read.
    Centroids are FROZEN by design (retrain is an explicit rebuild) —
    monotone-nested probe sets keep holding across appends, and drift
    is watched instead of silently absorbed (see module note)."""
    from ..sources.versioned import write_version

    model = load_ivf_model(spark, index_dir)
    assigned = _ivf_assigned_rel(
        new_df, model["centroids"], model["id_col"], model["vec_col"]
    )
    ver = write_version(spark, assigned, index_dir)
    return {"version": ver, "n_centroids": len(model["centroids"])}


def read_ivf_index(spark, index_dir: str) -> DataFrame:
    """Union of the LIVE assignment segments (segment number =
    partition column ``v``, pruned at the scan for as-of reads).

    COMPACTION-AWARE: a 24/7 index accretes one segment per append,
    and maintenance folds them exactly like the corpus store
    (shard_append.compact_corpus works on any ``v=*`` union) — so the
    read resolves the ``_BASE`` commit point when one is committed.
    A raw ``v=*`` glob here would silently DROP folded rows after
    compact+vacuum (the shard_append._base_info hazard class).

    RETRAIN-AWARE: a rebuild at an existing ``index_dir`` publishes a
    fresh full segment and atomically re-points the model, whose
    ``base_version`` records that segment number — so only segments
    ``v >= base_version`` belong to the CURRENT model.  Reading the
    raw union would resurface every pre-retrain row (duplicate ids,
    ``_cell``/``_buckets``/``_codes`` assigned under the superseded
    model); the filter works uniformly because compaction carries
    each row's original ``v`` as a data column.  Superseded segments
    stay on disk until compact+vacuum folds and reaps them."""
    from ..streaming.shard_append import read_corpus

    model = _read_index_model(spark, index_dir, kind=None)
    return read_corpus(spark, index_dir).where(
        F.col("v") >= int(model.get("base_version", 0))
    )


def ivf_index_cell_stats(spark, index_dir: str) -> DataFrame:
    """(v, _cell, n) occupancy — the structural drift signal.  A
    segment whose rows pile into few cells relative to the base
    segment's spread means the frozen centroids no longer describe
    the incoming distribution (probe cost and recall both degrade);
    this is the cheap always-on trigger, the recall gate the
    authoritative one.  Column-pruned scan: reads two small columns
    of the index, never the vectors."""
    return (
        read_ivf_index(spark, index_dir)
        .groupBy("v", "_cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def ivf_index_topk(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    max_queries: int = 65536,
    q_chunk: int = 2048,
    tie_margin: int = 16,
) -> DataFrame:
    """Top-k through the PERSISTED index, Arrow-kernel scored (r14).

    The query matrix is collected driver-side (bounded, loud-fail
    past ``max_queries`` — the expression path's unbounded broadcast
    was itself a latent hazard) and probes its ``n_probe`` nearest
    cells with one driver-side matmul — bit-identical cell choice to
    the ``mapInPandas`` probe it replaces (same argsort(-(v@C))
    stable order).  Corpus side is one column-pruned scan of the
    live segments; each batch groups by ``_cell``, matmuls the cell's
    query block against the cell's vectors, and emits per-batch
    top-(k+1)+tie-margin survivors per query (``_np_block_topk`` —
    ties rank by nn_id like the final window); one window reduces to
    the global top-k.

    Why: the expression path scored candidates with the interpreted
    Catalyst fold (~1.4 µs/pair), which is fine on healthy indexes
    (cells ~n/n_centroids, probe sets small) but is exactly wrong
    under the DRIFT regime this index family is instrumented for —
    a collapsed-occupancy cell concentrates |Q|·|hot cell| pairs in
    a few tasks (the sf10 drift gate's pre-retrain probe serialized
    ~4.5e8 interpreted folds).  The kernel turns that hot spot into
    einsum blocks and ships ≤ (k+1)·|Q| rows per batch to the window
    instead of every candidate pair.

    Ranking contract and emissions are unchanged (query_id, nn_id,
    cosine, rn; cosine desc, nn_id asc; self-pair excluded) — parity
    with the retained expression twin ``_ivf_index_topk_expr`` is
    pytest-pinned on ranked triples, including a planted hot cell.
    Cosine VALUES may differ from the interpreted fold in the last
    ULP (einsum pairwise summation): consumers stay recall/set-gated
    (the repo's Arrow-kernel discipline; every registry consumer of
    this function already is)."""
    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    model = load_ivf_model(spark, index_dir)
    id_col, vec_col = model["id_col"], model["vec_col"]
    C = np.asarray(model["centroids"], dtype=np.float64).T

    qrows = (
        queries.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(max_queries + 1)
        .collect()
    )
    if not qrows:
        raise ValueError("empty query set for ivf_index_topk")
    if len(qrows) > max_queries:
        raise ValueError(
            f"ivf_index_topk query set exceeds max_queries="
            f"{max_queries}; narrow the query relation or raise the "
            "cap deliberately"
        )
    qids = np.asarray([r[0] for r in qrows])
    Q = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    qn = np.sqrt((Q * Q).sum(axis=1))
    probe_cells = np.argsort(-(Q @ C), axis=1, kind="stable")[
        :, :n_probe
    ]
    # cell -> indices of the queries probing it (drift concentrates
    # these into few cells; the kernel's cost is then one big matmul
    # per batch instead of |Q|·|cell| interpreted folds)
    cell_to_q: dict[int, "np.ndarray"] = {}
    for c in np.unique(probe_cells):
        cell_to_q[int(c)] = np.unique(
            np.nonzero(probe_cells == c)[0]
        )
    keep = k + 1  # self-pair may occupy one slot; dropped post-window

    q_id_dt = queries.schema[id_col].dataType
    corpus = read_ivf_index(spark, index_dir).select(
        F.col(id_col).alias("nn_id"),
        F.col(vec_col).alias("_cv"),
        "_cell",
    )
    out_schema = StructType(
        [
            StructField("query_id", q_id_dt, False),
            StructField("nn_id", corpus.schema["nn_id"].dataType, False),
            StructField("cosine", DoubleType(), False),
        ]
    )

    def cell_topk(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for cell, grp in pdf.groupby("_cell", sort=False):
                qidx = cell_to_q.get(int(cell))
                if qidx is None:
                    continue
                V = np.stack(grp["_cv"].to_numpy()).astype(np.float64)
                vn = np.sqrt((V * V).sum(axis=1))
                ids = grp["nn_id"].to_numpy()
                for lo in range(0, len(qidx), q_chunk):
                    qi = qidx[lo : lo + q_chunk]
                    S = (Q[qi] @ V.T) / np.outer(qn[qi], vn)
                    sel_ids, sel_vals = _np_block_topk(
                        S, ids, keep, tie_margin
                    )
                    t = sel_ids.shape[1]
                    yield pd.DataFrame(
                        {
                            "query_id": np.repeat(qids[qi], t),
                            "nn_id": sel_ids.reshape(-1),
                            "cosine": sel_vals.reshape(-1),
                        }
                    )

    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nn_id")
    )
    return (
        corpus.mapInPandas(cell_topk, out_schema)
        .where(F.col("query_id") != F.col("nn_id"))
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )


def _ivf_index_topk_expr(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """The pre-r14 expression-path twin of ``ivf_index_topk``, kept
    (like ``dedup.sig_from_arrays``'s precedent) so the kernel's
    ranking can be parity-pinned against a plan whose every step is
    independently readable: queries map to cells via a mapInPandas
    probe, candidates meet the stored assignments through a broadcast
    cell equi-join, and the interpreted ``_dot`` fold scores inside —
    identical join shape and tie-breaks to ivf_topk, with the corpus
    side a parquet scan of the segment union.  Quadratic in the hot
    cell under drift — test/parity use only."""
    import numpy as np
    from pyspark.sql.types import IntegerType, StructField, StructType

    model = load_ivf_model(spark, index_dir)
    id_col, vec_col = model["id_col"], model["vec_col"]
    C = np.asarray(model["centroids"], dtype=np.float64).T

    c = read_ivf_index(spark, index_dir).select(
        F.col(id_col).alias("nn_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
        "_cell",
    )

    qin = with_norm(queries.select(id_col, vec_col), vec_col)
    q_schema = StructType(
        list(qin.schema.fields)
        + [StructField("_qcell", IntegerType(), False)]
    )

    def probe(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            order = np.argsort(-(v @ C), axis=1, kind="stable")[:, :n_probe]
            rep = pdf.loc[pdf.index.repeat(order.shape[1])].copy()
            rep["_qcell"] = order.reshape(-1).astype("int32")
            yield rep

    q = qin.mapInPandas(probe, q_schema).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
        "_qcell",
    )
    sim = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nn_id")
    )
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


# --------------------------------------------------------------------------
# LSH + PQ persisted indexes (round 13): the same build / append /
# query lifecycle as the IVF index above, completing VERDICT r11
# item 5's "IVF/LSH/PQ retrain per call" across all three ANN
# families.  Shared anatomy: a single-object model marker
# (atomically replaced on rebuild) + immutable claim-checked
# assignment segments; appends touch ONLY the delta.
#
# * LSH — the model is just the (num_tables, bits, dim, seed) plane
#   config: planes are data-independent, so appends cannot drift
#   recall AT ALL (the hyperplanes don't care what was trained);
#   persisting buys not re-hashing the standing corpus per query.
# * PQ — codebooks are frozen like IVF centroids; appends encode the
#   delta against them (O(|delta|·m·k) Arrow matmuls), and drift is
#   watched by the ns_pq_index_append recall gate.
# --------------------------------------------------------------------------


def _write_index_model(spark, index_dir: str, model: dict) -> None:
    import json as _json

    from ..sources.manifest import _write_text_atomic

    _write_text_atomic(
        spark,
        f"{index_dir.rstrip('/')}/{IVF_CENTROIDS_MARKER}",
        _json.dumps(model),
    )


def _read_index_model(spark, index_dir: str, kind: str | None) -> dict:
    """``kind=None`` loads the model without a family check (the
    shared segment reader needs only ``base_version``)."""
    from json import loads

    from ..sources.manifest import _read_text

    text = _read_text(
        spark, f"{index_dir.rstrip('/')}/{IVF_CENTROIDS_MARKER}"
    )
    if text is None:
        label = kind.upper() if kind else "index"
        raise FileNotFoundError(f"no {label} model under {index_dir}")
    model = loads(text)
    got = model.get("kind", "ivf")  # pre-r13 IVF markers carry no kind
    if kind is not None and got != kind:
        raise ValueError(
            f"index under {index_dir} is kind={got!r}, not {kind!r}"
        )
    return model


def build_lsh_index(
    spark,
    df: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 16,
    bits: int = 4,
    dim: int = 64,
    seed: int = 7,
) -> dict:
    """Persist (id, vec, norm, bucket-array) for the corpus under the
    seeded hyperplane config — rebuild = atomic model re-point +
    fresh full segment, exactly build_ivf_index's contract."""
    from ..sources.versioned import write_version

    rel = with_norm(df.select(id_col, vec_col), vec_col).withColumn(
        "_buckets", lsh_table_buckets(vec_col, num_tables, bits, dim, seed)
    )
    ver = write_version(spark, rel, index_dir)
    _write_index_model(
        spark,
        index_dir,
        {
            "kind": "lsh",
            "metric": "cosine",
            "id_col": id_col,
            "vec_col": vec_col,
            "base_version": ver,
            "num_tables": num_tables,
            "bits": bits,
            "dim": dim,
            "seed": seed,
        },
    )
    return {"version": ver, "num_tables": num_tables, "bits": bits}


def append_lsh_index(spark, new_df: DataFrame, index_dir: str) -> dict:
    """Hash ONLY the delta under the index's plane config and publish
    it as the next segment — O(|delta| · L · b) JVM-side dot
    products, the standing corpus untouched.  Plane config is
    data-independent, so append recall is structurally identical to
    a full rebuild's (no drift dimension, unlike IVF/PQ)."""
    from ..sources.versioned import write_version

    m = _read_index_model(spark, index_dir, "lsh")
    rel = with_norm(
        new_df.select(m["id_col"], m["vec_col"]), m["vec_col"]
    ).withColumn(
        "_buckets",
        lsh_table_buckets(
            m["vec_col"], m["num_tables"], m["bits"], m["dim"], m["seed"]
        ),
    )
    return {"version": write_version(spark, rel, index_dir)}


def lsh_index_topk(
    spark, index_dir: str, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Top-k through the persisted LSH buckets: queries hash under
    the model's planes (JVM-side), candidates meet the STORED
    exploded buckets via the (t, b) equi-join, exact cosine ranks —
    lsh_topk's join shape with the corpus-side hashing amortized
    into the index."""
    m = _read_index_model(spark, index_dir, "lsh")
    id_col, vec_col = m["id_col"], m["vec_col"]
    stored = read_ivf_index(spark, index_dir)  # same segment layout
    c = stored.select(
        F.col(id_col).alias("nn_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
        F.explode("_buckets").alias("_tb"),
    ).select("nn_id", "_cv", "_cn", "_tb.t", "_tb.b")
    q = (
        with_norm(queries.select(id_col, vec_col), vec_col)
        .withColumn(
            "_buckets",
            lsh_table_buckets(
                vec_col, m["num_tables"], m["bits"], m["dim"], m["seed"]
            ),
        )
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            F.col("_norm").alias("_qn"),
            F.explode("_buckets").alias("_tb"),
        )
        .select("query_id", "_qv", "_qn", "_tb.t", "_tb.b")
    )
    pairs = (
        c.join(
            F.broadcast(q),
            ["t", "b"],
        )
        .where(F.col("query_id") != F.col("nn_id"))
        .select("query_id", "nn_id", "_qv", "_qn", "_cv", "_cn")
        .dropDuplicates(["query_id", "nn_id"])
    )
    sim = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nn_id")
    )
    return (
        pairs.select("query_id", "nn_id", sim.alias("cosine"))
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )


def build_pq_index(
    spark,
    df: DataFrame,
    index_dir: str,
    m: int = 8,
    n_cells: int = 16,
    dim: int = 64,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train: int = 65536,
) -> dict:
    """Train per-subspace codebooks on ``df``, encode every row, and
    persist (id, vec, norm, codes) segments + the codebook model —
    the vectors ride along for the exact-rerank stage so queries
    never touch the base table."""
    from ..sources.versioned import write_version

    books = train_pq_codebooks(
        df, m=m, k=n_cells, dim=dim, iters=iters,
        id_col=id_col, vec_col=vec_col, max_train=max_train,
    )
    rel = with_norm(df.select(id_col, vec_col), vec_col).join(
        pq_encode(df, books, id_col=id_col, vec_col=vec_col), id_col
    )
    ver = write_version(spark, rel, index_dir)
    _write_index_model(
        spark,
        index_dir,
        {
            "kind": "pq",
            "metric": "cosine",
            "id_col": id_col,
            "vec_col": vec_col,
            "base_version": ver,
            "m": m,
            "n_cells": n_cells,
            "dim": dim,
            "codebooks": books,
        },
    )
    return {"version": ver, "m": m, "n_cells": n_cells}


def append_pq_index(spark, new_df: DataFrame, index_dir: str) -> dict:
    """Encode ONLY the delta against the FROZEN codebooks and publish
    the next segment — O(|delta| · m · n_cells) Arrow matmuls.
    Codebook drift under appends is the ns_pq_index_append gate's
    watch (recall after append), mirroring the IVF posture."""
    from ..sources.versioned import write_version

    model = _read_index_model(spark, index_dir, "pq")
    id_col, vec_col = model["id_col"], model["vec_col"]
    rel = with_norm(new_df.select(id_col, vec_col), vec_col).join(
        pq_encode(new_df, model["codebooks"], id_col=id_col, vec_col=vec_col),
        id_col,
    )
    return {"version": write_version(spark, rel, index_dir)}


def pq_index_topk(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 50,
    max_queries: int = 4096,
) -> DataFrame:
    """Two-stage search through the persisted codes: ADC shortlist
    over the STORED m-byte codes (the corpus scan reads codes + id
    only — column pruning keeps vectors out of stage 1), exact
    cosine re-rank over the stored vectors for the shortlist rows —
    pq_topk's shape with encode amortized into the index."""
    import numpy as np
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StructField,
        StructType,
    )

    model = _read_index_model(spark, index_dir, "pq")
    id_col, vec_col = model["id_col"], model["vec_col"]
    # The id may be any orderable type (string doc keys build and
    # append fine) — derive its DataType from the query schema rather
    # than hardcoding long, so search doesn't fail late on an index
    # the build path happily accepted (ADVICE r13).
    id_dt = queries.schema[id_col].dataType
    npbooks = [
        np.asarray(b, dtype=np.float64) for b in model["codebooks"]
    ]
    m = len(npbooks)
    d_sub = npbooks[0].shape[1]

    qrows = (
        queries.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(max_queries + 1)
        .collect()
    )
    if not qrows:
        raise ValueError("empty query set for pq_index_topk")
    if len(qrows) > max_queries:
        raise ValueError(
            f"pq_index_topk query set exceeds max_queries={max_queries}"
        )
    qids = np.asarray([r[0] for r in qrows])
    Q = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    lut = np.stack(
        [Q[:, s * d_sub : (s + 1) * d_sub] @ npbooks[s].T for s in range(m)],
        axis=1,
    )
    nq = len(qids)

    stored = read_ivf_index(spark, index_dir)  # same segment layout
    out_schema = StructType(
        [
            StructField("query_id", id_dt, False),
            StructField("nn_id", id_dt, False),
            StructField("_adc", DoubleType(), False),
        ]
    )

    # r15: per-batch top-(shortlist+1) keep-boundary-ties preselection,
    # same exactness argument as pq_topk's kernel (any dropped row has
    # > shortlist strictly-greater batch rows ahead of it under the
    # window's (_adc desc, nn_id asc) order, at most one of them the
    # self-pair) — emission per batch is bounded instead of nq·n.
    keep = shortlist + 1

    def adc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack(pdf["_codes"].to_numpy()).astype(np.int64)
            n = len(C)
            scores = np.zeros((nq, n), dtype=np.float64)
            for s in range(m):
                scores += lut[:, s, :][:, C[:, s]]
            ids = pdf[id_col].to_numpy()
            if n > keep:
                part = np.partition(scores, n - keep, axis=1)
                thr = part[:, n - keep]
                qi, ci = np.nonzero(scores >= thr[:, None])
                yield pd.DataFrame(
                    {
                        "query_id": qids[qi],
                        "nn_id": ids[ci],
                        "_adc": scores[qi, ci],
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(qids, n),
                        "nn_id": np.tile(ids, nq),
                        "_adc": scores.reshape(-1),
                    }
                )

    scored = (
        stored.select(id_col, "_codes")
        .mapInPandas(adc, out_schema)
        .where(F.col("query_id") != F.col("nn_id"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("_adc").desc(), F.col("nn_id"))
    short = (
        scored.withColumn("_srn", F.row_number().over(w))
        .filter(F.col("_srn") <= shortlist)
        .select("query_id", "nn_id")
    )
    cos = cosine_pudf()
    qrel_schema = StructType(
        [
            StructField("query_id", id_dt, False),
            StructField("_qv", ArrayType(DoubleType()), False),
        ]
    )
    qrel = spark.createDataFrame(
        [(i.item() if hasattr(i, "item") else i, [float(x) for x in v])
         for i, v in zip(qids, Q)],
        qrel_schema,
    )
    cand = (
        short.join(F.broadcast(qrel), "query_id")
        .join(
            stored.select(
                F.col(id_col).alias("nn_id"), F.col(vec_col).alias("_cv")
            ),
            "nn_id",
        )
        .select("query_id", "nn_id", cos("_qv", "_cv").alias("cosine"))
    )
    w2 = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nn_id")
    )
    return cand.withColumn("rn", F.row_number().over(w2).cast("int")).filter(
        F.col("rn") <= k
    )
