"""North-star LLM-data-pipeline queries over documents/embeddings:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-
cosine), similarity search (brute-force + LSH), text analysis,
multimodal columns.  See operators/{dedup,similarity,text,multimodal}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import multimodal as M
from ..operators import similarity as S
from ..operators import text as X
from ._util import T
from .registry import query

# --------------------------------------------------------------------------
# Dedup family
# --------------------------------------------------------------------------


@query(
    "ns_dedup_exact",
    oracle="""
    SELECT min(doc_id) AS doc_id, md5(text) AS fp,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    tags=("northstar", "dedup"),
)
def ns_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content fingerprint, keep min id."""
    return D.exact_dedup(T(spark, sf_dir, "documents"))


@query(
    "ns_ngram_jaccard_pairs",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    sh0 AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                  ELSE array_to_string(w, ' ') END AS s
      FROM t, UNNEST(range(1, greatest(len(w) - 1, 2))) AS r(i)
    ),
    sh AS (SELECT DISTINCT doc_id, s FROM sh0),
    c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE) AS jaccard
    FROM p
    JOIN c ca ON ca.doc_id = doc_a
    JOIN c cb ON cb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE) >= 0.5
    """,
    tags=("northstar", "dedup"),
)
def ns_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard pairs ≥ 0.5 via shingle equi-join —
    the SQL-checkable ground truth for the MinHash path."""
    return D.ngram_jaccard_pairs(T(spark, sf_dir, "documents"), threshold=0.5)


@query(
    "ns_minhash_lsh_pairs",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    sh0 AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                  ELSE array_to_string(w, ' ') END AS s
      FROM t, UNNEST(range(1, greatest(len(w) - 1, 2))) AS r(i)
    ),
    sh AS (SELECT DISTINCT doc_id, s FROM sh0),
    c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_strong,
           TRUE AS recall_ok, TRUE AS subset_ok
    FROM p
    JOIN c ca ON ca.doc_id = doc_a
    JOIN c cb ON cb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE) >= 0.7
    """,
    tags=("northstar", "dedup"),
)
def ns_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64)+LSH(16 bands) near-dup candidates at ≥ 0.5, as a
    SELF-CHECKING gate (emitter + quality bar folded into one oracled
    query, VERDICT r4 item 1): runs the 100 TB near-dedup path (no
    pairwise scan; candidates only from band-bucket collisions,
    exact-verified at the threshold) and emits

    * n_strong   — count of exact word-3-gram Jaccard ≥ 0.7 pairs
                   (the oracle recomputes this in SQL; the all-pairs
                   join is the ORACLE's cost, the operator stays
                   bucketed),
    * recall_ok  — LSH candidates cover ≥ 95% of those strong pairs,
    * subset_ok  — every emitted pair really has exact Jaccard ≥ 0.5
                   (the emitter's verification step is sound).
    """
    docs = T(spark, sf_dir, "documents")
    exact = D.ngram_jaccard_pairs(docs, threshold=0.5)  # doc_a, doc_b, jaccard
    strong = exact.where(F.col("jaccard") >= 0.7).select("doc_a", "doc_b")
    cand = D.minhash_lsh_candidates(docs, threshold=0.5).select("doc_a", "doc_b")
    hit = cand.distinct().withColumn("_hit", F.lit(1))
    rec = strong.join(hit, ["doc_a", "doc_b"], "left").agg(
        F.count(F.lit(1)).alias("n_strong"),
        (
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))) / F.count(F.lit(1))
            >= F.lit(0.95)
        ).alias("recall_ok"),
    )
    sub = cand.join(
        exact.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_anti"
    ).agg((F.count(F.lit(1)) == 0).alias("subset_ok"))
    return rec.join(sub)


@query(
    "ns_simhash_pairs",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) > 0 AS BOOLEAN) AS has_pairs,
           TRUE AS recall_ok, TRUE AS purity_ok
    FROM documents
    """,
    tags=("northstar", "dedup"),
)
def ns_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs (Hamming ≤ 12) via 13 ~5-bit chunk
    buckets, as a SELF-CHECKING gate (emitter + pigeonhole guarantee
    folded into one oracled query, VERDICT r4 item 1): exact
    Hamming-≤12 pairs come from a broadcast all-pairs xor+bit_count
    over the 64-bit signatures (n² on BIGINTs is trivial at gate
    scale — this is the GATE's cost, the operator stays
    chunk-bucketed), then simhash_near_pairs must return exactly that
    set: recall_ok (nothing missed — the pigeonhole guarantee) AND
    purity_ok (nothing beyond the distance).  The signatures are
    engine-specific (xxhash64), so the oracle pins the corpus count
    and asserts the self-check booleans.

    The operator runs UNCAPPED here: the guarantee is a property of
    the chunk scheme, and the production hot-bucket cap deliberately
    trades it away in degenerate buckets (this very gate found that
    trade engaging at 5k docs — d=12 means ~5-bit chunks with only 32
    values each, so bucket population grows O(n/32) and ANY corpus
    eventually crosses the cap).  Beyond the cap, hot buckets degrade
    to star candidates — connectivity for clustering survives,
    pairwise completeness doesn't.  At 100 TB a d=12/64-bit scheme is
    inherently a weak filter (candidate volume ~n²·13/32); use a
    smaller distance (d ≤ 3 ⇒ 16-bit chunks, 65k values) when
    completeness at scale matters."""
    docs = T(spark, sf_dir, "documents")
    sig = D.simhash64(docs).select("doc_id", "simhash")
    a = sig.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sig.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    brute = (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .where(ham <= 12)
        .select("id_a", "id_b")
    )
    cand = D.simhash_near_pairs(
        docs, max_hamming=12, max_bucket_size=None
    ).select(F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b"))
    hit = cand.withColumn("_hit", F.lit(1))
    j = brute.join(hit, ["id_a", "id_b"], "left")
    recall = j.agg(
        (F.count(F.lit(1)) > 0).alias("has_pairs"),
        (
            F.coalesce(F.sum(F.coalesce(F.col("_hit"), F.lit(0))), F.lit(0))
            == F.count(F.lit(1))
        ).alias("recall_ok"),
    )
    purity = cand.join(brute, ["id_a", "id_b"], "left_anti").agg(
        (F.count(F.lit(1)) == 0).alias("purity_ok")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return n_docs.join(recall).join(purity)


@query(
    "ns_embedding_dedup",
    oracle="""
    SELECT CAST(least(100, count(*)) AS BIGINT) AS n_planted,
           TRUE AS recall_ok, TRUE AS purity_ok
    FROM embeddings WHERE vec_id < 100
    """,
    tags=("northstar", "dedup", "similarity"),
)
def ns_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine LSH near-duplicate dedup, as a SELF-CHECKING
    planted-pair gate (emitter + quality bar folded into one oracled
    query, VERDICT r4 item 1): every vec_id < 100 gains a slightly
    perturbed copy (cosine ≈ 0.99 to its original; the corpus's
    natural pair maximum is ~0.51, far below the 0.9 threshold), then
    `embedding_dedup_pairs` must (a) recover ≥ 95% of the planted
    pairs — at 16×4-bit tables the theoretical miss rate is ~3e-12 —
    and (b) return NOTHING else (purity: candidates are exact-cosine
    verified, and no unplanted pair crosses 0.9)."""
    off = 10_000_000
    base = T(spark, sf_dir, "embeddings")
    perturbed = F.transform(
        F.col("embedding"),
        lambda x, i: x + 0.02 * F.sin(F.col("vec_id") + i.cast("double")),
    ).cast("array<float>")
    planted = base.where(F.col("vec_id") < 100).select(
        (F.col("vec_id") + off).alias("vec_id"),
        perturbed.alias("embedding"),
        F.col("label"),
    )
    aug = base.unionByName(planted)
    # bits sized to the corpus so buckets stay under the hot-bucket
    # cap (target ~250 vectors/bucket): at the driver's 2k corpus this
    # is the historical bits=4; the r5 sf1 soak (20k vectors) showed
    # fixed bits=4 putting ~1250 in every bucket — the cap then
    # degrades planted recall below the gate bar.  Recall stays high
    # as bits grow because the 16 tables compound: at threshold 0.9
    # (per-bit collision ~0.856) miss ≈ (1 - 0.856^bits)^16.  The
    # count is one scalar job — IVF-trainer-precedent model state.
    import math

    n_corpus = base.count()
    bits = max(4, math.ceil(math.log2(max(n_corpus, 1) / 250 + 1)))
    pairs = S.embedding_dedup_pairs(aug, threshold=0.9, bits=bits)
    expect = base.where(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("id_a"), (F.col("vec_id") + off).alias("id_b")
    )
    hit = pairs.select("id_a", "id_b").withColumn("_hit", F.lit(1))
    j = expect.join(hit, ["id_a", "id_b"], "left")
    n_found = F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
    recall = j.agg(
        F.count(F.lit(1)).alias("n_planted"),
        (n_found / F.count(F.lit(1)) >= 0.95).alias("recall_ok"),
    )
    extras = pairs.join(expect, ["id_a", "id_b"], "left_anti").agg(
        (F.count(F.lit(1)) == 0).alias("purity_ok")
    )
    return recall.join(extras)


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------


@query(
    "ns_cosine_topk",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id < 10),
    sims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
             list_sum(list_transform(list_zip(q.embedding, c.embedding),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (q.nrm * c.nrm) AS cosine
      FROM q JOIN v c ON q.vec_id <> c.vec_id
    ),
    ranked AS (
      SELECT query_id, nn_id, cosine,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, nn_id) AS INT) AS rn
      FROM sims
    )
    SELECT query_id, nn_id, cosine, rn FROM ranked WHERE rn <= 5
    """,
    tags=("northstar", "similarity"),
)
def ns_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for query vectors vec_id < 10.
    Queries broadcast; corpus stays partitioned (scale path: lsh)."""
    return S.cosine_topk(
        T(spark, sf_dir, "embeddings"), F.col("vec_id") < 10, k=5
    )


@query(
    "ns_ann_lsh_topk",
    oracle="""
    SELECT CAST(5 * count(*) AS BIGINT) AS n_exact, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 10
    """,
    tags=("northstar", "similarity"),
)
def ns_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table hyperplane-LSH approximate top-5, as a
    SELF-CHECKING gate (emitter + recall bar folded into one oracled
    query, VERDICT r4 item 1): 16 tables × 4 bits, candidates meet
    only via bucket equi-joins; recall vs brute-force cosine on the
    vec_id < 10 query slice must reach ≥ 0.8 (measures ~0.9 on this
    unclustered corpus)."""
    emb = T(spark, sf_dir, "embeddings")
    exact = S.cosine_topk(emb, F.col("vec_id") < 10, k=5)
    approx = S.lsh_topk(emb, F.col("vec_id") < 10, k=5)
    return _recall_gate(exact, approx, 0.8)


@query(
    "ns_ann_ivf_topk",
    oracle="""
    SELECT CAST(5 * count(*) AS BIGINT) AS n_exact,
           TRUE AS recall_ok, TRUE AS mono_ok
    FROM embeddings WHERE vec_id < 10
    """,
    tags=("northstar", "similarity"),
)
def ns_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 as a SELF-CHECKING gate with an nprobe
    SWEEP (VERDICT r4 items 1 + 7): the corpus is inverted once over
    16 trained centroids (one deterministic trainer call, model reused
    across probe levels), queries probe their {1,2,4,6} nearest cells,
    and the gate emits

    * n_exact   — 5 × |query slice| (oracle-pinned),
    * recall_ok — recall vs brute-force cosine ≥ 0.8 at n_probe=6,
    * mono_ok   — recall is monotone non-decreasing along
                  n_probe 1 → 2 → 4 → 6.  With a FIXED model the
                  candidate sets are strictly nested, so any
                  violation means the bucketing itself regressed —
                  a bucketing bug can no longer hide at one lucky
                  operating point.
    """
    emb = T(spark, sf_dir, "embeddings")
    exact = S.cosine_topk(emb, F.col("vec_id") < 10, k=5).select(
        "query_id", "nn_id"
    )
    cents = S.train_ivf_centroids(emb, n_centroids=16)
    levels = [1, 2, 4, 6]
    cand = None
    for p in levels:
        one = (
            S.ivf_topk(
                emb,
                F.col("vec_id") < 10,
                k=5,
                n_centroids=16,
                n_probe=p,
                centroids=cents,
            )
            .select("query_id", "nn_id")
            .distinct()
            .withColumn("np", F.lit(p))
        )
        cand = one if cand is None else cand.unionByName(one)
    lv = spark.createDataFrame([(p,) for p in levels], "np int")
    ex = exact.crossJoin(F.broadcast(lv))
    j = ex.join(
        cand.withColumn("_hit", F.lit(1)), ["query_id", "nn_id", "np"], "left"
    )
    per = j.groupBy("np").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("h"),
    )

    def rec(p: int):
        return F.max(F.when(F.col("np") == p, F.col("h") / F.col("n")))

    return per.agg(
        F.max(F.when(F.col("np") == 6, F.col("n"))).alias("n_exact"),
        (rec(6) >= F.lit(0.8)).alias("recall_ok"),
        (
            (rec(1) <= rec(2)) & (rec(2) <= rec(4)) & (rec(4) <= rec(6))
        ).alias("mono_ok"),
    )


@query(
    "ns_ann_index_append",
    oracle="""
    SELECT CAST(count(*) FILTER (WHERE vec_id % 5 <> 0) AS BIGINT)
             AS n_base,
           CAST(count(*) FILTER (WHERE vec_id % 5 = 0) AS BIGINT)
             AS n_appended,
           CAST(5 * count(*) FILTER (WHERE vec_id % 5 = 0 AND vec_id < 50)
                AS BIGINT) AS n_exact,
           TRUE AS appended_visible_ok,
           TRUE AS recall_ok,
           FALSE AS retrain_needed
    FROM embeddings
    """,
    tags=("northstar", "similarity", "incremental"),
)
def ns_ann_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN index maintenance END-TO-END (VERDICT r11
    item 5 / r12 item 2): the index is BUILT once on the standing
    corpus (every vec_id % 5 != 0), two daily-delta batches (the
    % 5 == 0 slice split by parity) are APPENDED against the frozen
    centroids — O(|delta|·c) each, no corpus re-scan, exactly
    ns_incremental_dedup's posture for dedup — and queries then run
    through the PERSISTED segments.  The gate emits

    * n_base / n_appended — segment-union cardinalities read back
      from the index (oracle-pinned against the raw table, so a
      dropped or duplicated append hash-mismatches);
    * appended_visible_ok — anti-join of appended ids vs post-build
      segments is empty (every delta row individually findable);
    * recall_ok — planted-pair recall: exact brute-force cosine
      top-5 of the APPENDED queries (vec_id < 50) vs the index's
      answers at n_probe=10 must stay ≥ 0.8 (measures 0.90-0.92 at
      sf0.001-0.1; 6 probes sit at 0.76 on this UNCLUSTERED corpus
      with base-slice-trained centroids — see test_ann_ivf_recall's
      note on the corpus bounding IVF recall) — appends landing
      badly relative to frozen centroids surface HERE;
    * retrain_needed — the trigger bit (¬recall_ok): oracle-pinned
      FALSE, so recall drift flips the row and fails the gate loudly.

    Build + appends write real segments (versioned claim-checked
    publishes) in a scratch dir discarded after the checkpoint.
    Shared gate body: _index_append_gate (the LSH/PQ legs reuse it)."""
    return _index_append_gate(
        spark,
        sf_dir,
        build=lambda df, idx: S.build_ivf_index(
            spark, df, idx, n_centroids=16
        ),
        append=lambda df, idx: S.append_ivf_index(spark, df, idx),
        topk=lambda idx, q: S.ivf_index_topk(
            spark, idx, q, k=5, n_probe=10
        ),
    )


def _index_append_gate(
    spark: SparkSession, sf_dir: str, build, append, topk
) -> DataFrame:
    """Shared body of the three ANN-index append gates (IVF/LSH/PQ):
    build on the standing corpus (vec_id % 5 != 0), append the two
    parity-split delta batches against the FROZEN model, query the
    appended slice (vec_id < 50) through the persisted segments, and
    emit the append-visibility + planted-pair-recall + retrain-bit
    row (see ns_ann_index_append's docstring for the contract)."""
    import shutil
    import tempfile

    emb = T(spark, sf_dir, "embeddings")
    is_delta = F.col("vec_id") % 5 == 0
    work = tempfile.mkdtemp(prefix="ann_idx_")
    try:
        idx = f"{work}/index"
        build(emb.filter(~is_delta), idx)
        append(emb.filter(is_delta & (F.col("vec_id") % 2 == 0)), idx)
        append(emb.filter(is_delta & (F.col("vec_id") % 2 == 1)), idx)
        # kind-agnostic model read (the three families share the
        # marker layout; only the payload differs)
        from json import loads

        from ..sources.manifest import _read_text

        bv = loads(_read_text(spark, f"{idx}/{S.IVF_CENTROIDS_MARKER}"))[
            "base_version"
        ]
        idx_df = S.read_ivf_index(spark, idx)
        counts = idx_df.agg(
            F.sum(F.when(F.col("v") <= bv, 1).otherwise(0))
            .cast("long")
            .alias("n_base"),
            F.sum(F.when(F.col("v") > bv, 1).otherwise(0))
            .cast("long")
            .alias("n_appended"),
        )
        missing = (
            emb.filter(is_delta)
            .select("vec_id")
            .join(
                idx_df.filter(F.col("v") > bv).select("vec_id"),
                "vec_id",
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_missing"))
        )
        q_pred = is_delta & (F.col("vec_id") < 50)
        exact = S.cosine_topk(emb, q_pred, k=5).select("query_id", "nn_id")
        approx = topk(
            idx, emb.filter(q_pred).select("vec_id", "embedding")
        ).select("query_id", "nn_id")
        rec = exact.join(
            approx.withColumn("_h", F.lit(1)), ["query_id", "nn_id"], "left"
        ).agg(
            F.count(F.lit(1)).alias("n_exact"),
            (
                F.sum(F.coalesce(F.col("_h"), F.lit(0)))
                / F.count(F.lit(1))
            ).alias("recall"),
        )
        out = (
            counts.crossJoin(missing)
            .crossJoin(rec)
            .select(
                "n_base",
                "n_appended",
                "n_exact",
                (F.col("n_missing") == 0).alias("appended_visible_ok"),
                (F.col("recall") >= 0.8).alias("recall_ok"),
                (~(F.col("recall") >= 0.8)).alias("retrain_needed"),
            )
            .localCheckpoint()  # pin before the workspace is removed
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


_INDEX_GATE_ORACLE = """
    SELECT CAST(count(*) FILTER (WHERE vec_id % 5 <> 0) AS BIGINT)
             AS n_base,
           CAST(count(*) FILTER (WHERE vec_id % 5 = 0) AS BIGINT)
             AS n_appended,
           CAST(5 * count(*) FILTER (WHERE vec_id % 5 = 0 AND vec_id < 50)
                AS BIGINT) AS n_exact,
           TRUE AS appended_visible_ok,
           TRUE AS recall_ok,
           FALSE AS retrain_needed
    FROM embeddings
    """


@query(
    "ns_lsh_index_append",
    oracle=_INDEX_GATE_ORACLE,
    tags=("northstar", "similarity", "incremental"),
)
def ns_lsh_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LSH index maintenance (round 13 — the LSH leg of
    VERDICT r11 item 5): persisted hyperplane bucket segments with
    delta-only appends.  Unlike IVF/PQ, the model (seeded plane
    config) is DATA-INDEPENDENT, so appends structurally cannot
    drift recall — the gate still pins planted-pair recall ≥ 0.8
    (measures 0.88-0.98 at sf0.001-0.1) because a collapse would
    mean the bucket join or segment plumbing broke, and the
    retrain bit stays the uniform alarm contract across the three
    index families.  operators/similarity.build_lsh_index."""
    return _index_append_gate(
        spark,
        sf_dir,
        build=lambda df, idx: S.build_lsh_index(spark, df, idx),
        append=lambda df, idx: S.append_lsh_index(spark, df, idx),
        topk=lambda idx, q: S.lsh_index_topk(spark, idx, q, k=5),
    )


@query(
    "ns_pq_index_append",
    oracle=_INDEX_GATE_ORACLE,
    tags=("northstar", "similarity", "incremental", "quantization"),
)
def ns_pq_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental PQ index maintenance (round 13 — the PQ leg of
    VERDICT r11 item 5): per-subspace codebooks trained once on the
    standing corpus (m=8, 256 cells — ns_pq_topk's operating point),
    delta batches ENCODED against the frozen books (O(|delta|·m·k)
    Arrow matmuls) and published as immutable segments; queries ADC-
    shortlist over the stored m-byte codes (corpus scan reads codes
    + id only) and exact-rerank over the stored vectors.  Shortlist
    = max(50, |corpus|/20), the measured operating point on this
    deliberately unclustered corpus (recall 0.90-1.0 at
    sf0.001-0.1); recall < 0.8 flips retrain_needed and fails the
    gate.  operators/similarity.build_pq_index."""
    import math

    n = T(spark, sf_dir, "embeddings").count()
    shortlist = max(50, math.ceil(n / 20))
    return _index_append_gate(
        spark,
        sf_dir,
        build=lambda df, idx: S.build_pq_index(spark, df, idx, n_cells=256),
        append=lambda df, idx: S.append_pq_index(spark, df, idx),
        topk=lambda idx, q: S.pq_index_topk(
            spark, idx, q, k=5, shortlist=shortlist
        ),
    )


@query(
    "ns_ann_drift_retrain",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_corpus,
           CAST(greatest(200, CAST(floor(count(*) / 10) AS BIGINT))
                AS BIGINT) AS n_shifted,
           TRUE AS occupancy_collapsed,
           TRUE AS retrain_needed_before,
           TRUE AS recall_restored_after,
           CAST(count(*) + greatest(200, CAST(floor(count(*) / 10)
                AS BIGINT)) AS BIGINT) AS n_live_after_retrain,
           CAST(0 AS BIGINT) AS n_dup_ids_after_retrain
    FROM embeddings
    """,
    tags=("northstar", "similarity", "incremental", "drift"),
)
def ns_ann_drift_retrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift watcher's TRUE branch, end-to-end (VERDICT r13
    item 2): every ns_*_index_append gate pins retrain_needed=FALSE
    on in-distribution appends — this gate plants a DRIFTED append,
    watches both triggers fire, retrains, and pins the recovery.

    Construction: an IVF index (16 cells) is built on the corpus,
    then a shifted cluster — max(200, n/10) rows at u + 0.05·v where
    u = centroids[0] + centroids[1] — is appended.  The u direction
    sits on the DECISION BOUNDARY between two frozen cells, so the
    near-identical cluster members split between them on the ε·v
    tie-break: the structural trigger fires (appended occupancy
    collapses to ≤ 2 of 16 cells — `ivf_index_cell_stats`), and the
    behavioral trigger fires (planted recall at n_probe=1 measures
    ~0.60 across sf0.001-0.1, the probed cell holding only its half
    of the split cluster), flipping retrain_needed TRUE.

    Retrain = `build_ivf_index` at the same dir over the full corpus:
    Lloyd relocates a centroid into the (now 9-29% of mass) cluster,
    assignment becomes decisive, recall returns to 1.0 — and the
    RETRAIN-AWARE read (`read_ivf_index` filters v >= base_version,
    ADVICE r13) shows exactly n + |shifted| live rows with zero
    duplicate ids: the superseded pre-retrain segments are invisible.

    LSH is exempt from this battery BY STRUCTURE: its model is the
    seeded hyperplane config, data-independent, so no append can
    drift it (ns_lsh_index_append's docstring); PQ's TRUE branch is
    pinned in tests/test_northstar.py::test_pq_drift_retrain_branch
    (codebook-resolution recovery needs the strided-init retrain,
    measured pre 0.66-0.74 → post 0.82-0.88 at sf0.001-0.1).

    All phase outputs are 1-row aggregates localCheckpoint-pinned
    BEFORE the next phase mutates the index dir (lazy plans would
    otherwise read post-retrain segments) and before the scratch
    workspace is reaped."""
    import shutil
    import tempfile

    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    n_shift = max(200, n // 10)
    work = tempfile.mkdtemp(prefix="ann_drift_")
    try:
        idx = f"{work}/index"
        S.build_ivf_index(spark, emb, idx, n_centroids=16)
        model = S.load_ivf_model(spark, idx)
        bv = model["base_version"]
        u = [
            a + b
            for a, b in zip(model["centroids"][0], model["centroids"][1])
        ]
        u_arr = F.array(*[F.lit(float(x)) for x in u])
        # the n_shift LOWEST ids present (TakeOrdered), not an id-value
        # bound: on a sliced/sparse id space the two disagree and the
        # count-derived oracle would mismatch (r14 soak-slice lesson)
        shifted = (
            emb.orderBy("vec_id")
            .limit(n_shift)
            .select(
                (F.col("vec_id") + 10_000_000).alias("vec_id"),
                F.zip_with(
                    u_arr, "embedding", lambda a, b: a + F.lit(0.05) * b
                )
                .cast("array<float>")
                .alias("embedding"),
            )
        )
        S.append_ivf_index(spark, shifted, idx)
        full = emb.unionByName(shifted)

        occ = (
            S.ivf_index_cell_stats(spark, idx)
            .agg(
                F.countDistinct(
                    F.when(F.col("v") <= bv, F.col("_cell"))
                ).alias("base_cells"),
                F.countDistinct(
                    F.when(F.col("v") > bv, F.col("_cell"))
                ).alias("app_cells"),
            )
            .localCheckpoint()
        )

        def _recall(approx: DataFrame) -> DataFrame:
            # Arrow kernel, not the interpreted pair-join: the exact
            # pass is n/10 queries × the corpus, and the expression
            # path's ~1.4 µs/pair would cost hours at sf10 (recall is
            # a boolean far from its 0.8 bar, so the kernel's
            # last-ULP einsum rounding cannot flip the emission)
            exact = S.cosine_topk_kernel(
                full, F.col("vec_id") >= 10_000_000, k=5
            ).select("query_id", "nn_id")
            return exact.join(
                approx.select("query_id", "nn_id").withColumn(
                    "_h", F.lit(1)
                ),
                ["query_id", "nn_id"],
                "left",
            ).agg(
                (
                    F.sum(F.coalesce(F.col("_h"), F.lit(0)))
                    / F.count(F.lit(1))
                ).alias("recall")
            )

        q = shifted.select("vec_id", "embedding")
        pre = _recall(
            S.ivf_index_topk(spark, idx, q, k=5, n_probe=1)
        ).localCheckpoint()  # pin BEFORE the retrain rewrites the dir

        S.build_ivf_index(spark, full, idx, n_centroids=16)
        post = _recall(S.ivf_index_topk(spark, idx, q, k=5, n_probe=1))
        live = S.read_ivf_index(spark, idx)
        audit = live.agg(
            F.count(F.lit(1)).cast("long").alias("n_live"),
            (
                F.count(F.lit(1))
                - F.countDistinct(F.col("vec_id"))
            ).cast("long").alias("n_dup_ids"),
        )
        out = (
            occ.crossJoin(pre.select(F.col("recall").alias("r_pre")))
            .crossJoin(post.select(F.col("recall").alias("r_post")))
            .crossJoin(audit)
            .select(
                F.lit(n).cast("long").alias("n_corpus"),
                F.lit(n_shift).cast("long").alias("n_shifted"),
                (F.col("app_cells") * 4 <= F.col("base_cells")).alias(
                    "occupancy_collapsed"
                ),
                (~(F.col("r_pre") >= 0.8)).alias("retrain_needed_before"),
                (F.col("r_post") >= 0.8).alias("recall_restored_after"),
                F.col("n_live").alias("n_live_after_retrain"),
                F.col("n_dup_ids").alias("n_dup_ids_after_retrain"),
            )
            .localCheckpoint()  # pin before the workspace is removed
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


@query(
    "ns_embedding_label_stats",
    oracle="""
    SELECT label,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(CAST(round(CAST(embedding[1] AS DOUBLE), 9)
                    AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)
             / count(*) AS avg_dim0,
           CAST(CAST(sum(CAST(round(sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 9)
                    AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)
             / count(*) AS avg_norm
    FROM embeddings GROUP BY label
    """,
    tags=("northstar", "agg"),
)
def ns_embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over ArrayType(FloatType): per-label counts, mean
    first component, mean L2 norm.

    Averages are EXACT decimal sums of 9-dp-quantized values divided
    by the count — plain F.avg(double) accumulates in partition order
    and drifted at the last ULP once the sf1 soak read multi-file
    embeddings (single-file inputs masked it); the quantize+decimal
    pattern is order-free at any split count.  The norm itself is a
    per-row sequential fold, identical in both engines."""
    e = T(spark, sf_dir, "embeddings")

    def qavg(col, alias):
        return (
            F.sum(F.round(col, 9).cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias(alias)

    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        qavg(F.element_at("embedding", 1).cast("double"), "avg_dim0"),
        qavg(S.norm_col(F.col("embedding")), "avg_norm"),
    )


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------


@query(
    "ns_text_stats",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           avg(CAST(n_chars AS DOUBLE)) AS avg_chars,
           avg(CAST(len(string_split(trim(text), ' ')) AS DOUBLE)) AS avg_tokens,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM documents GROUP BY lang
    """,
    tags=("northstar", "text"),
)
def ns_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats."""
    return X.text_stats(T(spark, sf_dir, "documents"))


@query(
    "ns_text_quality",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(trim(text), ' ')) AS INT) AS n_tokens,
           CAST(length(text) AS INT) AS n_chars_measured,
           (CAST(length(text) AS DOUBLE)
              - (CAST(len(string_split(trim(text), ' ')) AS DOUBLE) - 1))
             / CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS avg_token_len,
           CAST(len(list_filter(string_split(trim(text), ' '),
                t -> t IN ('the','a','of','and','in','to','is','on'))) AS DOUBLE)
             / CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS stopword_ratio,
           CAST(len(list_distinct(string_split(trim(text), ' '))) AS DOUBLE)
             / CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS distinct_ratio,
           0.4 * least(CAST(len(string_split(trim(text), ' ')) AS DOUBLE) / 100.0, 1.0)
             + 0.3 * (CAST(len(list_distinct(string_split(trim(text), ' '))) AS DOUBLE)
                      / CAST(len(string_split(trim(text), ' ')) AS DOUBLE))
             + 0.3 * least((CAST(len(list_filter(string_split(trim(text), ' '),
                       t -> t IN ('the','a','of','and','in','to','is','on'))) AS DOUBLE)
                      / CAST(len(string_split(trim(text), ' ')) AS DOUBLE)) * 4, 1.0)
             AS quality_score
    FROM documents
    """,
    tags=("northstar", "text"),
)
def ns_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality features + blended score (single projection)."""
    return X.quality_features(T(spark, sf_dir, "documents"))


@query(
    "ns_token_count_bpe",
    oracle="""
    SELECT source,
           CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
    """,
    tags=("northstar", "text"),
)
def ns_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex pretokenizer counts per source."""
    d = T(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(X.bpe_token_count(F.col("text")).cast("bigint")).alias("n_tokens")
    )


@query(
    "ns_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp_md5
    FROM documents
    """,
    tags=("northstar", "text"),
)
def ns_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized md5 fingerprint per doc (xxhash64 column is engine-
    specific, so the oracle checks the md5 only)."""
    return X.fingerprint(T(spark, sf_dir, "documents")).select("doc_id", "fp_md5")


# The lang-ID oracle is generated from the SAME marker profiles the
# Spark operator uses (operators/text.LANG_MARKERS), so the two can't
# drift: score = |distinct tokens ∩ markers|, argmax with
# first-profile-wins tie-break, 'und' when every score is 0.
_LANG_SCORE_SQL = ",\n".join(
    "             len(list_intersect(list_distinct(string_split(trim(text), ' ')), "
    f"""[{", ".join(f"'{m}'" for m in markers)}])) AS score_{lang}"""
    for lang, markers in X.LANG_MARKERS.items()
)
_LANG_BEST = "greatest(" + ", ".join(f"score_{l}" for l in X.LANG_MARKERS) + ")"
_LANG_PRED_SQL = (
    f"CASE WHEN {_LANG_BEST} = 0 THEN 'und' "
    + " ".join(
        f"WHEN score_{lang} = {_LANG_BEST} THEN '{lang}'"
        for lang in X.LANG_MARKERS
    )
    + " ELSE 'und' END"
)


@query(
    "ns_lang_id",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang,
{_LANG_SCORE_SQL}
      FROM documents
    )
    SELECT doc_id, lang, {_LANG_PRED_SQL} AS lang_pred,
           CAST(score_en AS INT) AS score_en,
           CAST(score_es AS INT) AS score_es
    FROM s
    """,
    tags=("northstar", "text"),
)
def ns_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic: per-profile scores + argmax
    prediction with first-profile-wins tie-break.  Pure column
    functions; the oracle SQL is generated from the same profile table
    so the heuristic is hash-checked, not just determinism-tested."""
    return X.lang_id(T(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "lang_pred", "score_en", "score_es"
    )


# --------------------------------------------------------------------------
# Multimodal columns
# --------------------------------------------------------------------------


@query(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           sha256(text) AS sha_hex
    FROM documents
    """,
    tags=("northstar", "multimodal"),
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload metadata, JVM-side (octet_length + sha2)."""
    return M.media_meta_sql(M.attach_payload(T(spark, sf_dir, "documents")))


@query(
    "mm_decode_stub",
    oracle="""
    SELECT doc_id,
           'image/fake' AS media_type,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           sha256(text) AS sha256,
           CAST(64 + CAST('0x' || substr(sha256(text), 1, 2) AS INT) % 192 AS INT) AS width,
           CAST(64 + CAST('0x' || substr(sha256(text), 3, 2) AS INT) % 192 AS INT) AS height,
           CAST(1 + CAST('0x' || substr(sha256(text), 5, 2) AS INT) % 4 AS INT) AS n_frames
    FROM documents
    """,
    tags=("northstar", "multimodal"),
)
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode pipeline over binary payloads — Arrow-batched
    UDF plumbing with a deterministic fake decode kernel.  The stub
    derives width/height/n_frames from sha256 bytes of the payload, so
    the whole stage — payload attach, Arrow batching, kernel, schema —
    is hash-verified end-to-end against the digest re-derived in SQL
    (the mm_fake_embed portable-digest pattern)."""
    return M.decode_media(M.attach_payload(T(spark, sf_dir, "documents")))


@query(
    "ns_vocab_topk",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT doc_id, t.token
      FROM documents, UNNEST(string_split(trim(text), ' ')) AS t(token)
    )
    SELECT token, CAST(count(*) AS BIGINT) AS doc_freq
    FROM toks GROUP BY token
    ORDER BY doc_freq DESC, token LIMIT 50
    """,
    tags=("northstar", "text"),
)
def ns_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-50 tokens by document frequency
    (operators/text.vocabulary) — per-doc array_distinct instead of a
    global DISTINCT shuffle, TakeOrdered instead of a full sort."""
    return X.vocabulary(T(spark, sf_dir, "documents"), top_k=50)


@query(
    "ns_tfidf_top_terms",
    oracle="""
    WITH tf AS (
      SELECT doc_id, t.token, CAST(count(*) AS BIGINT) AS tf
      FROM documents, UNNEST(string_split(trim(text), ' ')) AS t(token)
      GROUP BY doc_id, t.token
    ),
    dft AS (SELECT token, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY token),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             round(tf.tf * ln(n.n_docs / dft.df_t), 6) AS tfidf,
             CAST(row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY round(tf.tf * ln(n.n_docs / dft.df_t), 6) DESC, tf.token
             ) AS INT) AS rn
      FROM tf JOIN dft ON tf.token = dft.token CROSS JOIN n
    )
    SELECT doc_id, token, tfidf, rn FROM scored WHERE rn <= 3
    """,
    tags=("northstar", "text"),
)
def ns_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (operators/text.tfidf_top_terms):
    tf·ln(N/df) is a row-level product of exact integers — order-free
    without decimal games."""
    return X.tfidf_top_terms(T(spark, sf_dir, "documents"), k=3)


@query(
    "ns_knn_join",
    oracle="""
    SELECT CAST(3 * count(*) AS BIGINT) AS n_exact, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 10
    """,
    tags=("northstar", "similarity"),
)
def ns_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-to-corpus KNN join as a SELF-CHECKING gate (emitter +
    recall bar folded into one oracled query, VERDICT r4 item 1):
    every vector's approximate top-3 neighbors via the multi-table
    LSH bucket join with NO broadcast — both sides shuffle on
    (table, bucket), the only shape that survives when the 'query
    set' IS the 100 TB corpus.  The full join runs; recall is
    measured on the vec_id < 10 probe slice vs brute-force cosine
    and must reach ≥ 0.8."""
    emb = T(spark, sf_dir, "embeddings")
    exact = S.cosine_topk(emb, F.col("vec_id") < 10, k=3)
    approx = S.lsh_topk(
        emb, F.lit(True), k=3, broadcast_queries=False
    ).where(F.col("query_id") < 10)
    return _recall_gate(exact, approx, 0.8)


@query(
    "ns_winnow_fingerprints",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    s AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_transform(range(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                  ELSE [array_to_string(w, ' ')] END AS sh_str
      FROM t
    ),
    h AS (
      SELECT doc_id,
             list_transform(sh_str,
                 x -> CAST(concat('0x', substr(md5(x), 1, 14)) AS BIGINT)) AS sh
      FROM s
    ),
    m AS (
      SELECT doc_id,
             CASE WHEN len(sh) >= 4
                  THEN list_transform(range(1, len(sh) - 2),
                                      i -> list_min(sh[i:i+3]))
                  ELSE [list_min(sh)] END AS mins
      FROM h
    )
    SELECT DISTINCT doc_id, CAST(f AS BIGINT) AS fp
    FROM m, UNNEST(mins) AS u(f)
    """,
    tags=("northstar", "dedup", "fingerprint"),
)
def ns_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling window-min) fingerprints per document — the
    scalable local-fingerprint scheme: docs sharing any ≥6-token run
    share at least one fp, so overlap detection is an equi-join on fp.
    Runs the md5-derived portable-hash mode so the window-min selection
    itself is hash-checked against SQL (the xxhash64 fast path is the
    operator default; winnowing structure is identical)."""
    return D.winnow_fingerprints(
        T(spark, sf_dir, "documents"), k=3, w=4, portable_hash=True
    )


@query(
    "ns_shared_span_runs",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    g AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             CAST(concat('0x',
                  substr(md5(array_to_string(w[i:i+7], ' ')), 1, 14))
                  AS BIGINT) AS gh
      FROM t, UNNEST(range(1, len(w) - 6)) AS r(i)
      WHERE len(w) >= 8
    ),
    dfq AS (
      SELECT gh FROM (
        SELECT gh, count(DISTINCT doc_id) AS ndocs FROM g GROUP BY 1
      ) WHERE ndocs <= 50
    ),
    gk AS (SELECT g.* FROM g JOIN dfq USING (gh)),
    m AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.pos AS pa, b.pos AS pb
      FROM gk a JOIN gk b ON a.gh = b.gh AND a.doc_id < b.doc_id
    ),
    isl AS (
      SELECT doc_a, doc_b, pa, pb,
             pa - row_number() OVER (
               PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa
             ) AS grp
      FROM m
    ),
    runs AS (
      SELECT doc_a, doc_b,
             CAST(min(pa) AS BIGINT) AS start_a,
             CAST(min(pb) AS BIGINT) AS start_b,
             CAST(count(*) + 7 AS BIGINT) AS run_len
      FROM isl GROUP BY doc_a, doc_b, pa - pb, grp
    )
    SELECT doc_a, doc_b, start_a, start_b, run_len
    FROM runs WHERE run_len >= 20
    ORDER BY doc_a, doc_b, start_a
    """,
    tags=("northstar", "dedup", "substring"),
)
def ns_shared_span_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring detection (Lee et al. 2022 substring
    dedup, operators/dedup.shared_span_runs): maximal runs of ≥ 20
    tokens shared between document pairs, found via positional 8-gram
    hashing + a diagonal gaps-and-islands collapse — no suffix array,
    no all-pairs stage.  Every stage is a keyed shuffle (gram hash,
    then pair+diagonal), boilerplate grams capped at 50 docs, so the
    plan holds at corpus scale.  Runs the md5-derived portable-hash
    mode so the span structure itself is hash-checked against SQL
    (xxhash64 is the operator default fast path)."""
    return D.shared_span_runs(
        T(spark, sf_dir, "documents"),
        k=8,
        min_run=20,
        max_gram_docs=50,
        portable_hash=True,
    )


@query(
    "ns_substring_dedup_apply",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    g AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             CAST(concat('0x',
                  substr(md5(array_to_string(w[i:i+7], ' ')), 1, 14))
                  AS BIGINT) AS gh
      FROM t, UNNEST(range(1, len(w) - 6)) AS r(i)
      WHERE len(w) >= 8
    ),
    dfq AS (
      SELECT gh FROM (
        SELECT gh, count(DISTINCT doc_id) AS ndocs FROM g GROUP BY 1
      ) WHERE ndocs <= 50
    ),
    gk AS (SELECT g.* FROM g JOIN dfq USING (gh)),
    m AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.pos AS pa, b.pos AS pb
      FROM gk a JOIN gk b ON a.gh = b.gh AND a.doc_id < b.doc_id
    ),
    isl AS (
      SELECT doc_a, doc_b, pa, pb,
             pa - row_number() OVER (
               PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa
             ) AS grp
      FROM m
    ),
    runs AS (
      SELECT doc_a, doc_b,
             CAST(min(pb) AS BIGINT) AS start_b,
             CAST(count(*) + 7 AS BIGINT) AS run_len
      FROM isl GROUP BY doc_a, doc_b, pa - pb, grp
      HAVING count(*) + 7 >= 20
    ),
    cov AS (
      SELECT DISTINCT doc_b AS doc_id, CAST(p AS BIGINT) AS pos
      FROM runs, UNNEST(range(start_b, start_b + run_len)) AS r(p)
    ),
    toks AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i] AS tok
      FROM t, UNNEST(range(1, len(w) + 1)) AS r(i)
    ),
    kept AS (
      SELECT toks.* FROM toks ANTI JOIN cov USING (doc_id, pos)
    ),
    reb AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS clean_md5
      FROM kept GROUP BY doc_id
    ),
    tot AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM t)
    SELECT tot.doc_id, n_tokens,
           CAST(n_tokens - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(clean_md5, md5('')) AS clean_md5
    FROM tot LEFT JOIN reb USING (doc_id)
    ORDER BY doc_id
    """,
    tags=("northstar", "dedup", "substring"),
)
def ns_substring_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY step of substring dedup (operators/dedup.remove_shared_spans):
    every ≥20-token run shared between two docs is cut from the
    higher-id doc (all-but-one survival); emits per-doc token counts
    and an md5 fingerprint of the cleaned token sequence, so the
    oracle checks the full reconstruction byte-for-byte without
    shipping cleaned text.  Covered positions explode from the run
    table (volume ∝ duplicated footage, not corpus size) and leave
    via one LEFT ANTI join on (doc, pos)."""
    return D.remove_shared_spans(
        T(spark, sf_dir, "documents"),
        k=8,
        min_run=20,
        max_gram_docs=50,
        portable_hash=True,
    )


_JACCARD_PAIRS_CTES = """
    t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    sh0 AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                  ELSE array_to_string(w, ' ') END AS s
      FROM t, UNNEST(range(1, greatest(len(w) - 1, 2))) AS r(i)
    ),
    sh AS (SELECT DISTINCT doc_id, s FROM sh0),
    c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM p
      JOIN c ca ON ca.doc_id = doc_a
      JOIN c cb ON cb.doc_id = doc_b
      WHERE CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE) >= 0.5
    )
"""


@query(
    "ns_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE
    {_JACCARD_PAIRS_CTES},
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT u AS id, v AS peer FROM edges
      UNION
      SELECT r.id, e.v FROM reach r JOIN edges e ON e.u = r.peer
    )
    SELECT id AS doc_id,
           CAST(least(id, min(peer)) AS BIGINT) AS cluster_id
    FROM reach GROUP BY id
    """,
    tags=("northstar", "dedup", "graph"),
)
def ns_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over exact-Jaccard≥0.5 near-dup pairs —
    the step that turns a pair list into dedup groups (keep the min
    id, drop the rest).  Iterative min-label propagation (one keyed
    shuffle per round, early-stopped at the fixpoint); the oracle is
    the transitive closure as a recursive CTE."""
    pairs = D.ngram_jaccard_pairs(T(spark, sf_dir, "documents"), threshold=0.5)
    return D.dedup_clusters(pairs)


@query(
    "ns_stratified_sample",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             CAST(row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS INT) AS rn
      FROM documents
    )
    SELECT doc_id, lang, rn FROM ranked WHERE rn <= 20
    """,
    tags=("northstar", "sampling"),
)
def ns_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: exactly 20 docs per language,
    chosen by md5-of-id order — reproducible across engines and runs
    (unlike sampleBy's Bernoulli draws, which give approximate strata
    sizes).  One window shuffle on lang; at 100 TB prefer a per-stratum
    hash-threshold pre-filter (rn is only needed on survivors)."""
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        T(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 20)
    )


@query(
    "ns_incremental_dedup",
    oracle="""
    WITH batch AS (
      SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 7 = 0
    ),
    corpus AS (
      SELECT md5(text) AS fp FROM documents WHERE doc_id % 7 <> 0
    )
    SELECT doc_id, fp FROM batch
    WHERE fp NOT IN (SELECT fp FROM corpus)
    """,
    tags=("northstar", "dedup", "incremental"),
)
def ns_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: a new batch (every 7th doc, standing
    in for today's crawl) is admitted only where its content fingerprint
    is absent from the existing corpus — a LEFT ANTI join on
    md5(content).  At 100 TB the corpus side is a compact fingerprint
    table (32 B/doc), read fresh per batch; the anti join shuffles on
    the hash, never the text."""
    docs = T(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.md5("text").alias("fp")
    )
    corpus = docs.filter(F.col("doc_id") % 7 != 0).select(
        F.md5("text").alias("cfp")
    )
    return batch.join(
        corpus, F.col("fp") == F.col("cfp"), "left_anti"
    ).select("doc_id", "fp")


@query(
    "ns_contamination_check",
    oracle="""
    WITH f0 AS (
      SELECT doc_id, source,
             md5(array_to_string(string_split(trim(text), ' ')[1:5], ' ')) AS fp
      FROM documents
    ),
    f AS (
      SELECT doc_id, source, fp,
             count(*) OVER (PARTITION BY fp) AS nfp
      FROM f0
    )
    SELECT a.doc_id AS eval_doc, b.doc_id AS train_doc,
           a.source AS eval_source, b.source AS train_source
    FROM f a
    JOIN f b ON a.fp = b.fp AND a.source <> b.source
            AND a.doc_id < b.doc_id
    WHERE a.nfp <= 1000
    """,
    tags=("northstar", "dedup", "contamination"),
)
def ns_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination scan: documents in DIFFERENT sources
    sharing a 5-token-prefix fingerprint — the overlap check run before
    any benchmark split is trusted.  Fingerprints equi-join (32 B
    keys); fingerprints shared by >1000 docs (degenerate boilerplate
    prefixes) are excluded BY CONTRACT — on both engines — so one hot
    key can't go quadratic at scale.  At 100 TB extend the key to
    winnowed fingerprints (ns_winnow_fingerprints) for within-document
    overlap, same join shape."""
    from pyspark.sql import Window as W

    docs = T(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.slice(F.split(F.trim("text"), " "), 1, 5)))
    f = (
        docs.select("doc_id", "source", fp.alias("fp"))
        .withColumn("nfp", F.count(F.lit(1)).over(W.partitionBy("fp")))
        .filter(F.col("nfp") <= 1000)
        .drop("nfp")
    )
    a = f.alias("a")
    b = f.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") != F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("eval_doc"),
            F.col("b.doc_id").alias("train_doc"),
            F.col("a.source").alias("eval_source"),
            F.col("b.source").alias("train_source"),
        )
    )


@query(
    "mm_resize_stub",
    oracle="""
    SELECT doc_id,
           'image/fake' AS media_type,
           sha256(text || '224x224') AS payload_hex,
           CAST(224 AS INT) AS width,
           CAST(224 AS INT) AS height
    FROM documents
    """,
    tags=("northstar", "multimodal"),
)
def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-in → binary-out resize stage (mapInPandas): payload
    transformed per row to 224×224, schema preserved for chaining —
    the thumbnailer shape with a deterministic stub kernel.  The stub
    re-keys the payload as sha256(payload + 'WxH'), so projecting the
    output payload to hex makes the stage digest-verifiable in SQL
    (operator itself stays binary-in → binary-out)."""
    out = M.resize_media(M.attach_payload(T(spark, sf_dir, "documents")))
    return out.select(
        "doc_id",
        "media_type",
        F.lower(F.hex("payload")).alias("payload_hex"),
        "width",
        "height",
    )


@query(
    "mm_frame_sample",
    oracle="""
    WITH d AS (
      SELECT doc_id, text,
             1 + CAST('0x' || substr(sha256(text), 5, 2) AS INT) % 4 AS n_frames
      FROM documents
    )
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           sha256(text || chr(CAST(i AS INT))) AS frame_hex
    FROM d, UNNEST(range(0, n_frames, 2)) AS r(i)
    """,
    tags=("northstar", "multimodal"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (every 2nd frame): each payload expands to one
    row per kept frame inside its task — the UDTF shape of video
    processing, output cardinality > input, no shuffle.  Frame count
    and per-frame digest both derive from portable sha256, so the
    whole expansion (count, kept indices, frame payloads) is
    hash-verified against the SQL re-derivation."""
    out = M.sample_frames(
        M.attach_payload(T(spark, sf_dir, "documents")), every_n=2
    )
    return out.select(
        "doc_id", "frame_idx", F.lower(F.hex("frame")).alias("frame_hex")
    )


@query(
    "ns_bm25_index",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t.token
      FROM documents, UNNEST(string_split(trim(text), ' ')) AS t(token)
    ),
    tf AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, token
    ),
    len AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(CAST(sum(CAST(dl AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_dl
      FROM len
    ),
    dft AS (SELECT token, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY token)
    SELECT tf.token, tf.doc_id, tf.tf, l.dl, d.df_t, s.n_docs, s.avg_dl
    FROM tf
    JOIN len l ON l.doc_id = tf.doc_id
    JOIN dft d ON d.token = tf.token
    CROSS JOIN stats s
    """,
    tags=("northstar", "text", "retrieval", "index"),
)
def ns_bm25_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'build once, probe many' half of BM25 retrieval: a
    denormalized postings index — one row per (token, doc) carrying
    tf, doc length, token document frequency, corpus size and average
    doc length.  At 100 TB this is materialized bucketed by token;
    every subsequent query set is ONE token equi-join (bm25_probe),
    no corpus statistics recomputed.  Equivalence of probe-over-index
    with the single-shot ns_bm25_topk is asserted in
    tests/test_northstar.py."""
    return X.bm25_index(T(spark, sf_dir, "documents"))


@query(
    "ns_bm25_topk",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t.token
      FROM documents, UNNEST(string_split(trim(text), ' ')) AS t(token)
    ),
    tf AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, token
    ),
    len AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(CAST(sum(CAST(dl AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_dl
      FROM len
    ),
    dft AS (SELECT token, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY token),
    q AS (SELECT DISTINCT doc_id AS q_id, token FROM tok WHERE doc_id < 5),
    terms AS (
      SELECT q.q_id, tf.doc_id,
             CAST(round(
               ln(1.0 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avg_dl)), 6)
             AS DECIMAL(18,6)) AS term
      FROM q
      JOIN tf ON tf.token = q.token AND tf.doc_id <> q.q_id
      JOIN dft d ON d.token = q.token
      JOIN len l ON l.doc_id = tf.doc_id
      CROSS JOIN stats s
    ),
    agg AS (
      SELECT q_id, doc_id, CAST(sum(term) AS DOUBLE) AS bm25
      FROM terms GROUP BY q_id, doc_id
    ),
    ranked AS (
      SELECT q_id, doc_id, bm25,
             CAST(row_number() OVER (
               PARTITION BY q_id ORDER BY bm25 DESC, doc_id
             ) AS INT) AS rn
      FROM agg
    )
    SELECT q_id, doc_id, bm25, rn FROM ranked WHERE rn <= 3
    """,
    tags=("northstar", "text", "retrieval"),
)
def ns_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) top-3 lexical retrieval for the
    first five documents as queries — the sparse counterpart of
    ns_cosine_topk (hybrid search = rank-fuse the two).  Query tokens
    broadcast onto the sharded postings; per-token score terms round
    to 6 dp before an exact decimal sum so ranking is order-free."""
    return X.bm25_topk(
        T(spark, sf_dir, "documents"), F.col("doc_id") < 5, k=3
    )


@query(
    "ns_hybrid_rrf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t.token
      FROM documents, UNNEST(string_split(trim(text), ' ')) AS t(token)
    ),
    tf AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, token
    ),
    len AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(CAST(sum(CAST(dl AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_dl
      FROM len
    ),
    dft AS (SELECT token, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY token),
    q AS (SELECT DISTINCT doc_id AS q_id, token FROM tok WHERE doc_id < 5),
    terms AS (
      SELECT q.q_id, tf.doc_id,
             CAST(round(
               ln(1.0 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avg_dl)), 6)
             AS DECIMAL(18,6)) AS term
      FROM q
      JOIN tf ON tf.token = q.token AND tf.doc_id <> q.q_id
      JOIN dft d ON d.token = q.token
      JOIN len l ON l.doc_id = tf.doc_id
      CROSS JOIN stats s
    ),
    bm25r AS (
      SELECT q_id, doc_id, CAST(row_number() OVER (
               PARTITION BY q_id
               ORDER BY CAST(sum(term) AS DOUBLE) DESC, doc_id
             ) AS INT) AS rn
      FROM terms GROUP BY q_id, doc_id
      QUALIFY rn <= 10
    ),
    v AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ),
    qv AS (SELECT * FROM v WHERE vec_id < 5),
    sims AS (
      SELECT qv.vec_id AS q_id, c.vec_id AS doc_id,
             list_sum(list_transform(list_zip(qv.embedding, c.embedding),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (qv.nrm * c.nrm) AS cosine
      FROM qv JOIN v c ON qv.vec_id <> c.vec_id
    ),
    cosr AS (
      SELECT q_id, doc_id, CAST(row_number() OVER (
               PARTITION BY q_id ORDER BY cosine DESC, doc_id
             ) AS INT) AS rn
      FROM sims
      QUALIFY rn <= 10
    ),
    fused AS (
      SELECT coalesce(b.q_id, c.q_id) AS q_id,
             coalesce(b.doc_id, c.doc_id) AS doc_id,
             coalesce(1.0 / (60 + b.rn), 0.0)
               + coalesce(1.0 / (60 + c.rn), 0.0) AS rrf
      FROM bm25r b
      FULL OUTER JOIN cosr c ON b.q_id = c.q_id AND b.doc_id = c.doc_id
    )
    SELECT q_id, doc_id, rrf,
           CAST(rn AS INT) AS rn
    FROM (
      SELECT q_id, doc_id, rrf,
             row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS rn
      FROM fused
    )
    WHERE rn <= 5
    """,
    tags=("northstar", "retrieval", "hybrid"),
)
def ns_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: reciprocal-rank fusion (1/(60+rank)) of BM25
    lexical top-10 and exact-cosine dense top-10 over the SAME corpus
    (doc_id ≡ vec_id in the testdata), fused top-5 per query — the
    standard RAG retrieval stack as one DataFrame plan.  Each source
    ranking is deterministic; the fused score adds at most two doubles
    (commutative), so fusion order can't shift results."""
    docs = T(spark, sf_dir, "documents")
    emb = T(spark, sf_dir, "embeddings")
    bm25 = X.bm25_topk(docs, F.col("doc_id") < 5, k=10).select(
        "q_id", F.col("doc_id").alias("b_doc"), F.col("rn").alias("b_rn")
    )
    cos = S.cosine_topk(emb, F.col("vec_id") < 5, k=10).select(
        F.col("query_id").alias("c_qid"),
        F.col("nn_id").alias("c_doc"),
        F.col("rn").alias("c_rn"),
    )
    fused = (
        bm25.join(
            cos,
            (F.col("q_id") == F.col("c_qid")) & (F.col("b_doc") == F.col("c_doc")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("q_id"), F.col("c_qid")).alias("q_id"),
            F.coalesce(F.col("b_doc"), F.col("c_doc")).alias("doc_id"),
            (
                F.coalesce(1.0 / (60 + F.col("b_rn")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("c_rn")), F.lit(0.0))
            ).alias("rrf"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("q_id").orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return fused.withColumn("rn", F.row_number().over(w).cast("int")).filter(
        F.col("rn") <= 5
    )


@query(
    "ns_corpus_curation",
    oracle="""
    WITH feat AS (
      SELECT doc_id, lang, source, text,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(trim(text), ' '))) AS DOUBLE)
               / CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS distinct_ratio
      FROM documents
    ),
    filtered AS (
      SELECT * FROM feat
      WHERE n_tokens >= 30 AND distinct_ratio >= 0.3 AND lang <> 'zh'
    ),
    deduped AS (
      SELECT min(doc_id) AS doc_id, md5(text) AS fp,
             min(lang) AS lang, min(source) AS source,
             min(n_tokens) AS n_tokens
      FROM filtered GROUP BY md5(text)
    ),
    sampled AS (
      SELECT doc_id, lang, source, n_tokens
      FROM deduped
      WHERE doc_id % 10 < 8
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS token_budget
    FROM sampled
    GROUP BY lang
    """,
    tags=("northstar", "curation", "pipeline"),
)
def ns_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation chain a training-data pipeline runs
    before tokenization: quality gate (length + lexical diversity) →
    language filter → exact dedup (min-id keeper on md5) → 80%
    deterministic hash sample → per-language token budget.  One linear
    DataFrame plan: the only shuffles are the dedup groupBy on the
    32 B fingerprint and the final tiny per-lang aggregate.

    NOTE: the 80% sample is an id-mod split (doc_id % 10 < 8), not a
    hash split — Spark's murmur3 hash() and DuckDB's hash() disagree,
    so a hash-based sample can never oracle-match.  In production use
    xxhash64 on both sides of the pipeline instead (ids here are
    already uniform)."""
    w = F.split(F.trim(F.col("text")), " ")
    feat = T(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size(w).cast("long").alias("n_tokens"),
        (
            F.size(F.array_distinct(w)).cast("double")
            / F.size(w).cast("double")
        ).alias("distinct_ratio"),
    )
    filtered = feat.filter(
        (F.col("n_tokens") >= 30)
        & (F.col("distinct_ratio") >= 0.3)
        & (F.col("lang") != "zh")
    )
    deduped = filtered.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("doc_id"),
        F.min("lang").alias("lang"),
        F.min("source").alias("source"),
        F.min("n_tokens").alias("n_tokens"),
    )
    sampled = deduped.filter(F.pmod(F.col("doc_id"), F.lit(10)) < 8)
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("token_budget"),
    )


@query(
    "ns_token_budget_pack",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS k
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (
               ORDER BY k, doc_id ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS running_tokens
      FROM t
    )
    SELECT doc_id, n_tokens, running_tokens,
           CAST((running_tokens - 1) // 4096 AS BIGINT) AS batch_id
    FROM c
    """,
    tags=("northstar", "sampling", "packing"),
)
def ns_token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard packing: documents fill 4096-token batches in
    deterministic md5-of-id order; each doc belongs to the batch of its
    last token.  The Spark side computes the global running total as a
    DISTRIBUTED prefix sum (range-partition → per-partition cumsum →
    broadcast tiny per-partition offsets) — the oracle's global-window
    spelling would serialize 100 TB through one task; the decomposition
    yields identical integers at any partition count."""
    return X.token_budget_pack(T(spark, sf_dir, "documents"), budget=4096)


_PACK_ASSIGN_SQL = """
    WITH RECURSIVE t AS (
      SELECT doc_id,
             LEAST(CAST(len(string_split(trim(text), ' ')) AS BIGINT),
                   256) AS len,
             md5(CAST(doc_id AS VARCHAR)) AS k
      FROM documents
      WHERE CAST(len(string_split(trim(text), ' ')) AS BIGINT) >= 1
    ),
    r AS (
      SELECT doc_id, len,
             CAST(row_number() OVER (ORDER BY len DESC, k, doc_id)
                  AS BIGINT) AS grk
      FROM t
    ),
    h AS (SELECT len, CAST(count(*) AS BIGINT) AS m FROM t GROUP BY len),
    s AS (
      SELECT len, m,
             256 // len AS kcap,
             m // (256 // len) AS n_full,
             m % (256 // len) AS part_cnt,
             COALESCE(SUM(m) OVER (ORDER BY len DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off,
             COALESCE(SUM(m // (256 // len)) OVER (ORDER BY len DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS full_off,
             SUM(m // (256 // len)) OVER () AS total_full
      FROM h
    ),
    p AS (
      SELECT len, part_cnt * len AS sz,
             CAST(row_number() OVER (ORDER BY part_cnt * len DESC, len)
                  AS BIGINT) AS i
      FROM s WHERE part_cnt > 0
    ),
    nf AS (
      SELECT CAST(0 AS BIGINT) AS i, CAST(-1 AS BIGINT) AS widx,
             CAST(0 AS BIGINT) AS rem
      UNION ALL
      SELECT p.i,
             CASE WHEN p.sz <= nf.rem THEN nf.widx ELSE nf.widx + 1 END,
             CASE WHEN p.sz <= nf.rem THEN nf.rem - p.sz
                  ELSE 256 - p.sz END
      FROM nf JOIN p ON p.i = nf.i + 1
    ),
    pw AS (SELECT p.len, nf.widx FROM p JOIN nf ON nf.i = p.i),
    asg AS (
      SELECT r.doc_id, r.len,
             CAST(r.grk - s.off AS BIGINT) AS len_rank,
             CAST(CASE WHEN r.grk - s.off <= s.n_full * s.kcap
                       THEN s.full_off + (r.grk - s.off - 1) // s.kcap
                       ELSE s.total_full + pw.widx
                  END AS BIGINT) AS window_id
      FROM r JOIN s USING (len) LEFT JOIN pw USING (len)
    )
"""


@query(
    "ns_pack_fixed_windows",
    oracle=_PACK_ASSIGN_SQL
    + """
    SELECT doc_id, len, len_rank, window_id FROM asg
    """,
    tags=("northstar", "sampling", "packing"),
)
def ns_pack_fixed_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-context sequence packing (256-token windows): docs may not
    straddle windows, so this is bin packing — homogeneous per-length
    bulk fill by distributed rank arithmetic, then a next-fit-
    decreasing combine of the ≤context partial groups (driver-side,
    O(context)).  The assignment is a pure function of the length
    multiset, hence exactly reproducible in SQL (the oracle's
    recursive CTE replays the next-fit pass).  Scale shape: one range
    exchange + one ≤256-row histogram + one broadcast join — no
    per-length window (billions of docs share a length at 100 TB)."""
    return X.pack_fixed_windows(T(spark, sf_dir, "documents"), context=256)


@query(
    "ns_pack_fixed_report",
    oracle=_PACK_ASSIGN_SQL
    + """
    , w AS (
      SELECT window_id, CAST(SUM(len) AS BIGINT) AS fill,
             CAST(count(*) AS BIGINT) AS nd
      FROM asg GROUP BY window_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_windows,
           CAST(SUM(nd) AS BIGINT) AS n_docs,
           CAST(SUM(fill) AS BIGINT) AS total_tokens,
           CAST((SUM(fill) + 255) // 256 AS BIGINT) AS lower_bound,
           CAST(count(*) * 256 - SUM(fill) AS BIGINT) AS pad_tokens,
           round(CAST(count(*) * 256 - SUM(fill) AS DOUBLE)
                 / CAST(count(*) * 256 AS DOUBLE), 6) AS waste_frac,
           CAST(max(fill) AS BIGINT) AS max_fill,
           CAST(min(fill) AS BIGINT) AS min_fill
    FROM w
    """,
    tags=("northstar", "sampling", "packing"),
)
def ns_pack_fixed_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pad-waste / fragmentation audit of the fixed-window packing:
    window count vs the ceil(total/context) lower bound, pad tokens,
    waste fraction (one IEEE division of exact longs, rounded 6 dp in
    both engines), fill extremes.  The gate a pipeline checks before
    shipping packed shards to a trainer."""
    return X.pack_fixed_report(T(spark, sf_dir, "documents"), context=256)


@query(
    "ns_weighted_sample",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars,
             (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                   AS BIGINT) + 1) / 16777216.0 AS u
      FROM documents
    )
    SELECT doc_id, n_chars,
           round(ln(u) / n_chars, 9) + 0.0 AS sample_key
    FROM t
    ORDER BY sample_key DESC, doc_id
    LIMIT 50
    """,
    tags=("northstar", "sampling"),
)
def ns_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each doc draws u from its md5 (pure
    function of the row — reproducible across runs, partitions, AND
    engines), and the top-k by ln(u)/weight is an exact weighted
    sample (weight = n_chars: longer docs proportionally likelier).
    Top-k plans as TakeOrderedAndProject — per-partition heaps, no
    global sort, no shuffle of losers; the standard one-pass weighted
    reservoir at any scale.  ln rounds to 9 dp in both engines (ULP
    discipline, see tfidf)."""
    docs = T(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long")
        + 1
    ) / F.lit(16777216.0)
    # + 0.0 normalizes IEEE signed zero: u = 1.0 gives ln(u) = 0 and
    # the engines disagree on the SIGN of the rounded zero (sf1 soak:
    # one -0.0 vs +0.0 hash miss); adding +0.0 maps -0.0 to +0.0 in
    # both and is the identity on every other double
    key = F.round(F.log(u) / F.col("n_chars"), 9) + F.lit(0.0)
    return (
        docs.select("doc_id", "n_chars", key.alias("sample_key"))
        .orderBy(F.col("sample_key").desc(), "doc_id")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Recall gates: put the approximate family's quality bar INSIDE the
# driver's correctness gate.  Each gate computes recall of the
# approximate operator against its exact counterpart in one plan and
# emits (n_exact BIGINT, recall_ok BOOLEAN); the oracle pins n_exact
# from the data and asserts recall_ok literally — the within-tolerance
# pattern already used for approx sketches (see registry notes).
# --------------------------------------------------------------------------


def _recall_gate(exact: DataFrame, approx: DataFrame, floor: float) -> DataFrame:
    """(n_exact, recall_ok): fraction of exact rows present in approx
    ≥ floor.  Both inputs keyed (query_id, nn_id)."""
    # distinct() enforces the one-row-per-(query,nn) invariant: a
    # duplicate-emitting approx operator would otherwise fan out the
    # left join and inflate both n_exact and the hit sum.
    hit = approx.select("query_id", "nn_id").distinct().withColumn("_hit", F.lit(1))
    j = exact.select("query_id", "nn_id").join(hit, ["query_id", "nn_id"], "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_exact"),
        (
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            / F.count(F.lit(1))
            >= F.lit(floor)
        ).alias("recall_ok"),
    )


# The six standalone recall gates (ns_ann_recall_gate,
# ns_ivf_recall_gate, ns_knn_recall_gate, ns_minhash_recall_gate,
# ns_embdedup_recall_gate, ns_simhash_recall_gate) were FOLDED into
# their emitters in round 5 (VERDICT r4 item 1): ns_ann_lsh_topk,
# ns_ann_ivf_topk, ns_knn_join, ns_minhash_lsh_pairs,
# ns_embedding_dedup and ns_simhash_pairs are now self-checking
# oracled queries carrying the same quality bars, so every registry
# entry has a DuckDB oracle and the driver reports zero rows-only
# checks.


@query(
    "mm_fake_embed",
    oracle="""
    SELECT doc_id,
           CAST(CAST('0x' || substr(md5(text), 1, 2) AS INT) AS DOUBLE)/255.0 AS e0,
           CAST(CAST('0x' || substr(md5(text), 3, 2) AS INT) AS DOUBLE)/255.0 AS e1,
           CAST(CAST('0x' || substr(md5(text), 5, 2) AS INT) AS DOUBLE)/255.0 AS e2,
           CAST(CAST('0x' || substr(md5(text), 7, 2) AS INT) AS DOUBLE)/255.0 AS e3,
           CAST(CAST('0x' || substr(md5(text), 9, 2) AS INT) AS DOUBLE)/255.0 AS e4,
           CAST(CAST('0x' || substr(md5(text), 11, 2) AS INT) AS DOUBLE)/255.0 AS e5,
           CAST(CAST('0x' || substr(md5(text), 13, 2) AS INT) AS DOUBLE)/255.0 AS e6,
           CAST(CAST('0x' || substr(md5(text), 15, 2) AS INT) AS DOUBLE)/255.0 AS e7
    FROM documents
    """,
    tags=("northstar", "multimodal"),
)
def mm_fake_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature-extraction stage with a FULL oracle: binary
    payload → Arrow mapInPandas kernel → 8 feature scalars.  The
    kernel is the deterministic stand-in for a real encoder (the
    container has no media libs): md5 bytes of the payload scaled to
    [0,1].  Because the digest is engine-portable, this mm stage is
    hash-verified end-to-end — payload plumbing, Arrow batching, UDF
    schema — unlike the NotImplementedError-guarded codec stubs.
    Exact parity: integer-numerator /255.0 divisions are bit-identical
    IEEE in Python and DuckDB."""
    import pandas as pd

    src = M.attach_payload(T(spark, sf_dir, "documents")).select(
        "doc_id", "payload"
    )

    def embed(batches):
        import hashlib

        for pdf in batches:
            digests = [hashlib.md5(p).hexdigest() for p in pdf["payload"]]
            out = {"doc_id": pdf["doc_id"]}
            for j in range(8):
                out[f"e{j}"] = [
                    int(d[2 * j : 2 * j + 2], 16) / 255.0 for d in digests
                ]
            yield pd.DataFrame(out)

    schema = "doc_id long, " + ", ".join(f"e{j} double" for j in range(8))
    return src.mapInPandas(embed, schema=schema)


# --------------------------------------------------------------------------
# int8 quantization family: the 4x-memory ANN path (operators/
# similarity.py).  Integer codes and integer dot products make these
# queries EXACTLY portable — no float-ordering hazard anywhere.
# --------------------------------------------------------------------------


@query(
    "ns_embedding_quantize",
    oracle="""
    WITH x AS (
      SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    s AS (SELECT pos, max(abs(v)) AS amax FROM x GROUP BY pos)
    SELECT vec_id, x.pos AS pos,
           CASE WHEN amax = 0 THEN 0
                ELSE CAST(floor(v / amax * 127.0 + 0.5) AS INT) END AS code
    FROM x JOIN s ON s.pos = x.pos
    """,
    tags=("northstar", "similarity", "quantize"),
)
def ns_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension absmax int8 quantization (LLM.int8()-style
    calibration).  The 64 per-dim scales are a one-row in-plan global
    aggregate broadcast back onto the corpus — no driver action, so
    the calibration pass runs at any corpus size."""
    return S.quantize_absmax(T(spark, sf_dir, "embeddings"))


@query(
    "ns_quantized_cosine_topk",
    oracle="""
    WITH c AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(floor(
                 CAST(x AS DOUBLE)
                 / sqrt(list_sum(list_transform(embedding,
                       y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))
                 * 127.0 + 0.5) AS INT)) AS codes
      FROM embeddings
    ),
    q AS (SELECT * FROM c WHERE vec_id < 10),
    sims AS (
      SELECT q.vec_id AS query_id, t.vec_id AS nn_id,
             CAST(list_sum(list_transform(list_zip(q.codes, t.codes),
                  p -> CAST(p[1] AS BIGINT) * CAST(p[2] AS BIGINT)))
             AS BIGINT) AS dot_q
      FROM q JOIN c t ON q.vec_id <> t.vec_id
    ),
    ranked AS (
      SELECT query_id, nn_id, dot_q,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY dot_q DESC, nn_id) AS INT) AS rn
      FROM sims
    )
    SELECT query_id, nn_id, dot_q, rn FROM ranked WHERE rn <= 5
    """,
    tags=("northstar", "similarity", "quantize"),
)
def ns_quantized_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 neighbors by int8-quantized dot product (unit-norm codes,
    scale 127): the memory-bound re-ranking arithmetic — 64 integer
    multiplies into a BIGINT, no float comparisons in the ranking."""
    return S.quantized_topk(
        T(spark, sf_dir, "embeddings"), F.col("vec_id") < 10, k=5
    )


@query(
    "ns_quant_recall_gate",
    oracle="""
    SELECT CAST(5 * count(*) AS BIGINT) AS n_exact, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 10
    """,
    tags=("northstar", "similarity", "quantize"),
)
def ns_quant_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8-quantized top-5 recall vs float brute-force cosine ≥ 0.8,
    asserted inside the driver gate: pins the quantization error story
    (unit-norm int8 keeps ranking quality) with a hard number."""
    emb = T(spark, sf_dir, "embeddings")
    exact = S.cosine_topk(emb, F.col("vec_id") < 10, k=5)
    approx = S.quantized_topk(emb, F.col("vec_id") < 10, k=5).select(
        "query_id", "nn_id"
    )
    return _recall_gate(exact, approx, 0.8)


# --------------------------------------------------------------------------
# Distributed k-means + SemDeDup (operators/similarity.py).  The
# assignment query is bit-exact against a fully unrolled DuckDB Lloyd
# iteration (decimal-exact centroid sums make the iteration order-free
# on both engines); the dedup quality is pinned by a planted-pair gate.
# --------------------------------------------------------------------------


@query(
    "ns_kmeans_assign",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    seeds AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster, e
      FROM (SELECT * FROM v ORDER BY vec_id LIMIT 8)
    ),
    d0 AS (
      SELECT v.vec_id, s.cluster,
             list_sum(list_transform(list_zip(v.e, s.e),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
      FROM v CROSS JOIN seeds s
    ),
    a0 AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id
                    ORDER BY dist, cluster) AS rn
        FROM d0) WHERE rn = 1
    ),
    m AS (
      SELECT a0.cluster,
             CAST(generate_subscripts(v.e, 1) - 1 AS INT) AS pos,
             unnest(v.e) AS val
      FROM a0 JOIN v USING (vec_id)
    ),
    c1 AS (
      SELECT cluster, pos,
             CAST(CAST(sum(CAST(val AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / count(*) AS mean
      FROM m GROUP BY cluster, pos
    ),
    cent1 AS (
      SELECT cluster, list(mean ORDER BY pos) AS e FROM c1 GROUP BY cluster
    ),
    d1 AS (
      SELECT v.vec_id, c.cluster,
             list_sum(list_transform(list_zip(v.e, c.e),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
      FROM v CROSS JOIN cent1 c
    )
    SELECT vec_id, CAST(cluster AS INT) AS cluster FROM (
      SELECT vec_id, cluster,
             row_number() OVER (PARTITION BY vec_id
                  ORDER BY dist, cluster) AS rn
      FROM d1) WHERE rn = 1
    """,
    tags=("northstar", "similarity", "cluster"),
)
def ns_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully-distributed Lloyd k-means (k=8, one update round),
    bit-exact vs an unrolled-CTE oracle: broadcast-assign + one
    (cluster, pos) shuffle per round, decimal-exact centroid sums so
    the iteration is reproducible on any partitioning.  Complements
    train_ivf_centroids (driver-sample path) for corpora whose
    training set can't sit on the driver."""
    return S.kmeans_assign(T(spark, sf_dir, "embeddings"), k=8, n_iter=1)


@query(
    "ns_semdedup_recall_gate",
    oracle="""
    SELECT CAST(least(50, count(*)) AS BIGINT) AS n_planted,
           TRUE AS recall_ok, TRUE AS purity_ok
    FROM embeddings WHERE vec_id < 50
    """,
    tags=("northstar", "dedup", "similarity", "cluster"),
)
def ns_semdedup_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-pair evaluation of SemDeDup (k-means clusters → within-
    cluster cosine ≥ 0.9) inside the driver gate: every vec_id < 50
    gains a perturbed copy (cosine ≈ 0.99; the corpus's natural pair
    maximum is ~0.51), the cluster step must keep each copy with its
    original (recall ≥ 0.95), and nothing unplanted may cross 0.9
    (purity)."""
    off = 10_000_000
    base = T(spark, sf_dir, "embeddings")
    perturbed = F.transform(
        F.col("embedding"),
        lambda x, i: x + 0.02 * F.sin(F.col("vec_id") + i.cast("double")),
    ).cast("array<float>")
    planted = base.where(F.col("vec_id") < 50).select(
        (F.col("vec_id") + off).alias("vec_id"),
        perturbed.alias("embedding"),
        F.col("label"),
    )
    aug = base.unionByName(planted)
    # k sized to the corpus (~250 vectors/cluster): SemDeDup's cost is
    # within-cluster Σn_c², so a FIXED k makes the per-cluster n_c —
    # and the pair volume — grow linearly with the corpus (the r5 sf1
    # soak measured 394 s at 20k vectors with k=8; adaptive k returns
    # the query to the n·c regime).  k=8 preserved at driver scale.
    import math

    k = max(8, math.ceil(base.count() / 250))
    pairs = S.semantic_dedup_pairs(aug, k=k, n_iter=1, threshold=0.9)
    expect = base.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("id_a"), (F.col("vec_id") + off).alias("id_b")
    )
    hit = pairs.select("id_a", "id_b").distinct().withColumn("_hit", F.lit(1))
    j = expect.join(hit, ["id_a", "id_b"], "left")
    n_found = F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
    recall = j.agg(
        F.count(F.lit(1)).alias("n_planted"),
        (n_found / F.count(F.lit(1)) >= 0.95).alias("recall_ok"),
    )
    extras = pairs.join(expect, ["id_a", "id_b"], "left_anti").agg(
        (F.count(F.lit(1)) == 0).alias("purity_ok")
    )
    return recall.join(extras)


@query(
    "ns_embedding_whiten_stats",
    oracle="""
    WITH x AS (
      SELECT CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    s AS (
      SELECT pos, CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(sum(CAST(v AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(sum(CAST(v * v AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sxx
      FROM x GROUP BY pos
    )
    SELECT pos, n, sx / n AS mean, (sxx - sx * sx / n) / n AS var
    FROM s
    """,
    tags=("northstar", "similarity", "stats"),
)
def ns_embedding_whiten_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance of the embedding corpus — the
    statistics a whitening (mean-center + scale) stage broadcasts back
    onto the vectors.  Exact decimal power sums make the one-pass
    variance independent of partition count and merge order (the
    agg_global_stats rule); the output is 64 rows regardless of corpus
    size.  Addends quantize at scale 6: beyond that, the two engines'
    double→decimal casts can round a near-tie differently (Spark goes
    through the shortest-decimal string, DuckDB scales the double) —
    observed once in 320k values at scale 9."""
    emb = T(spark, sf_dir, "embeddings")
    x = emb.select(F.posexplode("embedding").alias("pos", "_f")).select(
        "pos", F.col("_f").cast("double").alias("v")
    )
    s = x.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(28,6)"))
        .cast("double")
        .alias("sxx"),
    )
    return s.select(
        "pos",
        "n",
        (F.col("sx") / F.col("n")).alias("mean"),
        (
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / F.col("n")
        ).alias("var"),
    )


@query(
    "ns_fold_assign",
    oracle="""
    SELECT CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14)
                 AS BIGINT) % 5 AS INT) AS fold,
           lang, CAST(count(*) AS BIGINT) AS n
    FROM documents GROUP BY 1, 2
    """,
    tags=("northstar", "sampling"),
)
def ns_fold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold split assignment (portable 56-bit md5 of
    the doc id, mod k) with per-(fold, lang) counts — the train/eval
    split primitive.  Hash-based folds are stable under re-partitioning
    and re-ingestion (no RNG state), and the count matrix is the
    stratification balance check."""
    docs = T(spark, sf_dir, "documents")
    fold = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 14), 16, 10)
        .cast("bigint")
        % 5
    ).cast("int")
    return (
        docs.select(fold.alias("fold"), "lang")
        .groupBy("fold", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "ns_bpe_pair_counts",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents
    ),
    freq AS (
      SELECT w, CAST(count(*) AS BIGINT) AS f
      FROM words WHERE len(w) >= 2 GROUP BY w
    ),
    pairs AS (
      SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b, f
      FROM freq, UNNEST(range(1, len(w))) AS r(i)
    ),
    counted AS (
      SELECT a, b, CAST(sum(f) AS BIGINT) AS n
      FROM pairs GROUP BY a, b
    )
    SELECT a, b, n,
           CAST(row_number() OVER (ORDER BY n DESC, a, b) AS INT) AS rk
    FROM counted
    ORDER BY rk LIMIT 20
    """,
    tags=("northstar", "text", "tokenizer"),
)
def ns_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE-training counting step: adjacent character-pair
    frequencies weighted by word frequency, ranked with the
    deterministic (count desc, pair lexicographic) merge-selection
    order — top-20.  This is the per-round kernel of byte-pair
    tokenizer training; the full trainer is a driver loop of exactly
    this count plus a broadcast pair-rewrite, so the distributed cost
    profile is this query × n_merges.  Corpus collapses to the
    DISTINCT-word frequency table before any character work (the
    standard BPE trick — pair counts ride word frequencies, not raw
    token volume)."""
    docs = T(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("w")
    )
    freq = (
        words.where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    pairs = freq.select(
        F.posexplode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("_i", "pr"),
        "f",
    ).select(
        F.substring("pr", 1, 1).alias("a"),
        F.substring("pr", 2, 1).alias("b"),
        "f",
    )
    counted = pairs.groupBy("a", "b").agg(F.sum("f").alias("n"))
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("n").desc(), "a", "b")
    return (
        counted.select(
            "a", "b", "n", F.row_number().over(w).cast("int").alias("rk")
        )
        .where(F.col("rk") <= 20)
    )


@query(
    "ns_bpe_train_merges",
    oracle="""
    WITH w AS (
      SELECT wd AS w, CAST(count(*) AS BIGINT) AS f
      FROM (SELECT unnest(string_split(trim(text), ' ')) AS wd FROM documents)
      WHERE length(wd) >= 2 GROUP BY wd
    ),
    p AS (
      SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b,
             CAST(sum(f) AS BIGINT) AS n
      FROM w, UNNEST(range(1, length(w))) AS r(i)
      GROUP BY 1, 2
    )
    SELECT a AS a1, b AS b1, n AS n1,
           TRUE AS merges_ok, TRUE AS batched_ok
    FROM p ORDER BY n DESC, a, b LIMIT 1
    """,
    tags=("northstar", "text", "tokenizer"),
)
def ns_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (8 merges, batched rounds)
    as a SELF-CHECKING gate (VERDICT r4 items 1 + 3): the trainer runs
    fully distributed (operators/text.bpe_train — per ROUND one
    weighted pair-count over the distinct-word frequency table plus
    ONE multi-rule greedy rewrite fold applying a provably
    order-equivalent BATCH of merges), then the gate

    * re-derives the full 8-merge table with the sequential
      pure-Python reference over the collected word-frequency dict
      (a GATE-scale collect — the trainer itself never collects the
      vocabulary) and asserts bit-equality → merges_ok,
    * asserts the batching engaged (rounds < merges) → batched_ok,
    * emits the rank-1 merge (a1, b1, n1), which the oracle recomputes
      in SQL from the same corpus — so the distributed counting path
      is hash-checked against DuckDB, and the loop semantics against
      an independent sequential implementation."""
    docs = T(spark, sf_dir, "documents")
    stats: dict = {}
    merges = X.bpe_train(docs, n_merges=8, stats=stats)
    # GATE-scale collect, BOUNDED (VERDICT r8 item 2): the pure-Python
    # reference needs the full distinct-word frequency table, so the
    # collect is capped at a documented constant and fails LOUDLY on a
    # corpus whose vocabulary exceeds it (the same limit(cap+1)+raise
    # posture as pq_topk's query cap) rather than growing with corpus
    # vocabulary.  The trainer itself never collects the vocabulary
    # (one batch_top row-set per round); only this parity check does.
    vocab_cap = 65536
    freq_rows = (
        docs.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("w"))
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .limit(vocab_cap + 1)
        .collect()
    )
    if len(freq_rows) > vocab_cap:
        raise ValueError(
            f"ns_bpe_train_merges parity gate: corpus vocabulary exceeds "
            f"the documented driver-collect cap ({vocab_cap}); run the "
            f"gate on a sampled slice instead"
        )
    ref = X.bpe_train_reference({r["w"]: int(r["f"]) for r in freq_rows}, 8)
    merges_ok = merges == ref
    batched_ok = stats["rounds"] < len(merges)
    _, a1, b1, n1 = merges[0]
    return spark.createDataFrame(
        [(a1, b1, int(n1), bool(merges_ok), bool(batched_ok))],
        "a1 string, b1 string, n1 long, merges_ok boolean, batched_ok boolean",
    )


@query(
    "mm_phash_recall_gate",
    oracle="""
    SELECT CAST(least(50, count(*)) AS BIGINT) AS n_planted,
           TRUE AS recall_ok
    FROM documents WHERE doc_id < 50
    """,
    tags=("northstar", "multimodal", "dedup"),
)
def mm_phash_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary near-dup dedup through the multimodal path, gated on
    planted pairs: every doc_id < 50 gains a copy whose PAYLOAD
    differs by a 5-byte suffix (measured phash Hamming: median 1,
    p95 4, max 9 on this corpus), and the byte-bigram SimHash +
    pigeonhole Hamming join (d ≤ 10) must recover ≥ 95% of the planted
    pairs.  Purity is NOT asserted — the corpus contains genuine text
    near-dups whose payloads legitimately collide (min natural pair
    Hamming is 0)."""
    off = 10_000_000
    docs = T(spark, sf_dir, "documents")
    planted = docs.where(F.col("doc_id") < 50).select(
        (F.col("doc_id") + off).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" xqzt")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    aug = docs.unionByName(planted)
    # UNCAPPED: the gate asserts the pigeonhole RECALL guarantee,
    # which the production hot-bucket cap deliberately trades away in
    # degenerate buckets (the r5 sf1 soak showed the cap engaging at a
    # 50k-doc corpus — ~6-bit chunks put ~n/64 docs per bucket, so any
    # corpus eventually crosses it; same contract note as
    # ns_simhash_pairs).  Production callers keep the default cap.
    pairs = M.phash_near_pairs(
        M.attach_payload(aug), max_hamming=10, max_bucket_size=None
    )
    expect = docs.where(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + off).alias("doc_b"),
    )
    hit = pairs.select("doc_a", "doc_b").distinct().withColumn("_hit", F.lit(1))
    j = expect.join(hit, ["doc_a", "doc_b"], "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_planted"),
        (
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))) / F.count(F.lit(1))
            >= 0.95
        ).alias("recall_ok"),
    )


@query(
    "ns_pmi_collocations",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    tok AS (SELECT DISTINCT doc_id, unnest(w) AS tk FROM t),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    c AS (SELECT tk, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY tk),
    p AS (
      SELECT a.tk AS tok_a, b.tk AS tok_b, CAST(count(*) AS BIGINT) AS n_ab
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.tk < b.tk
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT tok_a, tok_b, n_ab,
             round(ln(CAST(n_ab AS DOUBLE) * n.n_docs
                      / CAST(ca.df * cb.df AS DOUBLE)), 6) AS pmi
      FROM p
      JOIN c ca ON ca.tk = tok_a
      JOIN c cb ON cb.tk = tok_b
      CROSS JOIN n
      WHERE n_ab >= 20
    )
    SELECT tok_a, tok_b, n_ab, pmi,
           CAST(row_number() OVER (ORDER BY pmi DESC, tok_a, tok_b) AS INT)
             AS rk
    FROM scored ORDER BY rk LIMIT 20
    """,
    tags=("northstar", "text"),
)
def ns_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PMI collocations (document-level co-occurrence): the
    corpus-analysis primitive behind phrase mining and tokenizer-merge
    diagnostics.  PMI = ln(P(a,b) / P(a)P(b)) over DISTINCT per-doc
    tokens, support-filtered at n_ab ≥ 20.

    Shape: one explode → distinct (doc, token), a doc-keyed self-join
    for pair counts (cost Σ_d t_d², bounded by per-doc token counts —
    at 100 TB cap tokens-per-doc or window the co-occurrence, never
    all-pairs across docs), document frequencies joined back per side.
    ln is quantized to 6 dp in both engines (ULP discipline, tfidf
    precedent); the integer ratio inside is formed identically so the
    rounding sees the same double."""
    docs = T(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tk")
    ).distinct()
    n_docs = docs.count()
    c = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("df"))
    a = tok.select(F.col("doc_id"), F.col("tk").alias("tok_a"))
    b = tok.select(F.col("doc_id"), F.col("tk").alias("tok_b"))
    p = (
        a.join(b, "doc_id")
        .where(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 20)
    )
    scored = (
        p.join(c.select(F.col("tk").alias("tok_a"), F.col("df").alias("_dfa")), "tok_a")
        .join(c.select(F.col("tk").alias("tok_b"), F.col("df").alias("_dfb")), "tok_b")
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            F.round(
                F.log(
                    F.col("n_ab").cast("double")
                    * F.lit(n_docs)
                    / (F.col("_dfa") * F.col("_dfb")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )
    from ..operators.ranking import top_k_ranked

    # distributed top-20 (TakeOrderedAndProject), never a global
    # row_number window over the full collocation relation
    ranked = top_k_ranked(
        scored, [F.col("pmi").desc(), F.col("tok_a"), F.col("tok_b")], 20
    )
    return ranked.withColumn("rk", F.col("rk").cast("int"))


@query(
    "ns_pq_topk",
    oracle="""
    SELECT CAST(5 * count(*) AS BIGINT) AS n_exact, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 10
    """,
    tags=("northstar", "similarity", "quantization"),
)
def ns_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN as a SELF-CHECKING gate: corpus
    encoded to m=8 one-byte codes (32× smaller than float32 — the
    representation that lets a 100 TB embedding corpus's search
    structure fit cluster RAM), queries scored by ADC lookup tables
    over the codes alone, per-query top-50 shortlist re-ranked by
    exact cosine.  Recall of the final top-5 vs brute force must
    reach ≥ 0.8 on the vec_id < 10 probe slice — with re-ranking the
    only loss is shortlist coverage (operators/similarity.pq_topk)."""
    import math

    emb = T(spark, sf_dir, "embeddings")
    # shortlist sized to the corpus (~5% — the measured operating
    # point on this deliberately unclustered synthetic corpus, PQ's
    # worst case: recall 0.92 at 2k vectors (r7 re-measure; the 2.5%
    # fraction shipped in r5 had decayed to 0.78 there — below the
    # gate) and ≥0.96 at 20k.  Real embedding corpora cluster and
    # need far smaller fractions; the principle is the same
    # adaptive-knob rule as LSH bits / SemDeDup k, from one
    # corpus-count scalar.)
    shortlist = max(50, math.ceil(emb.count() / 20))
    exact = S.cosine_topk(emb, F.col("vec_id") < 10, k=5)
    approx = S.pq_topk(
        emb, F.col("vec_id") < 10, k=5, shortlist=shortlist, n_cells=256
    )
    return _recall_gate(exact, approx, 0.8)


def _doc_bigrams(docs: DataFrame, *carry: str) -> DataFrame:
    """(carry..., a, b) — one row per adjacent token pair, built by
    POSITIONAL explode (explode the index sequence, then plain
    ``element_at`` projections) rather than a ``transform()`` lambda:
    Catalyst evaluates higher-order-function lambdas interpreted
    (~µs/element), measured 21× slower than the codegen'd positional
    shape on the k-gram hasher (operators/dedup._positional_grams;
    VERDICT r7 item 3 ported this, the engine's hottest bigram build,
    onto the same shape)."""
    w = F.split(F.trim(F.col("text")), " ")
    return (
        docs.select(*carry, w.alias("_w"))
        .where(F.size("_w") >= 2)
        .select(
            *carry,
            "_w",
            F.explode(F.sequence(F.lit(1), F.size("_w") - 1)).alias("_i"),
        )
        .select(
            *carry,
            F.element_at(F.col("_w"), F.col("_i")).alias("a"),
            F.element_at(F.col("_w"), F.col("_i") + 1).alias("b"),
        )
    )


def _kn_bigram_model(docs: DataFrame):
    """Shared interpolated-KN bigram model relation: (a, b, c12, c1,
    pkn) with pkn already 9dp-quantized.  One corpus bigram-count
    aggregation + two distinct-count aggregations of it."""
    bg = (
        _doc_bigrams(docs)
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    c1 = bg.groupBy("a").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1f")
    )
    rv = bg.groupBy("b").agg(F.count(F.lit(1)).alias("n1r"))
    # r15: N1+(·,·) = Σ_a N1+(a,·) — derive the scalar from c1 instead
    # of re-aggregating bg (one fewer stage reading bg's exchange per
    # model build; exact integer identity, same BIGINT sum)
    tot = c1.agg(F.sum("n1f").alias("n1all"))
    pkn = F.round(
        (
            F.greatest(F.col("c12").cast("double") - 0.75, F.lit(0.0))
            / F.col("c1").cast("double")
        )
        + (
            (0.75 * F.col("n1f").cast("double"))
            / F.col("c1").cast("double")
        )
        * (F.col("n1r").cast("double") / F.col("n1all").cast("double")),
        9,
    )
    return (
        bg.join(c1, "a")
        .join(rv, "b")
        .crossJoin(F.broadcast(tot))
        .select("a", "b", "c12", "c1", pkn.alias("pkn"))
    )


@query(
    "ns_kneser_ney_bigrams",
    oracle="""
    WITH t AS (
      SELECT string_split(trim(text), ' ') AS w FROM documents
    ),
    bg0 AS (
      SELECT w[i] AS a, w[i+1] AS b
      FROM t, UNNEST(range(1, len(w))) AS r(i)
      WHERE len(w) >= 2
    ),
    bg AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c12 FROM bg0 GROUP BY a, b),
    c1 AS (
      SELECT a, CAST(sum(c12) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS n1f
      FROM bg GROUP BY a
    ),
    rv AS (SELECT b, CAST(count(*) AS BIGINT) AS n1r FROM bg GROUP BY b),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n1all FROM bg)
    SELECT bg.a AS w1, bg.b AS w2, c12, c1.c1 AS c1,
           round((greatest(CAST(c12 AS DOUBLE) - 0.75, 0.0)
                  / CAST(c1.c1 AS DOUBLE))
                 + ((0.75 * CAST(c1.n1f AS DOUBLE))
                    / CAST(c1.c1 AS DOUBLE))
                   * (CAST(rv.n1r AS DOUBLE) / CAST(tot.n1all AS DOUBLE)),
                 9) AS pkn,
           CAST(row_number() OVER (ORDER BY c12 DESC, bg.a, bg.b) AS INT)
             AS rk
    FROM bg JOIN c1 ON c1.a = bg.a JOIN rv ON rv.b = bg.b CROSS JOIN tot
    ORDER BY rk LIMIT 50
    """,
    tags=("northstar", "text", "lm"),
)
def ns_kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (top-50 bigrams by
    count): P(w2|w1) = max(c12-d, 0)/c1 + d·N1+(w1,·)/c1 · Pcont(w2),
    Pcont(w2) = N1+(·,w2)/N1+(·,·), d = 0.75 — the classic smoothed
    LM behind perplexity-based corpus quality filtering (a step above
    the unigram logprob scorer, ns_unigram_surprisal).

    Everything derives from ONE corpus bigram-count relation: the
    continuation counts are distinct-count aggregations of it, so the
    whole model is two keyed shuffles over |bigram-vocab| rows however
    big the corpus — the standard LM-training collapse.  Probability
    arithmetic is a fixed expression tree over exact integers,
    9dp-quantized in both engines (ULP discipline)."""
    docs = T(spark, sf_dir, "documents")
    model = _kn_bigram_model(docs)
    from ..operators.ranking import top_k_ranked

    # top-50 via TakeOrderedAndProject + distributed rank of the 50
    # survivors — never a global row_number window over the full
    # bigram vocabulary (billions of rows through one task at 100 TB)
    sel = model.select(
        F.col("a").alias("w1"), F.col("b").alias("w2"), "c12", "c1", "pkn"
    )
    ranked = top_k_ranked(
        sel, [F.col("c12").desc(), F.col("w1"), F.col("w2")], 50
    )
    return ranked.withColumn("rk", F.col("rk").cast("int"))


@query(
    "ns_prefix_filter_join",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    sh0 AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                  ELSE array_to_string(w, ' ') END AS s
      FROM t, UNNEST(range(1, greatest(len(w) - 1, 2))) AS r(i)
    ),
    sh AS (SELECT DISTINCT doc_id, s FROM sh0),
    c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE) AS jaccard
    FROM p
    JOIN c ca ON ca.doc_id = doc_a
    JOIN c cb ON cb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE) >= 0.6
    """,
    tags=("northstar", "dedup", "join"),
)
def ns_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity join (3-gram Jaccard ≥ 0.6) via
    PPJoin-style prefix filtering — no recall loss, no all-pairs scan:
    docs meet only through their |S|-⌈t·|S|⌉+1 globally-RAREST
    shingles, and the prefix principle guarantees every qualifying
    pair collides there (operators/dedup.prefix_filter_jaccard_pairs).
    The ORACLE recomputes the full quadratic shingle join — so this
    query proves the filter's completeness on every driver run, not
    just a recall bound: the bucketed plan must return the exact
    all-pairs answer bit-for-bit."""
    return D.prefix_filter_jaccard_pairs(
        T(spark, sf_dir, "documents"), threshold=0.6
    )


@query(
    "ns_doc_perplexity_kn",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    dbg AS (
      SELECT doc_id, w[i] AS a, w[i+1] AS b
      FROM t, UNNEST(range(1, len(w))) AS r(i)
      WHERE len(w) >= 2
    ),
    bg AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c12
           FROM dbg GROUP BY a, b),
    c1 AS (
      SELECT a, CAST(sum(c12) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS n1f
      FROM bg GROUP BY a
    ),
    rv AS (SELECT b, CAST(count(*) AS BIGINT) AS n1r FROM bg GROUP BY b),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n1all FROM bg),
    model AS (
      SELECT bg.a, bg.b,
             round((greatest(CAST(c12 AS DOUBLE) - 0.75, 0.0)
                    / CAST(c1.c1 AS DOUBLE))
                   + ((0.75 * CAST(c1.n1f AS DOUBLE))
                      / CAST(c1.c1 AS DOUBLE))
                     * (CAST(rv.n1r AS DOUBLE) / CAST(tot.n1all AS DOUBLE)),
                   9) AS pkn
      FROM bg JOIN c1 ON c1.a = bg.a JOIN rv ON rv.b = bg.b CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(CAST(sum(CAST(round(-log2(m.pkn), 6) AS DECIMAL(18,6)))
                AS VARCHAR) AS DOUBLE) / count(*) AS avg_neg_log2_pkn
    FROM dbg JOIN model m ON m.a = dbg.a AND m.b = dbg.b
    GROUP BY doc_id
    """,
    tags=("northstar", "text", "lm", "quality"),
)
def ns_doc_perplexity_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Kneser-Ney bigram surprisal — the LM-quality
    filter loop closed: train the smoothed bigram model on the corpus
    (_kn_bigram_model), score every document's bigrams against it,
    emit mean -log2 P_KN per doc.  High scorers are gibberish /
    outliers, low scorers boilerplate (the bigram-level step above
    ns_unigram_surprisal).

    Shape: the model is vocabulary-bounded; scoring is ONE (a, b)
    equi-join of the per-doc bigram relation against it plus a keyed
    per-doc aggregation.  log2 quantized to 6 dp, the mean an exact
    decimal sum / count (order-free, hash-stable)."""
    return _kn_doc_surprisal(T(spark, sf_dir, "documents"))


def _kn_doc_surprisal(docs: DataFrame) -> DataFrame:
    """Per-doc mean -log2 P_KN against the corpus-trained KN bigram
    model: (doc_id, n_bigrams, avg_neg_log2_pkn).  Shared by
    ns_doc_perplexity_kn and the CCNet-style bucket split."""
    model = _kn_bigram_model(docs).select("a", "b", "pkn")
    dbg = _doc_bigrams(docs, "doc_id")
    s = F.round(-F.log2(F.col("pkn")), 6)
    return (
        dbg.join(model, ["a", "b"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.sum(s.cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_neg_log2_pkn"),
        )
    )


@query(
    "ns_gopher_rules",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w,
             length(trim(text)) AS nc
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             (CAST(nc AS DOUBLE) - (CAST(len(w) AS DOUBLE) - 1))
               / CAST(len(w) AS DOUBLE) AS mean_word_len,
             CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                  AS DOUBLE) / CAST(len(w) AS DOUBLE) AS alpha_frac,
             CAST(len(list_intersect(list_distinct(w),
                  ['the','a','of','and','to'])) AS BIGINT) AS stop_hits
      FROM t
    )
    SELECT doc_id, n_words, mean_word_len, alpha_frac, stop_hits,
           n_words BETWEEN 50 AND 100000 AS r_word_count,
           mean_word_len >= 4.0 AND mean_word_len <= 10.0 AS r_mean_len,
           alpha_frac >= 0.8 AS r_alpha,
           stop_hits >= 2 AS r_stopwords,
           (n_words BETWEEN 50 AND 100000)
             AND mean_word_len >= 4.0 AND mean_word_len <= 10.0
             AND alpha_frac >= 0.8 AND stop_hits >= 2 AS keep
    FROM s
    """,
    tags=("northstar", "text", "quality"),
)
def ns_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style hard quality rule battery (operators/text.
    gopher_rules): per-rule booleans + conjunctive keep, the
    auditable form of heuristic corpus filtering (vs the blended
    score of ns_text_quality).  Single projection pass, no shuffle.

    min_mean_len is raised from the paper's 3.0 to 4.0 here so the
    band rule is NON-vacuous on the synthetic corpus (whose mean
    word lengths span ~3.7-5.3); word-count and stopword rules split
    the corpus at the paper's own thresholds."""
    return X.gopher_rules(
        T(spark, sf_dir, "documents"), min_mean_len=4.0
    )


@query(
    "ns_dsir_weights",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, string_split(trim(text), ' ') AS w
      FROM documents
    ),
    bg AS (
      SELECT doc_id, lang,
             CAST(concat('0x', substr(md5(w[i] || ' ' || w[i+1]), 1, 14))
                  AS BIGINT) % 256 AS bucket
      FROM t, UNNEST(range(1, len(w))) AS r(i)
      WHERE len(w) >= 2
    ),
    ha AS (SELECT bucket, CAST(count(*) AS BIGINT) AS ca
           FROM bg GROUP BY 1),
    ta AS (SELECT CAST(sum(ca) AS BIGINT) AS A FROM ha),
    ht AS (SELECT bucket, CAST(count(*) AS BIGINT) AS ct
           FROM bg WHERE lang = 'en' GROUP BY 1),
    tt AS (SELECT CAST(count(*) AS BIGINT) AS T FROM bg
           WHERE lang = 'en'),
    lr AS (
      SELECT ha.bucket,
             round(ln((COALESCE(ct, 0) + 1) * 1.0 / (T + 256))
                 - ln((ca + 1) * 1.0 / (A + 256)), 6) AS lr
      FROM ha LEFT JOIN ht ON ht.bucket = ha.bucket
      CROSS JOIN ta CROSS JOIN tt
    ),
    pd AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt
           FROM bg GROUP BY 1, 2)
    SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
           CAST(CAST(sum(CAST(cnt AS DECIMAL(18,0))
                         * CAST(lr AS DECIMAL(18,6))) AS VARCHAR)
                AS DOUBLE) AS log_weight
    FROM pd JOIN lr USING (bucket)
    GROUP BY doc_id
    """,
    tags=("northstar", "text", "curation"),
)
def ns_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed-bigram importance weights (operators/text.
    dsir_logweights; Xie et al. 2023): target = the 'en' slice, raw =
    the whole corpus; per-doc log importance weight = Σ bucket-count ·
    6dp-quantized log-ratio, summed as exact decimal.  Histograms are
    ≤256-row relations (broadcast); the per-doc pass is two keyed
    shuffles on (doc, bucket) and (doc) — linear at any corpus
    size."""
    docs = T(spark, sf_dir, "documents")
    return X.dsir_logweights(
        docs, docs.where(F.col("lang") == "en"), buckets=256
    )


@query(
    "ns_ccnet_ppl_buckets",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    dbg AS (
      SELECT doc_id, w[i] AS a, w[i+1] AS b
      FROM t, UNNEST(range(1, len(w))) AS r(i)
      WHERE len(w) >= 2
    ),
    bg AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c12
           FROM dbg GROUP BY a, b),
    c1 AS (
      SELECT a, CAST(sum(c12) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS n1f
      FROM bg GROUP BY a
    ),
    rv AS (SELECT b, CAST(count(*) AS BIGINT) AS n1r FROM bg GROUP BY b),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n1all FROM bg),
    model AS (
      SELECT bg.a, bg.b,
             round((greatest(CAST(c12 AS DOUBLE) - 0.75, 0.0)
                    / CAST(c1.c1 AS DOUBLE))
                   + ((0.75 * CAST(c1.n1f AS DOUBLE))
                      / CAST(c1.c1 AS DOUBLE))
                     * (CAST(rv.n1r AS DOUBLE) / CAST(tot.n1all AS DOUBLE)),
                   9) AS pkn
      FROM bg JOIN c1 ON c1.a = bg.a JOIN rv ON rv.b = bg.b CROSS JOIN tot
    ),
    sc AS (
      SELECT doc_id,
             CAST(CAST(sum(CAST(round(-log2(m.pkn), 6) AS DECIMAL(18,6)))
                  AS VARCHAR) AS DOUBLE) / count(*) AS avg_neg_log2_pkn
      FROM dbg JOIN model m ON m.a = dbg.a AND m.b = dbg.b
      GROUP BY doc_id
    ),
    j AS (
      SELECT sc.doc_id, d.lang, sc.avg_neg_log2_pkn
      FROM sc JOIN documents d ON d.doc_id = sc.doc_id
    ),
    b AS (
      SELECT *, CAST(ntile(3) OVER (
               PARTITION BY lang ORDER BY avg_neg_log2_pkn, doc_id
             ) AS INT) AS bucket
      FROM j
    )
    SELECT doc_id, lang, avg_neg_log2_pkn, bucket,
           CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS tier
    FROM b
    """,
    tags=("northstar", "text", "lm", "curation"),
)
def ns_ccnet_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail split (Wenzek et al. 2020): score
    every doc's KN-bigram surprisal against the corpus model
    (_kn_doc_surprisal), then cut each LANGUAGE into perplexity
    tertiles — the published recipe for quality-stratifying web text
    before sampling.

    The per-language ntile goes through operators/ranking.
    grouped_ntile, NOT a lang-partitioned window: at 100 TB one
    language is half the corpus, and a window partitioned by lang
    funnels it through one task.  grouped_ntile range-partitions on
    the composite (lang, surprisal, doc_id) key — a giant language
    spreads over many partitions — then buckets from the distributed
    rank with exact integer split arithmetic."""
    from ..operators.ranking import grouped_ntile

    docs = T(spark, sf_dir, "documents")
    sc = _kn_doc_surprisal(docs).select("doc_id", "avg_neg_log2_pkn")
    j = sc.join(docs.select("doc_id", "lang"), "doc_id")
    b = grouped_ntile(
        j,
        ["lang"],
        [F.col("avg_neg_log2_pkn"), F.col("doc_id")],
        3,
        bucket_col="bucket",
        num_partitions=8,
    )
    return b.select(
        "doc_id",
        "lang",
        "avg_neg_log2_pkn",
        "bucket",
        F.when(F.col("bucket") == 1, "head")
        .when(F.col("bucket") == 2, "middle")
        .otherwise("tail")
        .alias("tier"),
    )


@query(
    "ns_matryoshka_fidelity",
    oracle="""
    WITH x AS (
      SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
             CAST(CAST(unnest(embedding) AS DOUBLE)
                  * CAST(unnest(embedding) AS DOUBLE)
                  AS DECIMAL(28,6)) AS v2
      FROM embeddings
    ),
    per AS (
      SELECT vec_id,
             sum(CASE WHEN pos < 8 THEN v2 END) AS ss8,
             sum(CASE WHEN pos < 16 THEN v2 END) AS ss16,
             sum(CASE WHEN pos < 32 THEN v2 END) AS ss32,
             sum(v2) AS ssall
      FROM x GROUP BY vec_id
    ),
    fid AS (
      SELECT vec_id, m,
             round(sqrt(CAST(CASE m WHEN 8 THEN COALESCE(ss8, 0)
                                    WHEN 16 THEN COALESCE(ss16, 0)
                                    ELSE COALESCE(ss32, 0) END AS DOUBLE)
                        / CAST(ssall AS DOUBLE)), 6) AS fidelity
      FROM per, UNNEST([8, 16, 32]) AS t(m)
    )
    SELECT CAST(m AS INT) AS m,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(CAST(sum(CAST(fidelity AS DECIMAL(18,6))) AS VARCHAR)
                AS DOUBLE) / count(*) AS mean_fidelity,
           min(fidelity) AS min_fidelity,
           max(fidelity) AS max_fidelity
    FROM fid GROUP BY m
    """,
    tags=("northstar", "similarity", "embedding"),
)
def ns_matryoshka_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit (operators/similarity.
    matryoshka_fidelity): per candidate serving dimension m ∈
    {8,16,32}, the corpus mean/min/max of cos(full, truncated) =
    ‖v[:m]‖/‖v‖ — the go/no-go table for shipping truncatable
    embeddings at a smaller dimension.  One posexplode + one keyed
    aggregation per vector (exact decimal power sums), a 3-row stack,
    and a 3-group final agg; mean is the decimal sum of 6-dp
    fidelities over an exact count."""
    from ..operators.similarity import matryoshka_fidelity

    fid = matryoshka_fidelity(
        T(spark, sf_dir, "embeddings"), prefixes=(8, 16, 32)
    )
    return fid.groupBy("m").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (
            F.sum(F.col("fidelity").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_fidelity"),
        F.min("fidelity").alias("min_fidelity"),
        F.max("fidelity").alias("max_fidelity"),
    )


@query(
    "ns_boilerplate_grams",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    g AS (
      SELECT doc_id, array_to_string(w[i:i+7], ' ') AS gram
      FROM t, UNNEST(range(1, len(w) - 6)) AS r(i)
      WHERE len(w) >= 8
    ),
    per AS (
      SELECT gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_occurrences
      FROM g GROUP BY gram
    )
    SELECT gram, n_docs, n_occurrences,
           CAST(row_number() OVER (
             ORDER BY n_docs DESC, n_occurrences DESC, gram
           ) AS BIGINT) AS rk
    FROM per
    ORDER BY rk LIMIT 50
    """,
    tags=("northstar", "dedup", "substring"),
)
def ns_boilerplate_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate audit (operators/dedup.boilerplate_grams): the 50
    hottest word 8-grams by distinct-doc frequency — the spans the
    substring dedup's max_gram_docs cap would exclude, published so
    the cap is auditable.  Groups on the gram string itself (nothing
    engine-specific to hash); the cut is TakeOrderedAndProject +
    a rank over the ≤50 survivors, never a global window."""
    return D.boilerplate_grams(
        T(spark, sf_dir, "documents"), k=8, top=50
    )


@query(
    "ns_gopher_repetition",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w,
             greatest(length(trim(text)), 1) AS nc
      FROM documents
    ),
    g2 AS (SELECT doc_id, array_to_string(list_slice(w, i, i + 1), ' ') AS g
           FROM t, UNNEST(range(1, len(w))) AS r(i) WHERE len(w) >= 2),
    c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
    a2 AS (SELECT doc_id, max(c * length(g)) AS topm FROM c2 GROUP BY 1),
    g3 AS (SELECT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS g
           FROM t, UNNEST(range(1, len(w) - 1)) AS r(i) WHERE len(w) >= 3),
    c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
    a3 AS (SELECT doc_id, max(c * length(g)) AS topm FROM c3 GROUP BY 1),
    g4 AS (SELECT doc_id, array_to_string(list_slice(w, i, i + 3), ' ') AS g
           FROM t, UNNEST(range(1, len(w) - 2)) AS r(i) WHERE len(w) >= 4),
    c4 AS (SELECT doc_id, g, count(*) AS c FROM g4 GROUP BY 1, 2),
    a4 AS (SELECT doc_id, max(c * length(g)) AS topm FROM c4 GROUP BY 1),
    g5 AS (SELECT doc_id, array_to_string(list_slice(w, i, i + 4), ' ') AS g
           FROM t, UNNEST(range(1, len(w) - 3)) AS r(i) WHERE len(w) >= 5),
    c5 AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY 1, 2),
    a5 AS (SELECT doc_id,
                  sum(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END) AS dupm
           FROM c5 GROUP BY 1),
    g10 AS (SELECT doc_id, array_to_string(list_slice(w, i, i + 9), ' ') AS g
            FROM t, UNNEST(range(1, len(w) - 8)) AS r(i) WHERE len(w) >= 10),
    c10 AS (SELECT doc_id, g, count(*) AS c FROM g10 GROUP BY 1, 2),
    a10 AS (SELECT doc_id,
                   sum(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END) AS dupm
            FROM c10 GROUP BY 1)
    SELECT t.doc_id, CAST(nc AS BIGINT) AS n_chars,
           CAST(coalesce(a2.topm, 0) AS DOUBLE) / nc AS top2_frac,
           CAST(coalesce(a3.topm, 0) AS DOUBLE) / nc AS top3_frac,
           CAST(coalesce(a4.topm, 0) AS DOUBLE) / nc AS top4_frac,
           least(1.0, CAST(coalesce(a5.dupm, 0) AS DOUBLE) / nc) AS dup5_frac,
           least(1.0, CAST(coalesce(a10.dupm, 0) AS DOUBLE) / nc)
             AS dup10_frac,
           (CAST(coalesce(a2.topm, 0) AS DOUBLE) / nc <= 0.20
            AND CAST(coalesce(a3.topm, 0) AS DOUBLE) / nc <= 0.18
            AND CAST(coalesce(a4.topm, 0) AS DOUBLE) / nc <= 0.16
            AND least(1.0, CAST(coalesce(a5.dupm, 0) AS DOUBLE) / nc) <= 0.15
            AND least(1.0, CAST(coalesce(a10.dupm, 0) AS DOUBLE) / nc) <= 0.10)
             AS keep
    FROM t
    LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)
    LEFT JOIN a4 USING (doc_id) LEFT JOIN a5 USING (doc_id)
    LEFT JOIN a10 USING (doc_id)
    """,
    tags=("northstar", "text", "quality", "curation"),
)
def ns_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition battery (Rae et al. 2021 appendix A1, n-gram
    half): per-doc top-{2,3,4}-gram char fractions, duplicated
    {5,10}-gram char fractions, and the conjunctive keep flag at the
    paper's thresholds — the repetition complement of ns_gopher_rules
    (operators/text.gopher_repetition)."""
    return X.gopher_repetition(
        T(spark, sf_dir, "documents"), top_ns=(2, 3, 4), dup_ns=(5, 10)
    )


@query(
    "ns_self_repetition",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w
               FROM documents),
    g AS (SELECT doc_id, i AS pos,
                 array_to_string(list_slice(w, i, i + 1), ' ') AS gr
          FROM t, UNNEST(range(1, len(w))) AS r(i) WHERE len(w) >= 2),
    capped AS (SELECT doc_id, gr FROM g
               GROUP BY doc_id, gr HAVING count(*) <= 50),
    kept AS (SELECT g.doc_id, g.pos, g.gr
             FROM g JOIN capped USING (doc_id, gr)),
    m AS (SELECT a.doc_id, a.pos AS pa, b.pos AS pb
          FROM kept a JOIN kept b
            ON a.doc_id = b.doc_id AND a.gr = b.gr AND a.pos < b.pos),
    isl AS (SELECT doc_id, pa, pb, pb - pa AS diag,
                   pa - row_number() OVER (
                     PARTITION BY doc_id, pb - pa ORDER BY pa
                   ) AS grp
            FROM m),
    runs AS (SELECT doc_id, CAST(min(pa) AS BIGINT) AS start_1,
                    CAST(min(pb) AS BIGINT) AS start_2,
                    CAST(count(*) + 1 AS BIGINT) AS run_len
             FROM isl GROUP BY doc_id, diag, grp)
    SELECT doc_id, start_1, start_2, run_len FROM runs WHERE run_len >= 3
    """,
    tags=("northstar", "dedup", "text"),
)
def ns_self_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repeated token runs (k=2 grams, runs ≥ 3
    tokens): diagonal-islands exact repeat detection WITHIN each doc
    — the within-doc counterpart of ns_shared_span_runs
    (operators/dedup.self_repetition_spans)."""
    return D.self_repetition_spans(
        T(spark, sf_dir, "documents"), k=2, min_run=3, max_gram_occ=50
    )


@query(
    "ns_jl_topk",
    oracle="""
    SELECT CAST(5 * count(*) AS BIGINT) AS n_exact, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 10
    """,
    tags=("northstar", "similarity", "ann"),
)
def ns_jl_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random-projection ANN as a SELF-CHECKING gate: corpus
    projected 64→16 dims by a deterministic ±1 sign matrix (4× less
    vector I/O in the shortlist search — the dense-projection member
    of the shortlist family next to IVF cells and PQ codes),
    shortlist by projected cosine, exact cosine re-rank, recall vs
    brute force ≥ 0.8 on the vec_id < 10 probe slice
    (operators/similarity.jl_topk)."""
    import math

    emb = T(spark, sf_dir, "embeddings")
    # Shortlist fraction is ADAPTIVE (r8 item 4): measured from the
    # corpus's own clusteredness (median top-1 sampled cosine mapped
    # through a normal-tail rank estimate — operators/similarity.
    # jl_shortlist_fraction documents the statistic, the operating
    # curve, and its measured anchors).  THIS corpus is deliberately
    # isotropic — JL's true worst case: all cosines near 0, the
    # neighbor gap inside the projection distortion — so the measured
    # fraction hits the curve's 1/3 cap, reproducing the r8 fixed
    # knob.  Swept (out_dim, shortlist frac) → recall at
    # sf0.001/0.01/0.1: (16, 10%) 0.34/0.50/0.42; (32, 10%)
    # —/0.58/0.76; (32, 25%) 0.80/0.84/0.96; (32, 33%) 0.84/0.96/0.96.
    # A clustered corpus (every real embedding corpus) measures a
    # heavy cosine tail and stops paying the 33% scan — see
    # tests/test_northstar.py::test_jl_shortlist_fraction_adapts.
    frac = S.jl_shortlist_fraction(emb, out_dim=32)
    shortlist = max(50, math.ceil(emb.count() * frac))
    exact = S.cosine_topk(emb, F.col("vec_id") < 10, k=5)
    approx = S.jl_topk(
        emb, F.col("vec_id") < 10, k=5, out_dim=32, shortlist=shortlist
    )
    return _recall_gate(exact, approx, 0.8)


@query(
    "ns_source_kl_divergence",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(trim(text), ' ')) AS w
      FROM documents
    ),
    corpus AS (SELECT w, CAST(count(*) AS BIGINT) AS cq FROM tok GROUP BY 1),
    topk AS (SELECT w FROM corpus ORDER BY cq DESC, w LIMIT 25),
    mapped AS (
      SELECT source,
             CASE WHEN topk.w IS NOT NULL THEN tok.w
                  ELSE '<other>' END AS bucket
      FROM tok LEFT JOIN topk ON topk.w = tok.w
    ),
    per_sb AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS c_sb
               FROM mapped GROUP BY 1, 2),
    per_b AS (SELECT bucket, CAST(sum(c_sb) AS BIGINT) AS c_b
              FROM per_sb GROUP BY 1),
    per_s AS (SELECT source, CAST(sum(c_sb) AS BIGINT) AS n_s
              FROM per_sb GROUP BY 1),
    tot AS (SELECT CAST(sum(c_b) AS BIGINT) AS n_all,
                   CAST(count(*) AS BIGINT) AS n_buckets FROM per_b),
    grid AS (
      SELECT s.source, b.bucket, s.n_s, b.c_b,
             coalesce(x.c_sb, 0) AS c_sb, tot.n_all, tot.n_buckets
      FROM per_s s CROSS JOIN per_b b CROSS JOIN tot
      LEFT JOIN per_sb x ON x.source = s.source AND x.bucket = b.bucket
    ),
    terms AS (
      SELECT source, n_s, n_buckets, c_sb,
             round(ln(CAST(c_sb + 1 AS DOUBLE)
                      / CAST(n_s + n_buckets AS DOUBLE))
                   - ln(CAST(c_b + 1 AS DOUBLE)
                        / CAST(n_all + n_buckets AS DOUBLE)),
                   6) AS lr
      FROM grid
    )
    SELECT source, CAST(max(n_s) AS BIGINT) AS n_tokens,
           CAST(CAST(sum(CAST(c_sb + 1 AS DECIMAL(18,0))
                         * CAST(lr AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
             / CAST(max(n_s) + max(n_buckets) AS DOUBLE) AS kl_nats
    FROM terms GROUP BY source
    """,
    tags=("northstar", "text", "curation", "mixing"),
)
def ns_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL divergence vs the corpus distribution —
    the data-MIXING drift diagnostic (which source's token
    distribution deviates most from the blend it feeds): KL(p_s‖q) =
    Σ_b p_s(b)·ln(p_s(b)/q(b)) over the top-25 corpus tokens plus an
    '<other>' bucket, Laplace +1 smoothed so every bucket is finite.

    Scale shape: the bucket alphabet is FIXED (top-k + other), so the
    source×bucket grid is S·(k+1) rows however big the corpus — the
    same model-is-the-histogram collapse as dsir_logweights.  The
    corpus is exploded ONCE: every relation (corpus vocabulary, the
    top-k cut, per-source bucket counts) rolls up from the single
    (source, token)-count aggregate, so the token volume is shuffled
    exactly one time (the same derive-don't-rescan fix dsir_logweights
    got in r7).  The top-k cut is a deterministic total order
    (count desc, token asc) via TakeOrderedAndProject, never a global
    window.  ULP discipline: each log-ratio is 6dp-quantized in both
    engines and the per-source sum runs as Σ integer·decimal (exact,
    order-free) with ONE final double division."""
    from ..operators.ranking import top_k_ranked

    docs = T(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.trim(F.col("text")), " ")).alias("w")
    )
    per_sw = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c_sw"))
    corpus = per_sw.groupBy("w").agg(F.sum("c_sw").alias("cq"))
    topk = top_k_ranked(corpus, [F.col("cq").desc(), F.col("w")], k=25).select(
        "w", F.lit(True).alias("_in")
    )
    per_sb = (
        per_sw.join(F.broadcast(topk), "w", "left")
        .select(
            "source",
            F.when(F.col("_in"), F.col("w"))
            .otherwise(F.lit("<other>"))
            .alias("bucket"),
            "c_sw",
        )
        .groupBy("source", "bucket")
        .agg(F.sum("c_sw").alias("c_sb"))
    )
    per_b = per_sb.groupBy("bucket").agg(F.sum("c_sb").alias("c_b"))
    per_s = per_sb.groupBy("source").agg(F.sum("c_sb").alias("n_s"))
    tot = per_b.agg(
        F.sum("c_b").alias("n_all"), F.count(F.lit(1)).alias("n_buckets")
    )
    grid = (
        per_s.crossJoin(F.broadcast(per_b))
        .crossJoin(F.broadcast(tot))
        .join(per_sb, ["source", "bucket"], "left")
        .select(
            "source",
            "bucket",
            "n_s",
            "c_b",
            F.coalesce(F.col("c_sb"), F.lit(0)).alias("c_sb"),
            "n_all",
            "n_buckets",
        )
    )
    lr = F.round(
        F.log(
            (F.col("c_sb") + 1).cast("double")
            / (F.col("n_s") + F.col("n_buckets")).cast("double")
        )
        - F.log(
            (F.col("c_b") + 1).cast("double")
            / (F.col("n_all") + F.col("n_buckets")).cast("double")
        ),
        6,
    )
    return (
        grid.select("source", "n_s", "n_buckets", "c_sb", lr.alias("lr"))
        .groupBy("source")
        .agg(
            F.max("n_s").alias("n_tokens"),
            (
                F.sum(
                    (F.col("c_sb") + 1).cast("decimal(18,0)")
                    * F.col("lr").cast("decimal(18,6)")
                ).cast("double")
                / (F.max("n_s") + F.max("n_buckets")).cast("double")
            ).alias("kl_nats"),
        )
    )


@query(
    "ns_zipf_slope",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents
    ),
    vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS cq FROM tok GROUP BY 1),
    ranked AS (
      SELECT cq, CAST(row_number() OVER (ORDER BY cq DESC, w) AS BIGINT) AS rk
      FROM vocab ORDER BY rk LIMIT 100
    ),
    pts AS (
      SELECT CAST(round(log2(CAST(rk AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
             CAST(round(log2(CAST(cq AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
      FROM ranked
    ),
    sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(sum(x * y) AS VARCHAR) AS DOUBLE) AS sxy,
             CAST(CAST(sum(x * x) AS VARCHAR) AS DOUBLE) AS sxx
      FROM pts
    )
    SELECT n, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
             / n AS intercept
    FROM sums
    """,
    tags=("northstar", "text", "stats"),
)
def ns_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the top-100 vocabulary: OLS slope and
    intercept of log2(freq) against log2(rank) — the corpus-health
    diagnostic (natural text slopes ≈ −1; synthetic/templated corpora
    flatten).  Rank comes from top_k_ranked (TakeOrderedAndProject +
    rank over ≤100 survivors, never a global window); log2 values are
    6dp-quantized in both engines, the OLS sums run as exact DECIMAL
    (order-free), and slope/intercept are computed with the identical
    expression tree on both sides."""
    from ..operators.ranking import top_k_ranked

    docs = T(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cq"))
    )
    ranked = top_k_ranked(
        vocab, [F.col("cq").desc(), F.col("w")], k=100, rank_col="rk"
    )
    pts = ranked.select(
        F.round(F.log2(F.col("rk").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("x"),
        F.round(F.log2(F.col("cq").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("y"),
    )
    sums = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    slope = (n_d * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n_d * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        "n",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / n_d).alias("intercept"),
    )


@query(
    "mm_audio_energy",
    oracle="""
    WITH s AS (
      SELECT doc_id, sha256(text) AS h FROM documents
    ),
    b AS (
      SELECT doc_id, CAST(i // 8 AS INT) AS window_id,
             CAST('0x' || substr(h, 1 + 2 * i, 2) AS INT) AS v
      FROM s, UNNEST(range(0, 32)) AS r(i)
    )
    SELECT doc_id, window_id, CAST(8 AS INT) AS n_samples,
           CAST(sum(v * v) AS BIGINT) AS energy,
           CAST(max(v) AS INT) AS peak
    FROM b GROUP BY 1, 2
    """,
    tags=("northstar", "multimodal", "audio"),
)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio energy segmentation plumbing (operators/multimodal.
    audio_energy_windows): binary payload → deterministic fake PCM
    samples (sha256 digest bytes) → 4 fixed windows → integer-exact
    Σ sample² energy + peak per window, hash-verified end-to-end
    against the digest re-derived in SQL (the mm_decode_stub
    pattern)."""
    return M.audio_energy_windows(
        M.attach_payload(T(spark, sf_dir, "documents")), n_windows=4
    )
