"""Text-analysis operators: token stats, quality scoring, language-ID
heuristic, document fingerprinting.

All column-function based (codegen'd); no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is", "on")

# BPE-ish pretokenizer: letter runs | digit runs | any other non-space
# (same regex semantics in Java regex and RE2 — keep it simple).
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

# Marker-word profiles for the language-ID heuristic.  A real system
# ships char-n-gram profiles per language; the structure (score each
# profile, argmax with deterministic tie-break) is identical.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
    "zh": ("的", "是", "了", "在"),
}


def _toks(text: Column) -> Column:
    return F.split(F.trim(text), " ")


def token_count(text: Column) -> Column:
    return F.size(_toks(text))


def bpe_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_RE), 0))


def text_stats(df: DataFrame, group_col: str = "lang") -> DataFrame:
    """Per-group corpus stats: doc count, char/token averages,
    distinct sources.  One shuffle on the group key."""
    return (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg(F.col("n_chars").cast("double")).alias("avg_chars"),
            F.avg(token_count(F.col("text")).cast("double")).alias("avg_tokens"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


def quality_features(df: DataFrame) -> DataFrame:
    """Per-doc quality features in one projection pass:

    n_tokens, n_chars_measured, avg token length, stopword ratio,
    distinct-token ratio, and a blended quality score ∈ [0,1]
    (structure mirrors production quality filters: length window +
    lexical-diversity + stopword sanity).
    """
    toks = _toks(F.col("text"))
    n_tok = F.size(toks).cast("double")
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    ).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    n_chars = F.length("text").cast("double")
    avg_tok_len = (n_chars - (n_tok - 1)) / n_tok  # chars net of separators
    stop_ratio = n_stop / n_tok
    distinct_ratio = n_distinct / n_tok
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * distinct_ratio
        + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0))
    )
    return df.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        n_chars.cast("int").alias("n_chars_measured"),
        avg_tok_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        score.alias("quality_score"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprints: md5 of normalized text
    (lower + whitespace collapse) and a 64-bit xxhash64 — the join keys
    of every dedup ledger."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    return df.select(
        id_col,
        F.md5(norm).alias("fp_md5"),
        F.xxhash64(norm).alias("fp_xx64"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: score = count of profile marker words in
    the token set per language; argmax with tie-break by profile order.
    Appends `lang_pred` and per-language scores.  Accuracy depends on
    the profiles; determinism and plan shape are the contract (tested
    against a pandas reimplementation)."""
    toks = F.array_distinct(_toks(F.col(text_col)))
    out = df
    score_cols = []
    for lang, markers in LANG_MARKERS.items():
        sc = F.size(F.filter(toks, lambda t: t.isin(*markers))).alias(f"score_{lang}")
        score_cols.append(f"score_{lang}")
        out = out.withColumn(f"score_{lang}", sc)
    best = F.greatest(*[F.col(c) for c in score_cols])
    pred = F.lit("und")
    # reversed so the first profile wins ties deterministically
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when(F.col(f"score_{lang}") == best, lang).otherwise(pred)
    return out.withColumn(
        "lang_pred", F.when(best > 0, pred).otherwise(F.lit("und"))
    )


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """Corpus vocabulary: top_k tokens by document frequency
    (tie-break: token asc).  Two shuffles total — (doc,token) distinct
    is per-doc array_distinct (no shuffle), then one groupBy(token) and
    a global top-k (TakeOrdered, no full sort)."""
    tok_rows = df.select(
        F.explode(F.array_distinct(_toks(F.col(text_col)))).alias("token")
    )
    return (
        tok_rows.groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("token"))
        .limit(top_k)
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document (tf · ln(N/df), ties broken by
    token asc) — the classic corpus-weighting op every text pipeline
    needs.  Shape: explode → (doc,token) counts → token-level doc
    frequencies → join back → per-doc window top-k.  The N scalar is a
    driver-side count (model state, not data).

    The score is quantized to 6 decimals: ln() differs at the ULP
    between runtimes (Java Math.log vs libm), so the raw double isn't
    portable — rounding in BOTH engines makes the value and the
    ranking it induces engine-independent."""
    n_docs = df.count()
    tf = (
        df.select(F.col(id_col), F.explode(_toks(F.col(text_col))).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        tf.join(dft, "token")
        .select(
            F.col(id_col),
            "token",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df_t")), 6
            ).alias("tfidf"),
        )
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )


def bm25_topk(
    df: DataFrame,
    query_pred: Column,
    k: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 lexical retrieval: rank corpus documents against each
    query document's token set, top-k per query — the sparse
    counterpart of the dense ANN queries (hybrid search = this + rank
    fusion with cosine top-k).

    Shape: corpus statistics (tf, doc length, df, N, avgdl) are
    groupBys over the exploded token relation; query tokens meet
    corpus postings through a token equi-join (queries are a filtered
    slice — broadcastable; at 100 TB the postings side stays
    sharded by token and only df/N/avgdl are scalars/small).

    Exactness: each per-token score term is rounded to 6 dp and cast
    DECIMAL before the per-(query, doc) sum, so the sum is order-free;
    ln() agrees across engines far beyond 6 dp (same discipline as
    tfidf_top_terms).
    """
    from pyspark.sql import Window as W

    tok = df.select(
        F.col(id_col), F.explode(_toks(F.col(text_col))).alias("token")
    )
    tf = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    dft = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.col("dl").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_dl"),
    )
    q = (
        df.filter(query_pred)
        .select(F.col(id_col).alias("q_id"), F.explode(_toks(F.col(text_col))).alias("token"))
        .distinct()
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
    )
    tfnorm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avg_dl"))
    )
    term = F.round(idf * tfnorm, 6).cast("decimal(18,6)")
    scored = (
        F.broadcast(q)
        .join(tf, "token")
        .filter(F.col(id_col) != F.col("q_id"))
        .join(F.broadcast(dft), "token")
        .join(dl, id_col)
        .join(F.broadcast(stats))
        .groupBy("q_id", id_col)
        .agg(F.sum(term).cast("double").alias("bm25"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("bm25").desc(), F.col(id_col))
    return scored.withColumn("rn", F.row_number().over(w).cast("int")).filter(
        F.col("rn") <= k
    )
