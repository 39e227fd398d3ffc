"""Text-analysis operators: token stats, quality scoring, language-ID
heuristic, document fingerprinting.

All column-function based (codegen'd); no Python in the hot path.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is", "on")
# STOPWORDS are interpolated UNESCAPED into a regexp_count alternation
# (quality_features below); a stopword containing a regex metacharacter
# would silently corrupt the count, so pin the invariant at import time
# (ADVICE r9).  Extend the charset only together with \Q..\E escaping.
# explicit raise (not assert) so the import-time check survives -O
if not all(_re.fullmatch(r"[a-z]+", w) for w in STOPWORDS):
    raise ValueError(
        "STOPWORDS must be purely alphabetic (used unescaped in a regex)"
    )

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
    # multiplicity-preserving stopword COUNT without an interpreted
    # HOF lambda (Catalyst evaluates filter()/aggregate() lambdas
    # ~1 µs/element — the r7 gopher_rules port measured the regexp
    # codegen path at ~21× faster): count whole-token matches on the
    # space-padded text; lookarounds keep adjacent tokens matchable.
    n_stop = F.regexp_count(
        F.concat(F.lit(" "), F.trim(F.col("text")), F.lit(" ")),
        F.lit("(?<= )(?:" + "|".join(STOPWORDS) + ")(?= )"),
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
        # toks is distinct, so array_intersect's dedup is harmless and
        # the count equals the old filter(isin) lambda — but it runs
        # as a native codegen'd collection expression, not an
        # interpreted per-element HOF (same port as gopher_rules r7).
        sc = F.size(
            F.array_intersect(toks, F.array(*[F.lit(m) for m in markers]))
        ).alias(f"score_{lang}")
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


def bm25_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Denormalized BM25 postings index: one row per (token, doc) with
    every statistic a probe needs — tf, doc length, token document
    frequency, corpus size and average doc length.

    This is the "build once, probe many" split: at 100 TB the index is
    materialized once (write .bucketBy(token) so probes shuffle
    nothing) and each query set is a single token equi-join against
    it, instead of recomputing corpus statistics per query.  The plan
    ends hash-partitioned on token — exactly the probe's join key.
    """
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
    return (
        tf.join(dl, id_col)
        .join(F.broadcast(dft), "token")
        .join(F.broadcast(stats))
        .select("token", id_col, "tf", "dl", "df_t", "n_docs", "avg_dl")
    )


def bm25_probe(
    index: DataFrame,
    queries: DataFrame,
    k: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    q_id_col: str = "doc_id",
) -> DataFrame:
    """Rank indexed documents against each query document's token set,
    top-k per query: one broadcast token equi-join against the postings
    index + per-(query, doc) sum + windowed top-k — corpus statistics
    come from the index, nothing is recomputed.

    Exactness: each per-token score term is rounded to 6 dp and cast
    DECIMAL before the sum, so the total is order-free; ln() agrees
    across engines far beyond 6 dp (same discipline as
    tfidf_top_terms)."""
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.explode(_toks(F.col(text_col))).alias("token"),
    ).distinct()
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
        .join(index, "token")
        .filter(F.col(id_col) != F.col("q_id"))
        .groupBy("q_id", id_col)
        .agg(F.sum(term).cast("double").alias("bm25"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("bm25").desc(), F.col(id_col))
    return scored.withColumn("rn", F.row_number().over(w).cast("int")).filter(
        F.col("rn") <= k
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

    Single-shot shape: the broadcast query-token join lands on the tf
    relation FIRST, so only query-relevant postings ever join the
    doc-length/df/stats relations (cheaper than probing a fully
    denormalized index when the index isn't reused).  For repeated
    probes over a stable corpus, materialize bm25_index once and use
    bm25_probe — identical results, asserted in tests.

    Exactness: per-token score terms are rounded to 6 dp and cast
    DECIMAL before the per-(query, doc) sum, so the sum is order-free;
    ln() agrees across engines far beyond 6 dp."""
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
        .select(
            F.col(id_col).alias("q_id"),
            F.explode(_toks(F.col(text_col))).alias("token"),
        )
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


def token_budget_pack(
    df: DataFrame,
    budget: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pack documents into fixed token-budget batches (training-shard
    assignment): docs are laid out in deterministic md5-of-id order and
    each doc joins the batch containing its LAST token —
    ``batch_id = (running_total - 1) div budget``.

    The global running total is computed as a DISTRIBUTED prefix sum
    (operators/ranking.global_running_sum), not a single-partition
    window: range-partition on the sort key, cumulative sum within
    each partition in parallel, then a tiny per-partition-totals
    collect becomes broadcast offsets.  No stage ever sees more than
    its partition — the pattern that survives 100 TB, where a global
    ORDER BY window would serialize the corpus through one task.
    """
    from .ranking import global_running_sum

    key = F.md5(F.col(id_col).cast("string"))
    base = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        key.alias("_k"),
    )
    sc = df.sparkSession.sparkContext
    n = max(sc.defaultParallelism, base.rdd.getNumPartitions())
    running = global_running_sum(
        base, ["_k", id_col], "n_tokens", out_col="running_tokens",
        num_partitions=n,
    )
    return running.select(
        id_col,
        "n_tokens",
        "running_tokens",
        F.expr("(running_tokens - 1) div " + str(budget))
        .cast("long")
        .alias("batch_id"),
    )


def pack_fixed_windows(
    df: DataFrame,
    context: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pack documents into FIXED context windows of ``context`` tokens
    (pretraining sequence packing: windows are the unit a trainer
    consumes; every token beyond a window's fill is pad waste).

    ``token_budget_pack`` lets a doc's tokens straddle batch
    boundaries; here a doc must fit entirely inside one window, so the
    problem is bin packing.  Classic first-fit-decreasing is a
    sequential recurrence over every doc — not order-free, not
    distributed.  This packer keeps FFD's decreasing discipline while
    staying closed-form per doc:

    1. ``len = min(n_tokens, context)`` (over-long docs are truncated
       to one full window — the standard pretraining treatment).
       Under the whitespace tokenizer an empty string counts as ONE
       empty token (``split`` never yields an empty array, matching
       the oracle's ``string_split``), so every doc has len >= 1; the
       guard below is a safety net for other tokenizers.
    2. Docs get a deterministic global rank under
       ``(len DESC, md5(id), id)`` via the distributed ranking
       construction (operators/ranking.global_rank — range exchange +
       per-partition row_number + broadcast offsets; NO
       single-partition window).
    3. **Homogeneous bulk fill**: per length L, ``k = context div L``
       docs fill one window; the per-length rank ``r = global_rank -
       #docs_longer`` assigns doc → window by pure arithmetic
       (``full_off(L) + (r-1) div k``).  All per-length constants come
       from the length histogram — at most ``context`` rows, a
       provably bounded collect.
    4. **Next-fit-decreasing remainder combine**: each length leaves
       at most one partial group (≤ context of them); sorted by
       (size DESC, len) they are combined next-fit on the driver —
       O(context) work — and the tiny (len → window) map is
       broadcast-joined back.

    The whole assignment is a deterministic function of the multiset
    of lengths, so it is exactly reproducible in ANSI SQL (rank +
    histogram arithmetic + a linear recursive CTE for the next-fit
    pass) — unlike true FFD, whose bin state is a sequential
    full-corpus recurrence.  Waste is within one partial window per
    distinct length of FFD's; the report query quantifies it against
    the ``ceil(total/context)`` lower bound.

    Scale shape: one range exchange (the rank), one ≤context-row
    histogram shuffle, one broadcast join.  No per-length window —
    at 100 TB billions of docs share a length, so a window
    partitioned by ``len`` would be the skew cliff this construction
    avoids.

    Returns (id_col, len, len_rank, window_id); window_ids are dense
    ``0..n_windows-1``, bulk windows first (length-major), combined
    remainder windows after.
    """
    from .ranking import global_rank

    C = int(context)
    if C < 1:
        raise ValueError(f"context must be >= 1, got {context}")
    base = df.select(
        F.col(id_col),
        F.least(token_count(F.col(text_col)).cast("long"), F.lit(C)).alias(
            "len"
        ),
        F.md5(F.col(id_col).cast("string")).alias("_k"),
    ).where(F.col("len") >= 1)
    ranked = global_rank(
        base, [F.desc("len"), "_k", id_col], rank_col="_grk"
    )
    # length histogram: len is clamped to [1, context], so this
    # collect is bounded by `context` rows — a driver-side constant,
    # never corpus-sized.
    hist = (
        base.groupBy("len").agg(F.count(F.lit(1)).alias("m")).collect()
    )
    stats = sorted(((int(r["len"]), int(r["m"])) for r in hist), reverse=True)
    off = 0
    full_off = 0
    per_len: list[tuple[int, int, int, int, int]] = []
    partials: list[tuple[int, int]] = []  # (group token size, len)
    for L, m in stats:
        k = C // L
        n_full = m // k
        per_len.append((L, off, full_off, k, n_full))
        off += m
        full_off += n_full
        part_cnt = m - n_full * k
        if part_cnt:
            partials.append((part_cnt * L, L))
    total_full = full_off
    # next-fit decreasing over the ≤context partial groups
    partials.sort(key=lambda t: (-t[0], t[1]))
    part_win: dict[int, int] = {}
    widx, rem = -1, 0
    for size, L in partials:
        if size <= rem:
            rem -= size
        else:
            widx += 1
            rem = C - size
        part_win[L] = total_full + widx
    spark = df.sparkSession
    mdf = spark.createDataFrame(
        [
            (L, o, fo, k, nf, part_win.get(L, -1))
            for L, o, fo, k, nf in per_len
        ],
        "len long, _off long, _full_off long, _k_cap long, _n_full long, "
        "_part_win long",
    )
    out = ranked.join(F.broadcast(mdf), "len")
    r = F.col("_grk") - F.col("_off")
    win = F.when(
        r <= F.col("_n_full") * F.col("_k_cap"),
        F.col("_full_off") + F.floor((r - F.lit(1)) / F.col("_k_cap")),
    ).otherwise(F.col("_part_win"))
    return out.select(
        F.col(id_col),
        F.col("len"),
        r.cast("long").alias("len_rank"),
        win.cast("long").alias("window_id"),
    )


def pack_fixed_report(
    df: DataFrame,
    context: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One-row pad-waste / fragmentation report over
    ``pack_fixed_windows``: window count vs the ``ceil(total/context)``
    lower bound, total pad tokens, waste fraction, and fill extremes.
    One extra keyed aggregation over the assignment — the audit a
    pipeline runs before shipping shards to a trainer."""
    C = int(context)
    packed = pack_fixed_windows(
        df, context=C, id_col=id_col, text_col=text_col
    )
    wins = packed.groupBy("window_id").agg(
        F.sum("len").alias("fill"), F.count(F.lit(1)).alias("n_docs")
    )
    # integer arithmetic throughout (div, not fp ceil); waste_frac is
    # ONE IEEE division of two exact longs + round — bit-identical in
    # any engine (the ULP discipline used across this module).
    return wins.agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("fill").cast("long").alias("total_tokens"),
        F.expr(f"(sum(fill) + {C - 1}) div {C}")
        .cast("long")
        .alias("lower_bound"),
        F.expr(f"count(1) * {C} - sum(fill)")
        .cast("long")
        .alias("pad_tokens"),
        F.round(
            F.expr(f"count(1) * {C} - sum(fill)").cast("double")
            / F.expr(f"count(1) * {C}").cast("double"),
            6,
        ).alias("waste_frac"),
        F.max("fill").cast("long").alias("max_fill"),
        F.min("fill").cast("long").alias("min_fill"),
    )


def chunk_documents(
    df: DataFrame,
    window: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    context-window preparation step of a training-data pipeline
    (window=32 tokens, stride=24 → 8-token overlap).

    Entirely row-local: ``sequence`` generates the chunk starts and
    ``slice`` cuts each window out of the token array, so the plan is
    one Generate over a projection — no shuffle, no UDF, and it
    scales linearly with corpus size regardless of document count.
    Mirrors reference ingestion granularity (file → row batches,
    dataIngestionUtils.py:229-247) re-expressed as token windows.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("chunk_documents: window and stride must be > 0")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(F.col("_w")) - 1, F.lit(0)), F.lit(stride)
    )
    return (
        df.select(F.col(id_col), _toks(F.col(text_col)).alias("_w"))
        .select(id_col, "_w", F.explode(starts).alias("_s"))
        .select(
            id_col,
            (F.col("_s") / stride).cast("int").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("_w"), F.col("_s") + 1, window), " "
            ).alias("chunk_text"),
            F.least(F.size("_w") - F.col("_s"), F.lit(window))
            .cast("int")
            .alias("chunk_tokens"),
        )
    )


def normalize_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Canonical text normalization: lowercase, strip every char
    outside [a-z0-9 ], collapse whitespace runs, trim.  Emits the
    normalized text plus its md5 fingerprint (the canonical dedup
    key).  Pure codegen'd projection — regex kept to a subset with
    identical Java-regex / RE2 semantics so oracles can mirror it.
    """
    lowered = F.lower(F.trim(F.col(text_col)))
    stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", "")
    collapsed = F.trim(F.regexp_replace(stripped, " +", " "))
    return df.select(
        F.col(id_col),
        collapsed.alias("norm_text"),
        F.md5(collapsed).alias("norm_fp"),
        F.length(collapsed).cast("int").alias("norm_chars"),
    )


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals, one row per document:
    top-token frequency ratio and top-bigram frequency ratio, plus a
    ``repetitive`` flag (tok > 0.2 or bigram > 0.18 — Gopher's
    published thresholds, Rae et al. 2021 §A1.1).

    Arrow ``mapInPandas`` kernel, one Counter pass per document —
    O(n) per doc and still ZERO shuffles (a single map stage at
    100 TB).  The first version computed the same signals with
    doc-local Catalyst higher-order functions (array_distinct +
    filter counts): semantically identical but O(u·n) per document
    and INTERPRETED per element-op — the r5 sf1 soak measured it at
    490 s for 50k docs vs sub-second for this kernel (the
    sig_from_arrays / simhash64 precedent).  Outputs are bit-equal:
    integer counts, ratios formed by the same int→double IEEE
    division, `.strip(' ')`/`.split(' ')` matching F.trim/F.split's
    single-space semantics.
    """
    import pandas as pd

    from pyspark.sql import types as T2

    id_field = df.schema[id_col]
    schema = T2.StructType(
        [
            T2.StructField(id_col, id_field.dataType, id_field.nullable),
            T2.StructField("n_tokens", T2.IntegerType(), False),
            T2.StructField("top_token_ratio", T2.DoubleType(), False),
            T2.StructField("top_bigram_ratio", T2.DoubleType(), False),
            T2.StructField("repetitive", T2.BooleanType(), False),
        ]
    )

    def kernel(batches):
        from collections import Counter

        for pdf in batches:
            n_out, tr_out, br_out, rep_out = [], [], [], []
            for t in pdf[text_col]:
                toks = ("" if t is None else t).strip(" ").split(" ")
                n = len(toks)
                tr = max(Counter(toks).values()) / n
                if n >= 2:
                    br = max(Counter(zip(toks, toks[1:])).values()) / (n - 1)
                else:
                    br = 0.0
                n_out.append(n)
                tr_out.append(tr)
                br_out.append(br)
                rep_out.append(tr > 0.2 or br > 0.18)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": pd.Series(n_out, dtype="int32"),
                    "top_token_ratio": tr_out,
                    "top_bigram_ratio": br_out,
                    "repetitive": rep_out,
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, schema)


def bigram_counts(
    df: DataFrame, k: int = 50, text_col: str = "text"
) -> DataFrame:
    """Corpus-level top-k bigram counts (n-gram language-model stats).

    Bigram rows built row-locally by positional explode (index
    sequence exploded, then codegen'd element_at/concat — never a
    transform() lambda, which Catalyst evaluates interpreted), then
    ONE groupBy: partial aggregation combines map-side, so the
    shuffle carries distinct bigrams per partition, not raw token
    occurrences.  Deterministic (count desc, bigram asc) total order
    makes the top-k cut stable.
    """
    w = _toks(F.col(text_col))
    return (
        df.select(w.alias("_w"))
        .where(F.size("_w") >= 2)
        .select(
            "_w",
            F.explode(F.sequence(F.lit(1), F.size("_w") - 1)).alias("_i"),
        )
        .select(
            F.concat_ws(
                " ",
                F.element_at(F.col("_w"), F.col("_i")),
                F.element_at(F.col("_w"), F.col("_i") + 1),
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(k)
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean negative log2 probability under the corpus
    unigram LM — the classic perplexity-proxy quality signal (docs
    scoring far above the corpus mean are gibberish/outliers; far
    below are boilerplate).

    Shape: one explode → token counts (vocabulary-bounded shuffle),
    per-token logp joined back to the exploded relation (AQE
    broadcasts the LM when small; keyed equi-join otherwise), one
    per-doc aggregation.  The total-token scalar is driver model
    state, same posture as TF-IDF's N.  log2 is quantized to 6
    decimals in both engines (ULP portability), and the per-doc mean
    is an exact decimal sum over the quantized values divided by the
    token count — order-free, hash-stable.
    """
    tok = df.select(
        F.col(id_col), F.explode(_toks(F.col(text_col))).alias("t")
    )
    cnt = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    total = cnt.agg(F.sum("c")).first()[0]
    lm = cnt.select(
        "t",
        F.round(F.log2(F.col("c") / F.lit(float(total))), 6).alias("l"),
    )
    return (
        tok.join(lm, "t")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum((-F.col("l")).cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_neg_log2p"),
        )
    )


def _select_merge_batch(
    ranked: list, tail_bound: int, budget: int
) -> list[tuple[str, str, int]]:
    """Greedy exact-safe batch selection from one round's ranked pair
    counts (rows ordered by count desc, a, b).

    A batch of merges applied in ONE rewrite pass is bit-equal to
    applying them sequentially iff, scanning the ranked list in order,
    each accepted pair (a, b) is provably still the next sequential
    pick after the previously accepted merges.  Sufficient conditions
    maintained here:

    * symbol-disjointness — neither a nor b (nor the concatenation
      a+b) appears among any previously accepted pair's symbols or
      merged strings, so its count is invariant under them and the
      single left-to-right pass can't interleave rules;
    * dominance over creations — merging (a', b') only creates pairs
      of the form (x, a'b') or (a'b', y), whose counts are bounded by
      the CURRENT counts of (x, a') and (b', y).  We therefore track
      ``created_bound`` = the max count over all ranked pairs whose
      second element is some accepted a' or whose first element is
      some accepted b' (plus ``tail_bound`` for pairs below the
      collected horizon) and accept a later pair only while its count
      is STRICTLY above that bound (strictness also covers the
      (count, name) tie-break, whose name side we can't evaluate for
      not-yet-created symbols).

    The scan stops at the first unacceptable candidate — after it, the
    sequential order is no longer determined by this round's counts.
    The first candidate is always accepted, so every round commits at
    least one merge and the loop terminates in ≤ n_merges rounds.
    """
    sel: list[tuple[str, str, int]] = []
    used: set[str] = set()
    created_bound = -1
    for row in ranked:
        if len(sel) >= budget:
            break
        a, b, n = row["a"], row["b"], int(row["n"])
        if sel:
            if (
                a in used
                or b in used
                or (a + b) in used
                or n <= created_bound
            ):
                break
        sel.append((a, b, n))
        used.update((a, b, a + b))
        nb = tail_bound
        for r2 in ranked:
            n2 = int(r2["n"])
            # (a,b) itself is destroyed, not a creation bound — EXCEPT
            # for a self-pair (a==b), where (ab, y=b) is bounded by
            # count(b, y) = count(a, a) = n itself; including it makes
            # created_bound ≥ n and conservatively ends the batch.
            if (r2["b"] == a or r2["a"] == b) and not (
                r2["a"] == a and r2["b"] == b and a != b
            ):
                nb = max(nb, n2)
        created_bound = max(created_bound, nb)
    return sel


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 5,
    min_word_len: int = 2,
    batch_top: int = 64,
    stats: dict | None = None,
) -> list[tuple[int, str, str, int]]:
    """Byte-pair-encoding tokenizer training as a distributed job:
    returns the merge table [(rank, a, b, pair_count), ...].

    The classic BPE trick keeps all character work on the DISTINCT-
    word frequency table (|vocab| rows, not corpus tokens).  Each
    ROUND is (1) one distributed weighted pair-count collecting the
    top ``batch_top`` ranked pairs and (2) ONE map-only greedy
    left-to-right rewrite pass applying a whole BATCH of merges, so
    Spark-job count grows with rounds, not merges — a production
    30k-merge vocabulary is thousands of rounds, not 30k sequential
    jobs (VERDICT r4 item 3).  The batch is chosen by
    ``_select_merge_batch``, which accepts exactly the ranked prefix
    provably order-equivalent to sequential BPE (symbol-disjointness +
    strict dominance over any pair a merge could create), so the
    output is BIT-EQUAL to the one-merge-per-round trainer — pinned
    against a pure-Python sequential reference in tests at 50 merges.

    Driver state per round is ≤ batch_top (a, b, count) rows — the
    legitimate model-state collect (IVF-centroid precedent); the
    vocabulary never leaves the cluster.

    Determinism: merge selection orders by (count desc, a, b); the
    greedy rewrite is the reference BPE semantics (overlapping runs
    merge left-to-right: 'aaa' + (a,a) → ['aa','a']).

    At 100 TB the word-frequency table is the only corpus-sized
    shuffle (corpus → vocab collapse); every merge round then shuffles
    |vocab| pair rows.  ``stats``, if given, is filled with
    ``{"rounds": int}`` so callers can assert the sub-linear job
    profile.
    """
    words = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("w")
    )
    freq = (
        words.where(F.length("w") >= min_word_len)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    syms = freq.select(
        "f",
        F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        ).alias("s"),
    ).localCheckpoint()

    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        # words fully collapsed to one symbol have no pairs; filter them
        # (sequence(1, 0) is DESCENDING in Spark, not empty)
        pairs = syms.where(F.size("s") >= 2).select(
            "f",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(s) - 1), "
                    "i -> struct(element_at(s, i) AS a, "
                    "element_at(s, i + 1) AS b))"
                )
            ).alias("p"),
        )
        ranked = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("f").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(batch_top)
            .collect()
        )
        rounds += 1
        if not ranked:
            break
        # pairs below the collected horizon can count at most this much
        tail_bound = int(ranked[-1]["n"]) if len(ranked) == batch_top else 0
        batch = _select_merge_batch(
            ranked, tail_bound, n_merges - len(merges)
        )
        for a, b, n in batch:
            merges.append((len(merges) + 1, a, b, n))

        # one greedy left-to-right rewrite pass for the whole batch:
        # fold with a pending symbol; '' is the no-pending sentinel
        # (single chars are never empty).  Batch rules have pairwise-
        # distinct first symbols (symbol-disjointness), so at most one
        # rule matches any (pending, next) — the when-chain order is
        # immaterial.  Column-API lambdas (F.lit for the merge pair) —
        # no SQL-string interpolation, so quoted symbols are safe.
        init = F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit("").alias("prev"),
        )

        def _make_step(rules):
            # factory (not default args): pyspark reads the lambda's
            # parameter count, so the merge fn must be exactly (acc, x)
            def _step(acc, x):
                expr = None
                for a_i, b_i, _ in rules:
                    hit = (acc["prev"] == F.lit(a_i)) & (x == F.lit(b_i))
                    out = F.struct(
                        F.array_append(acc["out"], F.lit(a_i + b_i)).alias(
                            "out"
                        ),
                        F.lit("").alias("prev"),
                    )
                    expr = (
                        F.when(hit, out) if expr is None else expr.when(hit, out)
                    )
                return expr.when(
                    acc["prev"] == F.lit(""),
                    F.struct(acc["out"].alias("out"), x.alias("prev")),
                ).otherwise(
                    F.struct(
                        F.array_append(acc["out"], acc["prev"]).alias("out"),
                        x.alias("prev"),
                    )
                )

            return _step

        def _fin(acc):
            return F.when(acc["prev"] == F.lit(""), acc["out"]).otherwise(
                F.array_append(acc["out"], acc["prev"])
            )

        rewrite = F.aggregate(F.col("s"), init, _make_step(tuple(batch)), _fin)
        syms = syms.select("f", rewrite.alias("s")).localCheckpoint()
    if stats is not None:
        stats["rounds"] = rounds
    return merges


def bpe_train_reference(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Sequential pure-Python BPE (Sennrich et al. 2016 semantics:
    weighted pair counts over the word-frequency dict, greedy
    left-to-right rewrite, ties by (count desc, a, b)) — the
    gate-scale verification twin for the distributed ``bpe_train``.
    One merge per iteration BY CONSTRUCTION, so it pins the batched
    trainer's claim of sequential equivalence.  tests/ carry an
    independently-written copy of this reference, so the query gate
    and the pytest can't share a bug."""
    syms = {w: list(w) for w in word_freqs}
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, n))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def bpe_encode_word(word: str, merges: list[tuple[int, str, str, int]]) -> list[str]:
    """Encode ONE word with a trained merge table: apply each merge in
    rank order as a greedy left-to-right rewrite — exactly the
    training-time rewrite semantics (``bpe_train`` / Sennrich et al.
    2016 ``re.sub``-per-rule order), so encode(train-corpus) yields
    the same symbol sequences training ended with.  Pure Python; used
    inside the Arrow kernel of ``bpe_encode_counts`` (vocab-sized
    work) and as the driver-side verification twin."""
    s = list(word)
    for _, a, b, _ in merges:
        if len(s) < 2:
            break
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


def bpe_encode_counts(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained BPE merge table to a corpus; returns one row
    per document: ``(id_col, n_words, n_tokens)``.

    Scale shape (the encode-side twin of ``bpe_train``'s trick): the
    Python kernel runs ONLY over the DISTINCT-word table (|vocab|
    rows), never the corpus — each distinct word is encoded once by
    an Arrow ``pandas_udf`` carrying the broadcast merge table, then
    the per-word token count rides a corpus-sized JVM equi-join back
    onto ``(doc, word)`` and one keyed aggregation.  At 100 TB the
    corpus→vocab collapse is the only corpus-sized shuffle; the join
    is |corpus words| × slim ``(w, n_tok)`` and AQE broadcasts the
    vocab side when it fits.

    Word semantics match ``bpe_train``: ``split(trim(text), ' ')``;
    an all-spaces document yields one empty-string word, which
    encodes to 0 tokens.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rules = tuple(merges)

    @pandas_udf("int")
    def _ntok(words: pd.Series) -> pd.Series:
        return pd.Series(
            [len(bpe_encode_word("" if w is None else w, rules)) for w in words],
            dtype="int32",
        )

    by_doc = df.select(F.col(id_col), F.explode(_toks(F.col(text_col))).alias("w"))
    vocab = by_doc.select("w").distinct().select("w", _ntok("w").alias("n_tok"))
    return (
        by_doc.join(vocab, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
    )


GOPHER_STOPWORDS = ("the", "a", "of", "and", "to")


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher-style HARD quality rules (Rae et al. 2021, appendix A —
    the published heuristic filter battery; defaults are the paper's
    thresholds).  Distinct from ``quality_features``: that emits a
    blended soft score, this emits per-rule booleans + the conjunctive
    keep flag, which is what an auditable filtering pipeline actually
    records (why was this doc dropped?).

    Rules (each a named boolean column):
      * ``r_word_count``  — word count in [min_words, max_words];
      * ``r_mean_len``    — mean word length in [min_mean_len,
        max_mean_len] (chars net of single-space separators, exact
        integer arithmetic before the one final division);
      * ``r_alpha``       — ≥ min_alpha_frac of words contain an
        alphabetic character (counted by ``regexp_count`` over the
        trimmed text: pattern ``(^| )[^ ]*[A-Za-z]`` consumes at most
        one match per space-delimited word, so the count equals the
        number of words containing an alphabetic char — equivalent to
        filtering the token array but WITHOUT the interpreted
        higher-order-function lambda such a filter plans as);
      * ``r_stopwords``   — ≥ min_stop_hits DISTINCT required
        stopwords present (``array_intersect`` against a literal
        array — dedups both sides, JVM-side).

    One projection pass, no shuffle, no UDF: every signal is a
    Catalyst expression over the token array, so the filter runs at
    scan speed and composes with predicate pushdown upstream.
    ``carry_cols`` names extra input columns to pass through (e.g.
    provenance keys a downstream rollup groups by) — carried in the
    same projection, never a join-back.
    """
    toks = _toks(F.col(text_col))
    n = F.size(toks)
    n_d = n.cast("double")
    mean_len = (F.length(F.trim(F.col(text_col))).cast("double") - (n_d - 1)) / n_d
    n_alpha = F.regexp_count(
        F.trim(F.col(text_col)), F.lit("(^| )[^ ]*[A-Za-z]")
    )
    alpha_frac = n_alpha.cast("double") / n_d
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    r_wc = (n >= min_words) & (n <= max_words)
    r_ml = (mean_len >= min_mean_len) & (mean_len <= max_mean_len)
    r_al = alpha_frac >= min_alpha_frac
    r_sw = stop_hits >= min_stop_hits
    return df.select(
        id_col,
        *carry_cols,
        n.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.cast("long").alias("stop_hits"),
        r_wc.alias("r_word_count"),
        r_ml.alias("r_mean_len"),
        r_al.alias("r_alpha"),
        r_sw.alias("r_stopwords"),
        (r_wc & r_ml & r_al & r_sw).alias("keep"),
    )


def dsir_logweights(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how much more likely its hashed-bigram features are under a
    TARGET corpus than under the RAW corpus — the standard cheap
    proxy for "looks like the domain I want to train on".

    Construction (all keyed shuffles, scale-linear):

    1. bigram → bucket via the portable 56-bit md5 hash mod
       ``buckets`` (reproducible in any engine — oracle-checkable);
    2. bucket histograms of the raw corpus and of ``target`` (a
       subset relation, e.g. one language or source); Laplace +1
       smoothing so unseen buckets stay finite;
    3. per-bucket log-ratio lr_b = ln p_target(b) − ln p_raw(b),
       rounded to 6 dp in BOTH engines (transcendental ULP
       discipline) — a ≤``buckets``-row relation, broadcast;
    4. per-doc weight = Σ_b count_b(doc) · lr_b, accumulated as
       exact DECIMAL (count × 6-dp-quantized lr is exact), so the
       sum is order-free and hash-stable across partitionings.

    Emits (id, n_bigrams, log_weight).  Docs with < 2 tokens have no
    features and are absent (the resampling step treats them as
    weight −∞, i.e. never selected).
    """
    b_count = int(buckets)

    def _bigram_buckets(rel: DataFrame, with_id: bool) -> DataFrame:
        # positional explode, not a transform() lambda: HOF lambdas
        # run interpreted (~µs/element, 21× slower measured on the
        # k-gram hasher) — explode the index sequence and build the
        # bigram with codegen'd element_at/concat (VERDICT r7 item 3)
        cols = [id_col] if with_id else []
        exploded = (
            rel.select(*cols, _toks(F.col(text_col)).alias("_w"))
            .where(F.size("_w") >= 2)
            .select(
                *cols,
                "_w",
                F.explode(
                    F.sequence(F.lit(1), F.size("_w") - 1)
                ).alias("_i"),
            )
            .select(
                *cols,
                F.concat_ws(
                    " ",
                    F.element_at(F.col("_w"), F.col("_i")),
                    F.element_at(F.col("_w"), F.col("_i") + 1),
                ).alias("_bg"),
            )
        )
        bucket = F.pmod(
            F.conv(F.substring(F.md5(F.col("_bg")), 1, 14), 16, 10).cast(
                "long"
            ),
            F.lit(b_count),
        ).alias("bucket")
        return exploded.select(*cols, bucket)

    raw = _bigram_buckets(df, with_id=True)
    per_doc = raw.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    # raw-corpus histogram + total (tiny: ≤ buckets rows + 1), derived
    # from the per-doc relation rather than a second explode of the
    # corpus: Σ per-doc counts are the same integers, and the
    # histogram's shuffle input shrinks from the bigram volume to the
    # (doc, bucket)-distinct relation that the scorer shuffles anyway.
    # histograms are ≤buckets-row MODEL relations; checkpoint them so
    # the totals and log-ratio derivations don't re-plan the corpus
    # explode each (r9 plan audit: 5 documents scans → 2, the 2 being
    # the per-doc feature pass and the hist source — the floor
    # without materializing the corpus-sized (doc, bucket) relation)
    hist_raw = (
        per_doc.groupBy("bucket")
        .agg(F.sum("_cnt").alias("_ca"))
        .localCheckpoint()
    )
    tot_raw = hist_raw.agg(F.sum("_ca").alias("_A"))
    hist_tgt = (
        _bigram_buckets(target, with_id=False)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("_ct"))
        .localCheckpoint()
    )
    tot_tgt = hist_tgt.agg(F.sum("_ct").alias("_T"))
    lr_rel = (
        hist_raw.join(hist_tgt, "bucket", "left")
        .crossJoin(F.broadcast(tot_raw))
        .crossJoin(F.broadcast(tot_tgt))
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("_ct"), F.lit(0)) + 1).cast("double")
                    / (F.col("_T") + b_count).cast("double")
                )
                - F.log(
                    (F.col("_ca") + 1).cast("double")
                    / (F.col("_A") + b_count).cast("double")
                ),
                6,
            ).alias("_lr"),
        )
    )
    return (
        per_doc.join(F.broadcast(lr_rel), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("_cnt").alias("n_bigrams"),
            F.sum(
                F.col("_cnt").cast("decimal(18,0)")
                * F.col("_lr").cast("decimal(18,6)")
            )
            .cast("double")
            .alias("log_weight"),
        )
    )


# Rae et al. 2021 appendix A1: repetition-filter thresholds (fraction
# of characters).  2-4: top n-gram; 5-10: duplicated n-grams.
GOPHER_REP_THRESHOLDS = {
    2: 0.20, 3: 0.18, 4: 0.16,
    5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10,
}


def gopher_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 10),
    carry_cols: tuple = (),
) -> DataFrame:
    """Gopher repetition rules (Rae et al. 2021, appendix A1 — the
    n-gram half of the battery): per document,

      * ``top{n}_frac`` — fraction of characters covered by the single
        MOST FREQUENT word n-gram (count × chars of the space-joined
        gram / chars of the trimmed text), n ∈ top_ns;
      * ``dup{n}_frac`` — fraction of characters inside n-grams that
        occur MORE THAN ONCE (Σ over grams with count ≥ 2 of
        count × chars, capped at 1.0: overlapping occurrences
        double-count — the cheap published proxy, not exact positional
        coverage), n ∈ dup_ns;
      * ``keep`` — every fraction at or below its paper threshold
        (GOPHER_REP_THRESHOLDS).

    The paper's line/paragraph duplicate rules need line structure
    this corpus lacks (single-line documents); the n-gram half is the
    part that transfers, and complements gopher_rules (the hard
    quality rules) the way the paper composes them.

    Shape: one positional explode + two keyed shuffles per n
    ((doc, gram) count, then per-doc max/sum), all n stacked by union
    and pivoted in ONE final per-doc aggregation.  Grams come from
    the codegen positional-explode shape (operators/dedup.
    _positional_grams — never a transform() lambda).  Fractions are
    exact-integer mass ÷ exact-integer chars — a single IEEE
    division, identical across engines without rounding.
    """
    from functools import reduce

    from .dedup import _positional_grams

    bad = sorted(
        {n for n in (*top_ns, *dup_ns) if n not in GOPHER_REP_THRESHOLDS}
    )
    if bad:
        raise ValueError(
            f"gopher_repetition: no published threshold for n-gram "
            f"size(s) {bad}; supported n: "
            f"{min(GOPHER_REP_THRESHOLDS)}..{max(GOPHER_REP_THRESHOLDS)}"
        )
    ns = sorted(set(top_ns) | set(dup_ns))
    parts = []
    for n in ns:
        gram = F.concat_ws(" ", F.expr(f"slice(_w, pos, {n})"))
        per_gram = (
            _positional_grams(df, id_col, text_col, n)
            .select(F.col(id_col), gram.alias("_g"))
            .groupBy(id_col, "_g")
            .agg(F.count(F.lit(1)).alias("_c"))
            .select(
                F.col(id_col),
                F.col("_c"),
                (F.col("_c") * F.length("_g")).cast("long").alias("_mass"),
            )
        )
        parts.append(
            per_gram.groupBy(id_col)
            .agg(
                F.max("_mass").alias("_top"),
                F.sum(F.when(F.col("_c") >= 2, F.col("_mass")).otherwise(0))
                .cast("long")
                .alias("_dup"),
            )
            .select(F.col(id_col), F.lit(n).alias("_n"), "_top", "_dup")
        )
    stacked = reduce(lambda a, b: a.unionByName(b), parts)
    pivoted = stacked.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("_n") == n, F.col("_top"))).alias(f"_top{n}")
            for n in top_ns
        ],
        *[
            F.max(F.when(F.col("_n") == n, F.col("_dup"))).alias(f"_dup{n}")
            for n in dup_ns
        ],
    )
    nc = F.greatest(F.length(F.trim(F.col(text_col))), F.lit(1))
    base = df.select(
        F.col(id_col), *carry_cols, nc.cast("long").alias("n_chars")
    )
    j = base.join(pivoted, id_col, "left")
    out_cols, keep = [], F.lit(True)
    for n in top_ns:
        frac = (
            F.coalesce(F.col(f"_top{n}"), F.lit(0)).cast("double")
            / F.col("n_chars").cast("double")
        )
        out_cols.append(frac.alias(f"top{n}_frac"))
        keep = keep & (frac <= F.lit(GOPHER_REP_THRESHOLDS[n]))
    for n in dup_ns:
        frac = F.least(
            F.lit(1.0),
            F.coalesce(F.col(f"_dup{n}"), F.lit(0)).cast("double")
            / F.col("n_chars").cast("double"),
        )
        out_cols.append(frac.alias(f"dup{n}_frac"))
        keep = keep & (frac <= F.lit(GOPHER_REP_THRESHOLDS[n]))
    return j.select(
        F.col(id_col), *carry_cols, "n_chars", *out_cols, keep.alias("keep")
    )


def hashed_linear_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    scale: float = 4.0,
) -> DataFrame:
    """FastText-style linear quality-classifier INFERENCE, fully
    distributed: score(doc) = sigmoid(scale · mean over tokens of
    w[h(token) mod n_buckets]) — the hashed bag-of-words linear model
    every large pretraining pipeline runs for quality filtering
    (GPT-3's WebText classifier, CCNet's wiki-ref scorer, LLaMA's
    fastText gate).  The container ships no trained model, so the
    weight TABLE is a deterministic hash-derived stand-in
    (w[b] = ((b·2654435761) mod 2^20)/2^20 − ½ ∈ [−½, ½)); swapping in
    real trained weights is a broadcast-map substitution that changes
    none of the plan.

    Exactness contract: the token hash is the portable 56-bit md5
    prefix (identical in Spark `conv` and DuckDB hex-cast — the
    portable_hash pattern), the per-doc accumulation is an exact
    INTEGER sum of the 2^20-denominator numerators (order-free), and
    only the final mean/sigmoid runs in doubles, 6dp-rounded in both
    engines.

    Scale shape: one explode + one keyed sum per doc — the same single
    shuffle as token counting; the weight table is an EXPRESSION, not
    a join (a real model's table is a broadcast join against
    n_buckets rows, still shuffle-free).
    """
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("_w"),
    )
    h = F.conv(F.substring(F.md5(F.col("_w")), 1, 14), 16, 10).cast("long")
    bucket = F.pmod(h, F.lit(n_buckets))
    xw = (bucket * F.lit(2654435761)) % F.lit(1048576)
    agg = (
        tok.select(F.col(id_col), xw.alias("_x"))
        .groupBy(id_col)
        .agg(
            F.sum("_x").alias("_sx"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    s = (
        F.col("_sx").cast("double") / F.lit(1048576.0)
        - F.lit(0.5) * F.col("n_tokens").cast("double")
    ) / F.col("n_tokens").cast("double")
    score = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(F.lit(-scale) * s)), 6
    )
    return agg.select(
        F.col(id_col),
        F.col("n_tokens"),
        score.alias("clf_score"),
        (score >= F.lit(0.5)).alias("keep"),
    )
