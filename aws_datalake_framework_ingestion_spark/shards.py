"""Training-shard materialization: deterministic token-budget shards
on disk + a digest manifest + idempotent re-runs.

This is the output end of a training-data pipeline — the step after
curation where the corpus becomes the artifact a trainer actually
reads.  The reference's contract at this boundary is "landed file +
run-ledger row" (ingestion/utils/dataIngestionUtils.py:117-118 lands
the extraction as a file, :234-249 records it in the catalog); here
the landed files are token-budget-packed shards and the ledger is a
manifest relation with one row per shard (doc count, token count,
content digest), so a trainer — or a re-run — can verify every shard
byte-for-byte without reading the corpus.

Determinism contract (what makes re-runs byte-identical):

* GLOBAL ORDER is md5(doc_id) — a pure function of the row, so the
  layout is reproducible across runs, partition counts, and engines
  (the same key ns_token_budget_pack / ns_fold_assign use).
* SHARD ASSIGNMENT is operators/text.token_budget_pack — a
  distributed prefix sum (range-partition → per-partition cumsum →
  broadcast offsets), never a single-task global window.
* FILE CONTENT is the shard's lines in (md5 key, doc_id) order; the
  text writer appends one ``\\n`` per line, so the file bytes equal
  the concatenation the manifest digests.
* FILE NAMES are ``shard_id=K/data.txt`` — Spark's task-uuid part
  names are renamed to a canonical name during publish (the same
  O(#files) driver-side metadata finalize a FileOutputCommitter v1
  commit performs; on object stores this is the manifest-commit step,
  SCALING.md §"Object-store (S3A) semantics").

Scale shape: one corpus-sized equi-join (assignment → text, on
doc_id) + one hash shuffle on shard_id + one keyed aggregation for
the manifest.  Every shard's rows hash to ONE task, so each shard is
written by exactly one writer in one ordered pass; shard size is
bounded by the token budget, so no task is ever corpus-sized.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifest"


def shard_lines(df: DataFrame, budget: int = 2048) -> DataFrame:
    """(shard_id, _k, doc_id, n_tokens, line): token-budget shard
    assignment plus the exact text line each doc contributes.

    ``line`` is ``{doc_id}\\t{text}`` WITHOUT a trailing newline —
    the text writer appends it, and the manifest digest re-adds it —
    so file bytes and digest basis stay one definition.

    A doc whose text contains ``\\n``/``\\r`` would silently break the
    one-line-per-doc file format (the bytes would still match the
    manifest, but validate_shards re-parses SPLIT lines and reports a
    false 'corrupt', and a line-oriented trainer reads fragments), so
    such a doc raises at write time via ``raise_error`` — loud at the
    source, not masquerading as corruption at audit time.
    """
    from .operators.text import token_budget_pack

    packed = token_budget_pack(df, budget=budget)
    text_guarded = F.when(
        F.col("text").rlike("[\\n\\r]"),
        F.raise_error(
            F.concat(
                F.lit("shard_lines: doc "),
                F.col("doc_id").cast("string"),
                F.lit(" contains a newline; escape or strip it before sharding"),
            )
        ),
    ).otherwise(F.col("text"))
    return (
        packed.join(df.select("doc_id", "text"), "doc_id")
        .select(
            F.col("batch_id").alias("shard_id"),
            F.md5(F.col("doc_id").cast("string")).alias("_k"),
            "doc_id",
            "n_tokens",
            F.concat(
                F.col("doc_id").cast("string"), F.lit("\t"), text_guarded
            ).alias("line"),
        )
    )


def shard_manifest(lines: DataFrame) -> DataFrame:
    """Manifest relation over ``shard_lines`` output: one row per
    shard — (shard_id, n_docs, n_tokens, content_digest) where
    content_digest = md5 of the shard file's exact bytes (lines in
    (_k, doc_id) order, each newline-terminated).

    The ordered in-group concat is array_sort(collect_list(struct)) —
    safe because a shard is token-budget-bounded (a few KB), never
    corpus-sized; the digest makes the manifest self-verifying against
    the files and is md5-expressible in ANSI SQL for the oracle.
    """
    return (
        lines.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("_k"), F.col("doc_id"), F.col("line")
                                )
                            )
                        ),
                        lambda e: F.concat(e["line"], F.lit("\n")),
                    ),
                    "",
                )
            ).alias("content_digest"),
        )
    )


def materialize_shards(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    budget: int = 2048,
) -> DataFrame:
    """Write token-budget training shards + manifest under ``out_dir``
    and return the manifest DataFrame.

    Layout::

        out_dir/shard_id=K/data.txt     one file per shard, lines in
                                        (md5 key, doc_id) order
        out_dir/_manifest/*.parquet     (shard_id, n_docs, n_tokens,
                                        content_digest)

    Idempotent: re-running over the same input rewrites byte-identical
    shard files (deterministic order, deterministic content, canonical
    names) and an identical manifest; publication is staged + swapped
    so readers never see a partial corpus (sources/files.staged_swap —
    the catalog._rewrite single-writer contract).
    """
    from .sources.files import _fs, staged_swap

    import uuid

    lines = shard_lines(docs, budget=budget)
    # One task owns ALL rows of a shard (hash on shard_id), rows
    # sorted within the task so each file is written in final order.
    # Staging name is `{out_dir}.{hex8}` — the SAME sibling pattern
    # every other writer uses, so a crash mid-materialization leaves
    # an orphan that vacuum_orphans (sources/files.py) reaps; a
    # bespoke `.stage.` name would escape the reaper's contract.
    staging = f"{out_dir.rstrip('/')}.{uuid.uuid4().hex[:8]}"
    (
        lines.repartition("shard_id")
        .sortWithinPartitions("shard_id", "_k", "doc_id")
        .select(F.col("shard_id"), F.col("line").alias("value"))
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .text(staging)
    )
    # Canonical file names: rename each shard's single part file to
    # data.txt.  O(#shards) driver-side FS metadata ops — the same
    # cost class as the committer's own finalize; at very large shard
    # counts this loop IS the manifest commit and runs against the FS
    # metadata tier, not the data path.
    fs, jvm = _fs(spark, staging)
    P = jvm.org.apache.hadoop.fs.Path
    for st in fs.listStatus(P(staging)):
        name = st.getPath().getName()
        if not name.startswith("shard_id="):
            continue
        for f in fs.listStatus(st.getPath()):
            fname = f.getPath().getName()
            if fname.startswith("part-"):
                dst = P(posixpath.join(st.getPath().toString(), "data.txt"))
                # Hadoop rename returns false instead of raising; a
                # silent false would publish a corpus violating the
                # shard_id=K/data.txt layout contract.
                if not fs.rename(f.getPath(), dst):
                    raise IOError(
                        f"materialize_shards: could not rename {fname} "
                        f"-> {dst} (pre-existing target or FS refusal)"
                    )
    manifest = shard_manifest(lines)
    manifest.coalesce(1).write.mode("overwrite").parquet(
        posixpath.join(staging, MANIFEST_DIR)
    )
    staged_swap(spark, out_dir, staging)
    return spark.read.parquet(posixpath.join(out_dir, MANIFEST_DIR))


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    """The manifest of a published shard corpus (shard_id, n_docs,
    n_tokens, content_digest)."""
    return spark.read.parquet(posixpath.join(out_dir, MANIFEST_DIR))


def validate_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    """Audit a materialized shard corpus against its manifest —
    the claim-check verification a trainer (or a resumed writer) runs
    before trusting the artifact.

    Reads every shard file back (text source with partition discovery
    on ``shard_id=``), recomputes each shard's content digest from the
    PARSED lines — layout order (md5-of-doc_id, doc_id) is a pure
    function of the content, so the digest is reproducible even
    though a parallel text scan returns lines unordered — and
    full-outer-joins against the manifest:

    ==========  ====================================================
    status      meaning
    ==========  ====================================================
    ok          file digest == manifest digest
    corrupt     both sides present, digests differ (also covers a
                doc-count drift)
    missing     manifest row with no file on disk
    orphan      file on disk with no manifest row
    ==========  ====================================================

    Layering note: BIT-ROT on a checksummed filesystem (HDFS, Hadoop
    LocalFileSystem) never reaches this audit — the FS's own crc layer
    throws on read, which is the correct loud failure.  The digest
    audit covers what the FS cannot see: bytes that are valid to the
    FS but wrong for the corpus (a truncated or re-ordered rewrite, a
    stale shard from an older run, a file swapped between shards).

    Scale shape: one distributed text scan + the same budget-bounded
    keyed digest agg as shard_manifest + one tiny (#shards) join.
    """
    manifest = spark.read.parquet(posixpath.join(out_dir, MANIFEST_DIR))
    lines = (
        spark.read.option("basePath", out_dir)
        .text(posixpath.join(out_dir, "shard_id=*"))
        .select(
            F.col("shard_id").cast("long").alias("shard_id"),
            # try_cast: a malformed line (corruption) must surface as
            # a digest mismatch, not an ANSI cast error mid-audit
            F.substring_index(F.col("value"), "\t", 1)
            .try_cast("long")
            .alias("doc_id"),
            F.col("value"),
        )
        .withColumn("_k", F.md5(F.col("doc_id").cast("string")))
    )
    observed = lines.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("obs_docs"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("_k"), F.col("doc_id"), F.col("value"))
                        )
                    ),
                    lambda e: F.concat(e["value"], F.lit("\n")),
                ),
                "",
            )
        ).alias("obs_digest"),
    )
    j = manifest.join(observed, "shard_id", "full_outer")
    status = (
        F.when(F.col("content_digest").isNull(), F.lit("orphan"))
        .when(F.col("obs_digest").isNull(), F.lit("missing"))
        .when(F.col("obs_digest") == F.col("content_digest"), F.lit("ok"))
        .otherwise(F.lit("corrupt"))
    )
    return j.select(
        "shard_id",
        status.alias("status"),
        "n_docs",
        "obs_docs",
        "content_digest",
        "obs_digest",
    )
