"""Crash-resumable ledgered curation pipeline (curation.run_curation):
end-to-end run, per-stage ledger contract, kill-between-stages resume
to byte-identical shards, mid-stage partial overwrite, spec-drift
guard, failed-stage recording."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from aws_datalake_framework_ingestion_spark import curation as C
from aws_datalake_framework_ingestion_spark.catalog import Catalog
from aws_datalake_framework_ingestion_spark.shards import validate_shards
from aws_datalake_framework_ingestion_spark.tables import load

SF = "/root/testdata/sf0.001"

SPEC = dict(
    lang="en",
    min_words=20,
    min_mean_len=4.0,
    probe_prefix="05",
    sample_prefix="c0",
    shard_budget=1024,
)

ALL_STAGES = [n for n, _ in C.STAGES] + [C.FINAL_STAGE]


def _docs(spark):
    return load(spark, SF, "documents")


def _shard_bytes(shard_dir: str) -> dict[str, str]:
    out = {}
    for d in sorted(os.listdir(shard_dir)):
        if not d.startswith("shard_id="):
            continue
        p = os.path.join(shard_dir, d, "data.txt")
        out[d] = hashlib.md5(open(p, "rb").read()).hexdigest()
    return out


def test_run_curation_end_to_end(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    spec = C.CurationSpec(run_id="r1", **SPEC)
    res = C.run_curation(cat, spec, _docs(spark), str(tmp_path / "work"))
    assert res["stages_run"] == ALL_STAGES
    assert res["stages_skipped"] == []

    led = (
        cat.read(C.LEDGER_TABLE)
        .where(F.col("run_id") == "r1")
        .orderBy("stage")
        .collect()
    )
    assert [r["name"] for r in led] == ALL_STAGES
    assert all(r["status"] == "succeeded" for r in led)
    # funnel: monotone non-increasing doc counts, nothing degenerate
    doc_stages = led[:-1]
    assert all(r["n_out"] <= r["n_in"] for r in doc_stages)
    assert all(r["n_out"] > 0 for r in doc_stages)
    assert any(r["n_out"] < r["n_in"] for r in doc_stages)
    # stage chaining: n_in of stage k+1 == n_out of stage k
    for a, b in zip(led, led[1:]):
        assert b["n_in"] == a["n_out"]
    # published corpus passes its own audit
    audit = validate_shards(spark, res["shard_dir"])
    assert audit.where(F.col("status") != "ok").count() == 0
    assert res["manifest"].count() == led[-1]["n_out"] > 0


def test_crash_between_stages_resumes_byte_identical(spark, tmp_path):
    docs = _docs(spark)
    # reference run, never interrupted
    cat_a = Catalog(spark, str(tmp_path / "cat_a"))
    spec_a = C.CurationSpec(run_id="ref", **SPEC)
    res_a = C.run_curation(cat_a, spec_a, docs, str(tmp_path / "work_a"))

    # interrupted run: die right after dedup_canonical commits
    cat_b = Catalog(spark, str(tmp_path / "cat_b"))
    spec_b = C.CurationSpec(run_id="crashy", **SPEC)

    class Boom(RuntimeError):
        pass

    def die_after(name):
        if name == "dedup_canonical":
            raise Boom(name)

    with pytest.raises(Boom):
        C.run_curation(
            cat_b, spec_b, docs, str(tmp_path / "work_b"),
            on_stage_complete=die_after,
        )

    # resume: committed stages are SKIPPED (not recomputed), the rest run
    res_b = C.run_curation(cat_b, spec_b, docs, str(tmp_path / "work_b"))
    assert res_b["stages_skipped"] == [
        "gopher_rules", "lang_filter", "dedup_canonical"
    ]
    assert res_b["stages_run"] == ["contamination", "sample", "shards"]

    # ledger is complete and every stage is committed exactly once
    led = (
        cat_b.read(C.LEDGER_TABLE)
        .where((F.col("run_id") == "crashy") & (F.col("status") == "succeeded"))
        .collect()
    )
    assert sorted(r["name"] for r in led) == sorted(ALL_STAGES)

    # byte-identical shards: same manifest digests AND same file bytes
    man = lambda r: sorted(  # noqa: E731
        map(tuple, r["manifest"].select(
            "shard_id", "n_docs", "n_tokens", "content_digest").collect())
    )
    assert man(res_b) == man(res_a)
    assert _shard_bytes(res_b["shard_dir"]) == _shard_bytes(res_a["shard_dir"])


def test_resume_from_different_work_root_reads_ledger_paths(spark, tmp_path):
    """work_root is NOT part of the spec fingerprint, so a resume may
    legitimately be launched with a different work_root (e.g. a new
    driver host mounting the same catalog + object store).  Every
    committed stage — INCLUDING the final shards stage — must be read
    back from the ledger's recorded out_path, not recomputed from the
    new work_root."""
    docs = _docs(spark)
    cat = Catalog(spark, str(tmp_path / "cat"))
    spec = C.CurationSpec(run_id="moved", **SPEC)
    res_a = C.run_curation(cat, spec, docs, str(tmp_path / "work_old"))
    # resume the fully-committed run from a brand-new work_root: all
    # stages skip, and the returned shard_dir is the ORIGINAL publish
    # location from the ledger (work_new contains nothing)
    res_b = C.run_curation(cat, spec, docs, str(tmp_path / "work_new"))
    assert res_b["stages_run"] == []
    assert res_b["stages_skipped"] == ALL_STAGES
    assert res_b["shard_dir"] == res_a["shard_dir"]
    assert not (tmp_path / "work_new").exists()
    man = lambda r: sorted(  # noqa: E731
        map(tuple, r["manifest"].select(
            "shard_id", "n_docs", "n_tokens", "content_digest").collect())
    )
    assert man(res_b) == man(res_a)


def test_mid_stage_crash_partial_output_is_overwritten(spark, tmp_path):
    """A crash DURING a stage leaves a partial directory and no ledger
    row; the rerun must recompute the stage over the garbage."""
    work = tmp_path / "work"
    partial = work / "r2" / "stage01_gopher_rules"
    partial.mkdir(parents=True)
    (partial / "part-00000.parquet").write_bytes(b"not parquet")
    cat = Catalog(spark, str(tmp_path / "cat"))
    spec = C.CurationSpec(run_id="r2", **SPEC)
    res = C.run_curation(cat, spec, _docs(spark), str(work))
    assert res["stages_run"] == ALL_STAGES
    audit = validate_shards(spark, res["shard_dir"])
    assert audit.where(F.col("status") != "ok").count() == 0


def test_spec_drift_on_resume_raises(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    spec = C.CurationSpec(run_id="r3", **SPEC)

    class Boom(RuntimeError):
        pass

    def die(name):
        raise Boom(name)

    with pytest.raises(Boom):
        C.run_curation(
            cat, spec, _docs(spark), str(tmp_path / "work"),
            on_stage_complete=die,
        )
    drifted = C.CurationSpec(run_id="r3", **{**SPEC, "sample_prefix": "40"})
    with pytest.raises(ValueError, match="different spec"):
        C.run_curation(cat, drifted, _docs(spark), str(tmp_path / "work"))


def test_failed_stage_records_ledger_row(spark, tmp_path, monkeypatch):
    cat = Catalog(spark, str(tmp_path / "cat"))
    spec = C.CurationSpec(run_id="r4", **SPEC)

    def boom(spec, docs):
        raise RuntimeError("stage exploded")

    monkeypatch.setattr(
        C, "STAGES", (("gopher_rules", boom),) + C.STAGES[1:]
    )
    with pytest.raises(RuntimeError, match="stage exploded"):
        C.run_curation(cat, spec, _docs(spark), str(tmp_path / "work"))
    led = cat.read(C.LEDGER_TABLE).where(F.col("run_id") == "r4").collect()
    assert len(led) == 1
    assert (led[0]["name"], led[0]["status"]) == ("gopher_rules", "failed")


# --------------------------------------------------------------------------
# Incremental (delta-batch) curation — run_curation_incremental
# --------------------------------------------------------------------------


def _inc_spec(run_id):
    return C.CurationSpec(run_id=run_id, **SPEC)


def test_incremental_three_batches_funnel_and_segments(spark, tmp_path):
    docs = _docs(spark)
    cat = Catalog(spark, str(tmp_path / "cat"))
    spec = _inc_spec("i1")
    store = str(tmp_path / "store")
    funnels = {}
    for b in range(3):
        res = C.run_curation_incremental(
            cat, spec, docs.where(F.col("doc_id") % 3 == b), store, b
        )
        assert not res["replayed"]
        funnels[b] = res["funnel"]
    for b, fn in funnels.items():
        names = [n for _, n, _, _ in fn]
        assert names == list(C.INC_STAGES)
        # chain invariant within the batch: n_in(k+1) == n_out(k)
        for (s1, _, _, o1), (s2, _, i2, _) in zip(fn, fn[1:]):
            assert s2 == s1 + 1 and i2 == o1
        assert fn[0][2] > fn[-1][3] >= 0  # the funnel actually narrows
    # the published corpus is the union of batch segments with no sig
    # ever appearing twice (first-seen-wins held across batches)
    corpus = spark.read.option("basePath", f"{store}/corpus").parquet(
        f"{store}/corpus/v=*"
    )
    assert corpus.count() == sum(fn[-1][3] for fn in funnels.values())
    assert corpus.select("sig").distinct().count() == corpus.count()


def test_incremental_replay_is_noop_with_same_funnel(spark, tmp_path):
    docs = _docs(spark)
    cat = Catalog(spark, str(tmp_path / "cat"))
    spec = _inc_spec("i2")
    store = str(tmp_path / "store")
    b0 = docs.where(F.col("doc_id") % 3 == 0)
    first = C.run_curation_incremental(cat, spec, b0, store, 0)
    segs_before = sorted(os.listdir(f"{store}/corpus"))
    again = C.run_curation_incremental(cat, spec, b0, store, 0)
    assert again["replayed"] and again["funnel"] == first["funnel"]
    assert sorted(os.listdir(f"{store}/corpus")) == segs_before
    # exactly one ledger row per stage
    led = cat.read(C.LEDGER_TABLE).where(F.col("run_id") == "i2@b000")
    assert led.count() == len(C.INC_STAGES)


def test_incremental_crash_before_ledger_heals_without_double_publish(
    spark, tmp_path, monkeypatch
):
    """Crash between segment publish and the atomic ledger append: the
    re-run must detect its own committed segment, skip the write, and
    commit the SAME funnel."""
    docs = _docs(spark)
    cat = Catalog(spark, str(tmp_path / "cat"))
    spec = _inc_spec("i3")
    store = str(tmp_path / "store")
    b0 = docs.where(F.col("doc_id") % 3 == 0)

    real_insert = Catalog.insert

    class Boom(RuntimeError):
        pass

    def exploding_insert(self, table, rows):
        if table == C.LEDGER_TABLE and rows and rows[0]["run_id"].startswith(
            "i3@"
        ):
            raise Boom("die before ledger commit")
        return real_insert(self, table, rows)

    monkeypatch.setattr(Catalog, "insert", exploding_insert)
    with pytest.raises(Boom):
        C.run_curation_incremental(cat, spec, b0, store, 0)
    monkeypatch.setattr(Catalog, "insert", real_insert)
    segs_after_crash = sorted(os.listdir(f"{store}/corpus"))
    res = C.run_curation_incremental(cat, spec, b0, store, 0)
    assert not res["replayed"]
    assert sorted(os.listdir(f"{store}/corpus")) == segs_after_crash
    led = cat.read(C.LEDGER_TABLE).where(
        (F.col("run_id") == "i3@b000") & (F.col("status") == "succeeded")
    )
    assert led.count() == len(C.INC_STAGES)


def test_incremental_spec_drift_raises(spark, tmp_path):
    docs = _docs(spark)
    cat = Catalog(spark, str(tmp_path / "cat"))
    store = str(tmp_path / "store")
    C.run_curation_incremental(
        cat, _inc_spec("i4"), docs.where(F.col("doc_id") % 3 == 0), store, 0
    )
    drifted = C.CurationSpec(run_id="i4", **{**SPEC, "sample_prefix": "40"})
    with pytest.raises(ValueError, match="different spec"):
        C.run_curation_incremental(
            cat, drifted, docs.where(F.col("doc_id") % 3 == 1), store, 1
        )


def test_incremental_registry_blocks_content_dropped_by_sampling(
    spark, tmp_path
):
    """The novelty registry records every post-lang sig — content whose
    batch-0 carrier was dropped at the SAMPLING stage must still be
    blocked when it reappears in batch 1 under a new doc_id (content
    decisions are never re-rolled)."""
    import hashlib as _h

    # 25 words, mean word length 137/25 = 5.48 (gopher 4.0-10.0 band),
    # all-alpha, two distinct en stop markers {the, and}
    text = (
        "the brave hunter walks through dense forest trails and finds "
        "hidden golden treasure beneath ancient stones while birds watch "
        "quietly above the misty valley floor"
    )
    # pick ids: batch-0 carrier NOT sampled (md5 >= 'c0', not a probe),
    # batch-1 twin WOULD be sampled (md5 < 'c0', not a probe)
    def pick(pred):
        i = 0
        while True:
            h = _h.md5(str(i).encode()).hexdigest()[:2]
            if pred(h):
                return i
            i += 1

    id0 = pick(lambda h: h >= "c0")  # dropped by sampling in batch 0
    id1 = pick(lambda h: "05" <= h < "c0")  # would survive sampling
    rows = [(id0, text, len(text)), (id1, text + " ", len(text) + 1)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars int")
    cat = Catalog(spark, str(tmp_path / "cat"))
    spec = _inc_spec("i5")
    store = str(tmp_path / "store")
    f0 = C.run_curation_incremental(
        cat, spec, docs.where(F.col("doc_id") == id0), store, 0
    )["funnel"]
    f1 = C.run_curation_incremental(
        cat, spec, docs.where(F.col("doc_id") == id1), store, 1
    )["funnel"]
    # batch 0: doc passes gopher+lang+dedup, dies at sample
    assert [r[3] for r in f0] == [1, 1, 1, 1, 0, 0]
    # batch 1: same token set -> blocked at dedup_novel despite never
    # having been published
    assert [r[3] for r in f1] == [1, 1, 0, 0, 0, 0]


def test_incremental_failed_stage_records_ledger_row(
    spark, tmp_path, monkeypatch
):
    """A stage failure inside a batch records ONE failed ledger row
    naming the stage (run_curation's fail-fast contract) and re-raises."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    spec = _inc_spec("i6")

    def boom(spec, docs):
        raise RuntimeError("lang stage exploded")

    monkeypatch.setattr(C, "_stage_lang", boom)
    with pytest.raises(RuntimeError, match="lang stage exploded"):
        C.run_curation_incremental(
            cat, spec, _docs(spark).where(F.col("doc_id") % 3 == 0),
            str(tmp_path / "store"), 0,
        )
    led = cat.read(C.LEDGER_TABLE).where(F.col("run_id") == "i6@b000").collect()
    assert len(led) == 1
    assert (led[0]["name"], led[0]["status"]) == ("lang_filter", "failed")


def test_incremental_registry_drift_after_crash_raises(spark, tmp_path):
    """A batch that crashed after registering its sigs but before the
    ledger commit must NOT silently accept a CHANGED batch input on
    re-run: the recomputed registry rows are digest-compared against
    the committed segment and any drift raises."""
    docs = _docs(spark)
    cat = Catalog(spark, str(tmp_path / "cat"))
    spec = _inc_spec("i7")
    store = str(tmp_path / "store")
    b0 = docs.where(F.col("doc_id") % 3 == 0)

    real = C.Catalog.insert

    class Boom(RuntimeError):
        pass

    def exploding_insert(self, table, rows):
        if table == C.LEDGER_TABLE and rows and rows[0]["run_id"].startswith(
            "i7@"
        ) and rows[0]["status"] == "succeeded":
            raise Boom("die before ledger commit")
        return real(self, table, rows)

    import unittest.mock as _mock

    with _mock.patch.object(Catalog, "insert", exploding_insert):
        with pytest.raises(Boom):
            C.run_curation_incremental(cat, spec, b0, store, 0)
    # re-run with a DIFFERENT batch input: drop one doc whose sig is
    # UNIQUE within the batch (dropping one copy of a duplicated token
    # set, or a doc gopher/lang filtered out, would leave the
    # registered DISTINCT sig set unchanged)
    sigged = C._stage_lang(spec, C._stage_gopher(spec, b0)).withColumn(
        "_s", C._sig()
    )
    unique_doc = (
        sigged.groupBy("_s")
        .agg(F.count(F.lit(1)).alias("c"), F.min("doc_id").alias("d"))
        .where(F.col("c") == 1)
        .agg(F.max("d"))
        .first()[0]
    )
    assert unique_doc is not None
    drifted = b0.where(F.col("doc_id") != unique_doc)
    with pytest.raises(RuntimeError, match="changed under a committed"):
        C.run_curation_incremental(cat, spec, drifted, store, 0)
    # the honest re-run with the ORIGINAL input heals cleanly
    res = C.run_curation_incremental(cat, spec, b0, store, 0)
    assert not res["replayed"]


def test_incremental_stores_survive_compaction(spark, tmp_path):
    """The incremental pipeline's append-only stores (sig registry,
    probe registry, curated corpus) accrete one segment per batch —
    after shard_append.compact_corpus + vacuum_corpus folds their
    history behind the _BASE commit, the pipeline must behave
    IDENTICALLY: later batches still dedup against compacted sigs,
    scrub against compacted probes, and the corpus reads complete."""
    from aws_datalake_framework_ingestion_spark.streaming.shard_append import (
        compact_corpus,
        read_corpus,
        vacuum_corpus,
    )

    docs = _docs(spark)
    cat = Catalog(spark, str(tmp_path / "cat"))
    spec = _inc_spec("i8")
    store = str(tmp_path / "store")
    for b in range(2):
        C.run_curation_incremental(
            cat, spec, docs.where(F.col("doc_id") % 3 == b), store, b
        )
    pre = sorted(
        map(tuple, read_corpus(spark, f"{store}/corpus")
            .select("doc_id", "sig", "batch").collect())
    )
    for sub in ("corpus", "sigs", "probes"):
        assert compact_corpus(spark, f"{store}/{sub}")["compacted"]
        vacuum_corpus(spark, f"{store}/{sub}", tmp_ttl_ms=0, retain_ms=0)
    assert sorted(
        map(tuple, read_corpus(spark, f"{store}/corpus")
            .select("doc_id", "sig", "batch").collect())
    ) == pre
    # batch 2 runs against the COMPACTED registries: content already
    # seen in batches 0/1 must still be blocked, novel content kept
    f2 = C.run_curation_incremental(
        cat, spec, docs.where(F.col("doc_id") % 3 == 2), store, 2
    )["funnel"]
    n2_lang, n2_novel = f2[1][3], f2[2][3]
    assert 0 < n2_novel < n2_lang  # dedup did drop cross-batch dups
    corpus = read_corpus(spark, f"{store}/corpus")
    assert corpus.select("sig").distinct().count() == corpus.count()
    # and batch 2's segment is LIVE (published past the compaction
    # high-water mark), proving append-after-compact numbering
    assert corpus.where(F.col("batch") == 2).count() == f2[-1][3]
