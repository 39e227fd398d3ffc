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
