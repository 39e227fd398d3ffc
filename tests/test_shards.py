"""Training-shard materialization (shards.py): byte-identical
idempotent re-runs, manifest-digest = file-bytes, deterministic
layout.  VERDICT r9 item 2."""

from __future__ import annotations

import glob
import hashlib
import os

from pyspark.sql import functions as F

from aws_datalake_framework_ingestion_spark.plans._util import T
from aws_datalake_framework_ingestion_spark.shards import (
    materialize_shards,
    shard_lines,
)

SF = "/root/testdata/sf0.001"


def _read_shards(out_dir: str) -> dict[int, bytes]:
    """shard_id -> file bytes; asserts exactly one data file per dir."""
    shards: dict[int, bytes] = {}
    for d in sorted(glob.glob(os.path.join(out_dir, "shard_id=*"))):
        sid = int(d.rsplit("=", 1)[1])
        files = [
            f
            for f in os.listdir(d)
            if not f.startswith((".", "_")) and not f.endswith(".crc")
        ]
        assert files == ["data.txt"], f"{d}: {files}"
        with open(os.path.join(d, files[0]), "rb") as fh:
            shards[sid] = fh.read()
    return shards


def test_materialize_shards_idempotent_and_digest_verified(spark, tmp_path):
    docs = T(spark, SF, "documents")
    out1 = str(tmp_path / "corpus_a")
    out2 = str(tmp_path / "corpus_b")

    m1 = {
        r["shard_id"]: r
        for r in materialize_shards(spark, docs, out1, budget=2048).collect()
    }
    s1 = _read_shards(out1)

    # every shard present in the manifest, and the manifest digest IS
    # the md5 of the file bytes (self-verifying artifact)
    assert sorted(m1) == sorted(s1)
    assert len(s1) >= 2  # non-vacuous: multiple shards at this budget
    for sid, data in s1.items():
        assert m1[sid]["content_digest"] == hashlib.md5(data).hexdigest()
        assert m1[sid]["n_docs"] == data.count(b"\n")

    # token/doc accounting matches the assignment relation exactly
    lines = shard_lines(docs, budget=2048)
    agg = {
        r["shard_id"]: (r["nd"], r["nt"])
        for r in lines.groupBy("shard_id")
        .agg(F.count("*").alias("nd"), F.sum("n_tokens").alias("nt"))
        .collect()
    }
    for sid in m1:
        assert (m1[sid]["n_docs"], m1[sid]["n_tokens"]) == agg[sid]

    # RE-RUN to a different directory: byte-identical shards
    materialize_shards(spark, docs, out2, budget=2048)
    s2 = _read_shards(out2)
    assert s1 == s2

    # RE-RUN over the SAME directory (the production re-execution):
    # staged swap republishes byte-identical files and manifest
    m1b = {
        r["shard_id"]: r
        for r in materialize_shards(spark, docs, out1, budget=2048).collect()
    }
    assert _read_shards(out1) == s1
    assert {k: v["content_digest"] for k, v in m1b.items()} == {
        k: v["content_digest"] for k, v in m1.items()
    }


def test_shard_lines_order_is_layout_order(spark):
    """File order contract: lines sort by (md5-of-id, doc_id) — the
    same order the oracle's global window uses."""
    docs = T(spark, SF, "documents")
    rows = (
        shard_lines(docs, budget=2048)
        .orderBy("_k", "doc_id")
        .select("shard_id")
        .collect()
    )
    sids = [r["shard_id"] for r in rows]
    # shard ids are non-decreasing along the layout order: packing is
    # contiguous, so a shard is one contiguous byte range of the corpus
    assert sids == sorted(sids)


def test_shard_lines_rejects_newline_docs(spark, tmp_path):
    """ADVICE r10: a doc with an embedded newline must fail LOUDLY at
    write time — not pass the digest check and then read as a false
    'corrupt' in validate_shards (the bytes match the manifest, but
    the one-line-per-doc format is broken)."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "fine text"), (2, "broken\nline")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="contains a newline"):
        materialize_shards(spark, docs, str(tmp_path / "c"), budget=64)


def test_crashed_shard_staging_is_vacuumable(spark, tmp_path, monkeypatch):
    """ADVICE r10 (medium): a materialization that crashes before the
    staged swap must leave an orphan that vacuum_orphans reaps — the
    staging name follows the `{out}.{hex8}` sibling pattern, not a
    bespoke one the reaper never matches."""
    from aws_datalake_framework_ingestion_spark.sources import files as sf

    docs = T(spark, SF, "documents")
    out = str(tmp_path / "corpus")

    def boom(*a, **k):
        raise RuntimeError("injected crash before publish")

    monkeypatch.setattr(sf, "staged_swap", boom)
    try:
        materialize_shards(spark, docs, out, budget=2048)
        raise AssertionError("expected injected crash")
    except RuntimeError:
        pass
    monkeypatch.undo()

    orphans = [
        d for d in os.listdir(tmp_path) if d.startswith("corpus.")
    ]
    assert len(orphans) == 1  # the crashed staging survived the crash
    removed = sf.vacuum_orphans(spark, out, retention_sec=0)
    assert len(removed) == 1 and orphans[0] in removed[0]
    assert not any(d.startswith("corpus.") for d in os.listdir(tmp_path))


def test_validate_shards_detects_corruption_missing_orphan(spark, tmp_path):
    """The claim-check audit: after a clean materialization every
    shard is ok; a byte flipped in one file reads corrupt, a deleted
    file reads missing, a fabricated shard dir reads orphan."""
    from aws_datalake_framework_ingestion_spark.shards import (
        materialize_shards,
        validate_shards,
    )

    docs = T(spark, SF, "documents")
    out = str(tmp_path / "corpus")
    materialize_shards(spark, docs, out, budget=2048)

    clean = validate_shards(spark, out)
    st = {r["shard_id"]: r["status"] for r in clean.collect()}
    assert st and set(st.values()) == {"ok"}
    sids = sorted(st)

    # corrupt: swap one byte of the first shard's payload.  Drop the
    # Hadoop crc sidecar too — with it, the FS's own checksum layer
    # throws on read BEFORE the digest audit runs (the right loud
    # failure for bit-rot); the audit's job is FS-valid-but-wrong
    # bytes, e.g. a writer that rewrote the file (regenerating the
    # crc) with the wrong content.
    d0 = os.path.join(out, f"shard_id={sids[0]}")
    p0 = os.path.join(d0, "data.txt")
    data = open(p0, "rb").read()
    with open(p0, "wb") as fh:
        fh.write(data.replace(b"\t", b" ", 1))
    os.remove(os.path.join(d0, ".data.txt.crc"))
    # missing: remove the second shard's file
    os.remove(os.path.join(out, f"shard_id={sids[1]}", "data.txt"))
    # orphan: fabricate a shard dir the manifest never saw
    fake = os.path.join(out, "shard_id=999999")
    os.makedirs(fake)
    with open(os.path.join(fake, "data.txt"), "w") as fh:
        fh.write("1\tfabricated\n")

    audited = {
        r["shard_id"]: r["status"]
        for r in validate_shards(spark, out).collect()
    }
    assert audited[sids[0]] == "corrupt"
    assert audited[sids[1]] == "missing"
    assert audited[999999] == "orphan"
    for sid in sids[2:]:
        assert audited[sid] == "ok"
