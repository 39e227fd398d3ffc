"""Crash-resumable, per-stage-ledgered corpus→shards curation pipeline.

``pipeline.run_asset`` rebuilds the reference's 6-stage ingestion DAG
(dl_fmwrk_dag_template.py:39-113) for ONE asset; this module applies
the same control-plane contract — every stage writes a catalog status
row, statuses init/flip exactly like the reference's ledger columns
(dataIngestionUtils.py:240-242) — to the LLM-data curation chain the
north-star queries implement piecewise:

    gopher rules → lang filter → near-dup canonicalization →
    contamination scrub → deterministic sample → training shards

Control-plane design (what the reference's Airflow DAG gives and a
100 TB run cannot live without):

* **Stage outputs are materialized datasets** under
  ``{work_root}/{run_id}/stageNN_{name}`` — at scale each stage is
  hours of work; recomputing the whole chain because the last stage
  crashed is not an option.
* **The ledger row is the commit point.**  A stage is "done" iff a
  ``succeeded`` row for (run_id, stage) exists in the catalog's
  ``curation_ledger`` table, appended strictly AFTER the stage's
  output finished writing.  A crash mid-stage leaves a partial
  directory and no row → resume recomputes that stage, overwriting
  the partial output.  A crash between ledger-append and the next
  stage → resume skips everything committed.
* **Resume is byte-identical.**  Every stage is a deterministic pure
  function of its input rows, and ``shards.materialize_shards`` is
  byte-deterministic, so an interrupted run resumed later publishes
  the SAME shard files + manifest digests as an uninterrupted run
  (pinned by tests/test_curation_pipeline.py).
* **Spec drift fails loudly.**  Each ledger row carries a fingerprint
  of the stage parameters; resuming a run_id with a different spec
  raises instead of silently mixing half-old half-new outputs.

Failure semantics match pipeline.run_asset: fail fast, record a
``failed`` ledger row, re-raise (the reference logs-and-continues —
SURVEY §4.3 documents why that is a bug, not a feature).
"""

from __future__ import annotations

import hashlib
import json
import posixpath
from dataclasses import asdict, dataclass
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .catalog import Catalog

LEDGER_TABLE = "curation_ledger"


@dataclass(frozen=True)
class CurationSpec:
    """Parameters of one curation run (one row per knob a production
    config would expose; defaults are tuned to be NON-degenerate on
    the synthetic corpus — every stage drops something, none drops
    everything)."""

    run_id: str
    lang: str = "en"
    min_words: int = 20
    max_words: int = 100_000
    min_mean_len: float = 4.0
    max_mean_len: float = 10.0
    min_alpha_frac: float = 0.8
    min_stop_hits: int = 2
    # docs with md5(doc_id) below this hex prefix form the held-out
    # eval probe set; the contamination stage removes every doc that
    # shares a 5-token-prefix fingerprint with a probe
    probe_prefix: str = "05"
    # deterministic hash-threshold subsample kept for training (~75%)
    sample_prefix: str = "c0"
    shard_budget: int = 2048

    def fingerprint(self) -> str:
        return hashlib.md5(
            json.dumps(asdict(self), sort_keys=True).encode()
        ).hexdigest()


def _probe_fps(docs: DataFrame, spec: CurationSpec) -> DataFrame:
    """Fingerprints of the held-out probe docs, derived from the
    ORIGINAL corpus (eval membership must not depend on what earlier
    stages dropped)."""
    return (
        docs.where(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
            < spec.probe_prefix
        )
        .select(_fp().alias("fp"))
        .distinct()
    )


def _fp():
    """5-token-prefix contamination fingerprint (the same key
    ns_contamination_check equi-joins on)."""
    return F.md5(F.concat_ws(" ", F.slice(F.split(F.trim("text"), " "), 1, 5)))


def _stage_gopher(spec: CurationSpec, docs: DataFrame) -> DataFrame:
    from .operators.text import gopher_rules

    return (
        gopher_rules(
            docs,
            min_words=spec.min_words,
            max_words=spec.max_words,
            min_mean_len=spec.min_mean_len,
            max_mean_len=spec.max_mean_len,
            min_alpha_frac=spec.min_alpha_frac,
            min_stop_hits=spec.min_stop_hits,
            carry_cols=("text", "n_chars"),
        )
        .where(F.col("keep"))
        .select("doc_id", "text", "n_chars")
    )


def _stage_lang(spec: CurationSpec, docs: DataFrame) -> DataFrame:
    from .operators.text import lang_id

    return lang_id(docs).where(F.col("lang_pred") == spec.lang).select(
        "doc_id", "text", "n_chars"
    )


def _stage_dedup(spec: CurationSpec, docs: DataFrame) -> DataFrame:
    """Near-dup canonicalization: token-SET signature groups, best
    member (longest, then lowest id) survives — the same semantics
    ns_dedup_canonical / ns_curation_funnel pin.  Signature groups
    are near-dup clusters (small by construction), so the window
    partitions by a high-cardinality key — never global."""
    from pyspark.sql import Window as W

    sig = F.md5(
        F.concat_ws(
            " ", F.array_sort(F.array_distinct(F.split(F.trim("text"), " ")))
        )
    )
    w = W.partitionBy("_s").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        docs.withColumn("_s", sig)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id", "text", "n_chars")
    )


def _stage_contamination(
    spec: CurationSpec, docs: DataFrame, probes_fp: DataFrame
) -> DataFrame:
    """Anti-join on the 32 B fingerprint — probes are eval data; any
    training doc sharing their prefix fingerprint leaks the benchmark
    (including the probe docs themselves)."""
    return (
        docs.withColumn("fp", _fp())
        .join(F.broadcast(probes_fp), "fp", "left_anti")
        .select("doc_id", "text", "n_chars")
    )


def _stage_sample(spec: CurationSpec, docs: DataFrame) -> DataFrame:
    return docs.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
        < spec.sample_prefix
    )


STAGES: tuple[tuple[str, object], ...] = (
    ("gopher_rules", _stage_gopher),
    ("lang_filter", _stage_lang),
    ("dedup_canonical", _stage_dedup),
    ("contamination", _stage_contamination),
    ("sample", _stage_sample),
)
FINAL_STAGE = "shards"


def _ledger_row(
    spec: CurationSpec,
    stage: int,
    name: str,
    status: str,
    n_in: int | None,
    n_out: int | None,
    out_path: str | None,
) -> dict:
    return {
        "run_id": spec.run_id,
        "stage": stage,
        "name": name,
        "status": status,
        "n_in": n_in,
        "n_out": n_out,
        "out_path": out_path,
        "spec_fp": spec.fingerprint(),
        "updated_ts": datetime.now(),
    }


def run_curation(
    catalog: Catalog,
    spec: CurationSpec,
    docs: DataFrame,
    work_root: str,
    on_stage_complete=None,
) -> dict:
    """Execute (or resume) the curation chain for ``spec.run_id``.

    Returns {run_id, shard_dir, manifest (DataFrame), stages_run,
    stages_skipped}.  ``on_stage_complete(name)`` fires after each
    stage's ledger commit — the crash-injection seam the resume tests
    use (raising there models dying between stages).
    """
    spark = catalog.spark
    if not catalog.exists(LEDGER_TABLE):
        catalog.create(LEDGER_TABLE)

    led = catalog.read(LEDGER_TABLE).where(
        (F.col("run_id") == spec.run_id) & (F.col("status") == "succeeded")
    )
    # completed stages: bounded by the stage count of ONE run (≤ 6
    # rows per run_id by construction)
    done = {r["name"]: r for r in led.collect()}
    fp = spec.fingerprint()
    for name, row in done.items():
        if row["spec_fp"] != fp:
            raise ValueError(
                f"run_id {spec.run_id!r} has committed stage {name!r} "
                f"under a different spec (ledger {row['spec_fp'][:8]}, "
                f"current {fp[:8]}) — resuming would mix outputs; use a "
                "new run_id or delete the old run's ledger rows"
            )

    run_root = posixpath.join(work_root, spec.run_id)
    probes_fp = _probe_fps(docs, spec)
    cur = docs.select("doc_id", "text", "n_chars")
    stages_run: list[str] = []
    stages_skipped: list[str] = []
    # each stage's committed n_out IS the next stage's n_in — carried
    # forward instead of recounted (one less job per stage; the
    # chain invariant n_in(k+1) == n_out(k) is pinned by tests and
    # the cur_pipeline_run oracle)
    n_carry: int | None = None

    for i, (name, fn) in enumerate(STAGES, start=1):
        out_path = posixpath.join(run_root, f"stage{i:02d}_{name}")
        if name in done:
            cur = spark.read.parquet(done[name]["out_path"])
            n_carry = done[name]["n_out"]
            stages_skipped.append(name)
            continue
        n_in = n_carry if n_carry is not None else cur.count()
        try:
            out = (
                fn(spec, cur, probes_fp)
                if name == "contamination"
                else fn(spec, cur)
            )
            # mode=overwrite clobbers any partial directory a previous
            # crash left — the ledger row below, not the directory, is
            # the commit marker
            out.write.mode("overwrite").parquet(out_path)
        except Exception:
            catalog.insert(
                LEDGER_TABLE,
                [_ledger_row(spec, i, name, "failed", n_in, None, None)],
            )
            raise
        cur = spark.read.parquet(out_path)
        n_out = cur.count()
        n_carry = n_out
        catalog.insert(
            LEDGER_TABLE,
            [_ledger_row(spec, i, name, "succeeded", n_in, n_out, out_path)],
        )
        stages_run.append(name)
        if on_stage_complete:
            on_stage_complete(name)

    shard_dir = posixpath.join(run_root, FINAL_STAGE)
    n_final = len(STAGES) + 1
    if FINAL_STAGE in done:
        from .shards import read_manifest

        manifest = read_manifest(spark, shard_dir)
        stages_skipped.append(FINAL_STAGE)
    else:
        from .shards import materialize_shards

        n_in = n_carry if n_carry is not None else cur.count()
        try:
            manifest = materialize_shards(
                spark, cur, shard_dir, budget=spec.shard_budget
            )
        except Exception:
            catalog.insert(
                LEDGER_TABLE,
                [
                    _ledger_row(
                        spec, n_final, FINAL_STAGE, "failed", n_in, None, None
                    )
                ],
            )
            raise
        n_out = manifest.count()
        catalog.insert(
            LEDGER_TABLE,
            [
                _ledger_row(
                    spec,
                    n_final,
                    FINAL_STAGE,
                    "succeeded",
                    n_in,
                    n_out,
                    shard_dir,
                )
            ],
        )
        stages_run.append(FINAL_STAGE)
        if on_stage_complete:
            on_stage_complete(FINAL_STAGE)

    return {
        "run_id": spec.run_id,
        "shard_dir": shard_dir,
        "manifest": manifest,
        "stages_run": stages_run,
        "stages_skipped": stages_skipped,
    }
