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
from .sources.versioned import sized_for_publish

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

    w = W.partitionBy("_s").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        docs.withColumn("_s", _sig())
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
            # n_out rides the write job as an observed metric instead
            # of a separate read-back count job (r14 optimization —
            # one less Spark action per stage; the write is the only
            # action, so the observation sees every output row
            # exactly once)
            from pyspark.sql import Observation

            obs = Observation()
            out = out.observe(obs, F.count(F.lit(1)).alias("n"))
            # mode=overwrite clobbers any partial directory a previous
            # crash left — the ledger row below, not the directory, is
            # the commit marker.  r14: size each materialized stage to
            # advisory-sized files instead of one file per shuffle
            # partition (guide §6 — the next stage, and any resume,
            # re-reads this directory).  r15: size-conditional — a
            # small estimated stage coalesces to one file with no
            # extra exchange (sized_for_publish; the Observation rides
            # the write either way).
            sized_for_publish(out).write.mode("overwrite").parquet(
                out_path
            )
        except Exception:
            catalog.insert(
                LEDGER_TABLE,
                [_ledger_row(spec, i, name, "failed", n_in, None, None)],
            )
            raise
        cur = spark.read.parquet(out_path)
        n_out = int(obs.get["n"])
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

        # read from the ledger's recorded path, like the doc stages:
        # work_root is not part of the spec fingerprint, so a resume
        # launched with a different work_root must still find the
        # committed shards where they were actually published
        shard_dir = done[FINAL_STAGE]["out_path"]
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


# --------------------------------------------------------------------------
# Incremental (delta-batch) curation — the 24/7 "daily delta" posture
# --------------------------------------------------------------------------

INC_STAGES: tuple[str, ...] = (
    "gopher_rules",
    "lang_filter",
    "dedup_novel",
    "contamination",
    "sample",
    "publish",
)


def _sig():
    """Near-dup canonicalization signature (token-SET md5) — the same
    key _stage_dedup windows on."""
    return F.md5(
        F.concat_ws(
            " ", F.array_sort(F.array_distinct(F.split(F.trim("text"), " ")))
        )
    )


def run_curation_incremental(
    catalog: Catalog,
    spec: CurationSpec,
    batch_docs: DataFrame,
    store_root: str,
    batch_id: int,
) -> dict:
    """Curate ONE delta batch against the pipeline's accumulated state
    — the shape a 100 TB corpus actually runs day-to-day, where
    yesterday's output is published and immutable and only today's
    arrivals are processed.

    Composes the two r11 end-to-end gates: run_curation's per-stage
    ledger contract (reference DAG statuses,
    dl_fmwrk_dag_template.py:39-113) applied per BATCH, and
    streaming/shard_append.py's versioned-segment publish.

    Semantics (deliberately weaker than the one-shot pipeline, and
    documented as such — published data is never revoked):

    * gopher / lang / sample are per-doc deterministic — identical to
      the one-shot stages on any batch split.
    * **dedup_novel** is first-SEEN-wins: a sig registry (versioned
      store, one 32 B md5 per post-lang doc ever seen) blocks any
      content whose signature appeared in an EARLIER batch — even if
      that earlier doc was later dropped by contamination/sampling
      (content-level decisions must not be re-rolled under a new
      doc_id).  Within a batch the one-shot rule applies (n_chars
      desc, doc_id).  Unlike global dedup, a later batch can never
      dethrone an earlier winner.
    * **contamination** scrubs the CURRENT batch against the probe
      fingerprints of all batches seen so far; probes arriving later
      do not claw back already-published docs (no revocation).
    * **publish** appends the batch's survivors as one immutable
      versioned segment (sources/versioned.py) tagged with the batch
      id.

    Crash-safety: the batch's SIX ledger rows are appended as one
    atomic insert AFTER the segment publish — the batch is the commit
    unit.  Every pre-publish stage is deterministic and the
    sig-registry anti-join excludes the batch's own rows (`batch <
    batch_id`), so a crash anywhere re-runs to the same survivors; a
    crash between segment-write and ledger-append is healed by the
    own-segment check (segment present ⇒ skip the write, verify the
    recomputed count matches), and the same drift check guards the
    registry stores (a replay with CHANGED batch input raises instead
    of silently leaving the changed rows unregistered).  A stage
    failure records a ``failed`` ledger row and re-raises
    (run_curation's fail-fast contract).  Re-running a fully-committed
    batch is a no-op returning the committed funnel.

    At scale: each count is over ONE batch; the two cross-batch joins
    scan a single pruned 32 B column (sig registry / probe fps) of
    append-only stores — the shard_append posture.

    Returns {run_key, replayed, funnel: [(stage, name, n_in, n_out)]}.
    """
    from .sources.versioned import _version_dirs, write_version

    spark = catalog.spark
    if not catalog.exists(LEDGER_TABLE):
        catalog.create(LEDGER_TABLE)
    run_key = f"{spec.run_id}@b{batch_id:03d}"
    fp = spec.fingerprint()
    # bounded collect: ≤6 rows per committed batch of ONE pipeline
    prior = (
        catalog.read(LEDGER_TABLE)
        .where(
            F.col("run_id").startswith(spec.run_id + "@")
            & (F.col("status") == "succeeded")
        )
        .collect()
    )
    for row in prior:
        if row["spec_fp"] != fp:
            raise ValueError(
                f"incremental pipeline {spec.run_id!r} has committed "
                f"batches under a different spec (ledger "
                f"{row['spec_fp'][:8]}, current {fp[:8]}) — a spec "
                "change requires a new pipeline run_id"
            )
    committed = {(r["run_id"], r["name"]): r for r in prior}
    if all((run_key, n) in committed for n in INC_STAGES):
        rows = sorted(
            (committed[(run_key, n)] for n in INC_STAGES),
            key=lambda r: r["stage"],
        )
        return {
            "run_key": run_key,
            "replayed": True,
            "funnel": [
                (r["stage"], r["name"], r["n_in"], r["n_out"]) for r in rows
            ],
        }

    corpus_dir = posixpath.join(store_root, "corpus")
    probes_dir = posixpath.join(store_root, "probes")
    sigs_dir = posixpath.join(store_root, "sigs")

    # store reads go through the compaction-aware union reader: the
    # sigs/probes registries and the curated corpus are exactly the
    # stores that accrete one segment per batch, so they must stay
    # readable after shard_append.compact_corpus/vacuum_corpus folds
    # their history behind a _BASE commit
    from .streaming.shard_append import _base_info as _store_base
    from .streaming.shard_append import read_corpus as _read_store

    def _has(path: str) -> bool:
        return bool(_version_dirs(spark, path)) or (
            _store_base(spark, path) is not None
        )

    def _store(path: str) -> DataFrame:
        return _read_store(spark, path)

    def _digest(df: DataFrame, key: str):
        """(count, decimal-exact 56-bit content sum) over one column —
        the order-free drift detector (1-row aggregate)."""
        return tuple(
            df.select(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.conv(F.substring(F.md5(F.col(key)), 1, 14), 16, 10)
                    .cast("decimal(38,0)")
                ).alias("h"),
            ).first()
        )

    def _register(path: str, df: DataFrame, key: str) -> None:
        """Idempotently append this batch's rows to a versioned store.
        When a segment tagged with this batch already exists (the
        replay-after-crash seam) the recomputed rows must MATCH it —
        a replay with changed batch input would otherwise silently
        leave the changed rows unregistered."""
        if _has(path) and (
            _store(path).where(F.col("batch") == batch_id).limit(1).count()
        ):
            committed_d = _digest(
                _store(path).where(F.col("batch") == batch_id), key
            )
            recomputed_d = _digest(df, key)
            if committed_d != recomputed_d:
                raise RuntimeError(
                    f"{run_key}: registry {path} already holds this "
                    f"batch's rows but they differ from the re-run "
                    f"({committed_d} vs {recomputed_d}) — the batch "
                    "input or spec changed under a committed registry "
                    "segment"
                )
            return
        if df.limit(1).count():
            write_version(spark, df, path)

    stage_at = 1  # failure tracker: which INC_STAGES entry is running
    try:
        # ---- ONE evaluation of the whole per-batch chain -----------
        # r14 optimization: the six per-stage persist+count pairs
        # (≈12 Spark actions per batch) collapse into ONE job.  Each
        # stage boundary carries an Observation, so the single
        # materializing action (survivors.count) reports every
        # funnel cardinality as observed metrics of the one pass;
        # the registry/segment side effects run AFTERWARD from the
        # already-consumed observations (same commit order as
        # before: sigs → probes → segment → ledger).  Stage
        # expressions are byte-identical to the previous
        # per-stage build — only the action count changed.
        from pyspark.sql import Observation
        from pyspark.sql import Window as _W

        o = [Observation() for _ in range(6)]

        def _cnt(df: DataFrame, i: int) -> DataFrame:
            return df.observe(o[i], F.count(F.lit(1)).alias("n"))

        base = _cnt(batch_docs.select("doc_id", "text", "n_chars"), 0)
        g = _cnt(_stage_gopher(spec, base), 1)
        stage_at = 2
        lang = _cnt(_stage_lang(spec, g), 2)

        # ---- first-seen-wins novelty against the sig registry ------
        stage_at = 3
        sigged = lang.withColumn("_s", _sig())
        w = _W.partitionBy("_s").orderBy(
            F.col("n_chars").desc(), F.col("doc_id")
        )
        within = (
            sigged.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        seen = (
            _store(sigs_dir)
            .where(F.col("batch") < batch_id)
            .select(F.col("sig").alias("_s"))
            .distinct()
            if _has(sigs_dir)
            else None
        )
        novel = _cnt(
            within.join(seen, "_s", "left_anti")
            if seen is not None
            else within,
            3,
        )

        # ---- cumulative-probe contamination scrub ------------------
        stage_at = 4
        # The scrub must see all probe fps up to AND INCLUDING this
        # batch (no-revocation rule).  The old order registered this
        # batch's fps first and read them back from the store; the
        # single-eval order instead builds the identical key set as
        # (store rows with batch <= id) ∪ (this batch's fps computed
        # from the raw batch).  The own-fps subtree deliberately
        # re-derives from ``batch_docs`` (NOT the observed ``base``
        # node): the probe relation is a broadcast-side branch of the
        # same action, and routing it through the observation node
        # would double-count n0 when both branches evaluate.
        own_probes = _probe_fps(
            batch_docs.select("doc_id", "text", "n_chars"), spec
        )
        probes = (
            _store(probes_dir)
            .where(F.col("batch") <= batch_id)
            .select("fp")
            .unionByName(own_probes)
            .distinct()
            if _has(probes_dir)
            else own_probes
        )
        fped = novel.withColumn("fp", _fp())
        clean = _cnt(
            fped.join(F.broadcast(probes), "fp", "left_anti"), 4
        )

        # ---- deterministic sample ----------------------------------
        stage_at = 5
        survivors = (
            _cnt(_stage_sample(spec, clean), 5)
            .select(
                "doc_id", "text", "n_chars", F.col("_s").alias("sig"), "fp"
            )
            .withColumn("batch", F.lit(batch_id))
            .persist()
        )
        survivors.count()  # the ONE evaluation; fires o[0..5]
        n0, n1, n2, n3, n4, n5 = (int(ob.get["n"]) for ob in o)
        stage_at = 3

        # ---- registry side effects --------------------------------
        # re-derived from the raw batch (observation-free subtrees —
        # the observations are already consumed, and register probes
        # use limit(1) actions that must not flow through them).
        # r14 (guide §2.6, overlap independent jobs): the three store
        # publishes touch DISJOINT stores and none reads another's
        # output, so they run as three concurrent driver threads —
        # the batch's commit point stays the ledger append below,
        # which still happens only after ALL three have succeeded.
        # Crash-wise nothing changes: any SUBSET of the three stores
        # may exist at a crash (previously any prefix of
        # sigs→probes→segment), and the replay path heals each store
        # independently (idempotent _register digests + the own-seg
        # count check), so subset-vs-prefix is indistinguishable to
        # recovery.
        raw_u = batch_docs.select("doc_id", "text", "n_chars")
        lang_u = _stage_lang(spec, _stage_gopher(spec, raw_u))

        def _reg_sigs() -> None:
            _register(
                sigs_dir,
                lang_u.withColumn("_s", _sig())
                .select(F.col("_s").alias("sig"))
                .distinct()
                .withColumn("batch", F.lit(batch_id)),
                key="sig",
            )

        def _reg_probes() -> None:
            _register(
                probes_dir,
                _probe_fps(raw_u, spec).withColumn("batch", F.lit(batch_id)),
                key="fp",
            )

        def _pub_corpus() -> None:
            own_seg = _has(corpus_dir) and (
                _store(corpus_dir)
                .where(F.col("batch") == batch_id)
                .limit(1)
                .count()
                > 0
            )
            if own_seg:
                n_pub = (
                    _store(corpus_dir)
                    .where(F.col("batch") == batch_id)
                    .count()
                )
                if n_pub != n5:
                    raise RuntimeError(
                        f"{run_key}: committed segment holds {n_pub} docs "
                        f"but the deterministic re-run produced {n5} — the "
                        "batch input or spec changed under an already-"
                        "published segment"
                    )
            elif n5:
                write_version(spark, survivors, corpus_dir)

        from concurrent.futures import ThreadPoolExecutor

        side_effects = [(3, _reg_sigs), (4, _reg_probes), (6, _pub_corpus)]
        with ThreadPoolExecutor(max_workers=3) as pool:
            futures = [
                (st, pool.submit(fn_)) for st, fn_ in side_effects
            ]
            first_err: tuple[int, Exception] | None = None
            for st, fut in futures:
                try:
                    fut.result()
                except Exception as exc:  # noqa: BLE001 — re-raised below
                    if first_err is None or st < first_err[0]:
                        first_err = (st, exc)
            if first_err is not None:
                stage_at = first_err[0]
                raise first_err[1]
        survivors.unpersist()
    except Exception:
        failed = _ledger_row(
            spec,
            stage_at,
            INC_STAGES[stage_at - 1],
            "failed",
            None,
            None,
            None,
        )
        failed["run_id"] = run_key
        catalog.insert(LEDGER_TABLE, [failed])
        raise

    counts = [n0, n1, n2, n3, n4, n5, n5]
    rows = [
        _ledger_row(
            spec,
            i,
            name,
            "succeeded",
            counts[i - 1],
            counts[i],
            corpus_dir if name == "publish" else None,
        )
        for i, name in enumerate(INC_STAGES, start=1)
    ]
    for r in rows:
        r["run_id"] = run_key
    catalog.insert(LEDGER_TABLE, rows)
    return {
        "run_key": run_key,
        "replayed": False,
        "funnel": [
            (i, n, counts[i - 1], counts[i])
            for i, n in enumerate(INC_STAGES, start=1)
        ],
    }
