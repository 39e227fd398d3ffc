"""Regenerate the BASELINE.md "current state" header (round 14,
VERDICT r13 item 7): BASELINE.md is ~900 lines of per-round
narrative, and a new reader cannot find the operating envelope
without reading all of it.  This writes a compact generated summary
between explicit BEGIN/END markers just under the H1 — derived facts
(registry size, driver-green union, latest checked-in bench) are
computed live; the envelope bullets are maintained HERE (one place,
updated when a battery re-measures them).

Run from /root/repo:  python3 scratch/gen_baseline_header.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.getcwd())

BEGIN = "<!-- BEGIN GENERATED CURRENT-STATE (scratch/gen_baseline_header.py) -->"
END = "<!-- END GENERATED CURRENT-STATE -->"

# Maintained envelope facts (update when a battery re-measures them;
# every line cites the BASELINE.md section or log with the evidence).
ENVELOPE = """\
**Scale posture (verified, not argued):**
- sf0.01/sf0.1: every oracled query bit-exact vs DuckDB each pytest run
  (tests/test_oracle_parity.py; scratch/exactness*.py sweeps).
- sf1/sf10: full-registry soaks r7-r13 (soak_sf1/soak_sf10 + per-round
  logs); quadratic-oracle queries slice-verified (SLICE_10 lists).
- Adversarial skew (r13 battery): 50%-hot join key absorbed by AQE
  (28.6 s naive-off -> 8.4 s on; salted fallback 18.3 s); LSH hot
  bucket capped-linear where uncapped is unrunnable; CC hot component
  1.3x a random graph.  Bursty density (r14 battery): 80% of one
  series in ONE 24 h chunk leaves the chunked-frame family flat
  (scratch/bursty_battery_r14.log).
- Streaming: 50-batch incremental-curation soak flat per-batch (r13);
  30-batch streaming ANN-index ingestion soak flat with compaction
  interleaved, recall-gated per batch (r14,
  scratch/soak_index_stream_r14.log).

**Known envelope edges:** ANN drift now alarm-tested both ways
(ns_ann_drift_retrain TRUE branch + ns_*_index_append FALSE branch);
a single flash-crowd chunk serializes into one LINEAR task (measured
acceptable, r14 battery); curation incremental publishes are
append-only (documented weaker-than-global dedup semantics).

**Environmental gaps (no in-sandbox action possible):** delta-spark
absent (atomic staged-swap backend instead, 1:1 MERGE mapping
documented); no live PG/MySQL/Oracle/MSSQL (dialect SQL
contract-tested; JDBC path live via embedded Derby); no image/audio
codecs (decode import-gated; Spark-side plumbing digest-tested)."""


def main() -> None:
    from aws_datalake_framework_ingestion_spark.plans import registry as reg

    green: set[str] = set()
    rounds = []
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        rounds.append(int(m.group(1)) if m else 0)
        try:
            data = json.load(open(path))
        except Exception:
            continue
        for name, row in data.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green.add(name)
    n_reg = len(reg.REGISTRY)
    n_or = sum(1 for s in reg.REGISTRY.values() if s.oracle is not None)
    n_green = sum(1 for n in reg.REGISTRY if n in green)

    bench_files = sorted(glob.glob("BENCH_r*.json"))
    bench_line = "no checked-in bench yet"
    if bench_files:
        b = json.load(open(bench_files[-1]))
        parsed = b.get("parsed") or b
        if isinstance(parsed, dict) and "value" in parsed:
            load = parsed.get("load")
            bench_line = (
                f"{os.path.basename(bench_files[-1])}: "
                f"{parsed['value']} s total = "
                f"{parsed.get('queries_total_sec', '?')} s queries + "
                f"{parsed.get('pipeline_gates_total_sec', '?')} s "
                f"pipeline gates (sf {parsed.get('sf', '?')}, "
                f"best-of-{parsed.get('runs', '?')}"
                + (f", 1-min load {load[0]}→{load[1]}" if load else "")
                + ")"
            )

    block = "\n".join(
        [
            BEGIN,
            "",
            "## Current state (generated — do not hand-edit this block)",
            "",
            f"- **Registry:** {n_reg} queries, {n_or} DuckDB-oracled; "
            f"{n_green} driver-green in the r{min(rounds) if rounds else '?'}–"
            f"r{max(rounds) if rounds else '?'} rotation union "
            "(the driver verifies a disjoint 50-query window per round; "
            "tests/test_oracle_parity.py re-verifies ALL oracled queries "
            "against DuckDB on every pytest run).",
            f"- **Latest checked-in bench:** {bench_line}.",
            "- **Reference bar:** the reference publishes no numbers "
            "(1-DPU / 1-partition / 1-file posture — table below); the "
            "operative bars are the engine's own round-1 baseline and "
            "the driver's 2x rule.",
            "",
            ENVELOPE,
            "",
            END,
        ]
    )

    src = open("BASELINE.md").read()
    if BEGIN in src and END in src:
        head = src[: src.index(BEGIN)].rstrip()
        tail = src[src.index(END) + len(END):].lstrip("\n")
        out = head + "\n\n" + block + "\n\n" + tail
    else:
        # insert right after the H1 paragraph's first blank line
        lines = src.splitlines()
        ins = 1
        for i, ln in enumerate(lines):
            if ln.startswith("# "):
                ins = i + 1
                break
        out = "\n".join(lines[:ins] + ["", block] + lines[ins:])
    if not out.endswith("\n"):
        out += "\n"
    open("BASELINE.md", "w").write(out)
    n_lines = len(block.splitlines())
    assert n_lines <= 60, f"current-state block is {n_lines} lines (> 60)"
    print(f"wrote current-state header: {n_lines} lines")


if __name__ == "__main__":
    main()
