"""Driver-contract tests for bench.py's stdout line.

Round-7 regression class: the driver keeps only the last 2000 chars
of bench stdout, so a JSON line that grows past that loses its FRONT
(metric/value) and the round records parsed:null.  These tests pin
the contract shape so headline growth fails HERE, not in the driver.
"""

from __future__ import annotations

import json

import pytest

import bench


def _worst_case_timings(names):
    # 4-digit seconds with 3 decimals is the widest value the
    # formatter can emit for a realistic query (>1000 s would be a
    # different problem entirely).
    return {n: 9999.999 for n in names}


def test_stdout_line_fits_driver_tail_at_current_headline():
    timings = _worst_case_timings(bench.HEADLINE)
    spreads = {n: 9999.999 for n in bench.HEADLINE}
    per_query_load = {n: 99.99 for n in bench.HEADLINE}
    line, sidecar = bench.build_output(
        timings,
        spreads,
        runs=3,
        sf=0.1,
        loadavg=[[9.99] * 3, [9.99] * 3],
        wake_us=(9999.9, 9999.9),
        per_query_load=per_query_load,
    )
    assert len(line) <= bench.MAX_STDOUT_LINE
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_sec"
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    assert parsed["value"] == pytest.approx(sum(timings.values()), rel=1e-9)
    # queries-vs-control-plane split (VERDICT r12 item 3): both totals
    # ride on the stdout line and partition `value`
    gates = [n for n in bench.HEADLINE if n in bench.PIPELINE_GATES]
    assert gates, "no pipeline gates in HEADLINE — split is vacuous"
    assert parsed["pipeline_gates_total_sec"] == pytest.approx(
        sum(timings[n] for n in gates), rel=1e-9
    )
    assert parsed["queries_total_sec"] + parsed[
        "pipeline_gates_total_sec"
    ] == pytest.approx(parsed["value"], abs=1e-3)
    # dispersion lives ONLY in the sidecar — the stdout line must not
    # carry it (that's what overflowed in r7)
    assert "spread" not in parsed
    side = json.loads(sidecar)
    assert side["spread"] == spreads
    assert side["runs"] == 3
    # the FULL host-load marker (1/5/15-min × start/end) rides on the
    # sidecar; the stdout line carries the compact 1-min (start, end)
    # pair so the checked-in BENCH_rN.json itself is judgeable for
    # host noise (VERDICT r13 item 3)
    assert side["loadavg"] == [[9.99] * 3, [9.99] * 3]
    assert "loadavg" not in parsed
    assert parsed["load"] == [9.99, 9.99]
    # r14: the thread-wake-latency probe rides BOTH the stdout line
    # (compact ints) and the sidecar — a judge discounting a
    # sick-hypervisor phase needs it on the checked-in BENCH_rN.json
    assert parsed["wake_us"] == [9999, 9999]
    assert side["wake_us"] == [9999.9, 9999.9]
    # r15 (VERDICT r14 item 5): per-query 1-min load rides the sidecar
    # (never the stdout line — it would overflow the driver tail); the
    # r14 bench started quiet and ended loaded, and the endpoint-only
    # stamps could not localize which queries the load poisoned
    assert side["load1_per_query"] == per_query_load
    assert "load1_per_query" not in parsed


def test_wait_for_quiet_host_bounded(monkeypatch, capsys):
    """The quiet-host gate returns immediately on a quiet host, and on
    a permanently-loaded host gives up after the wait budget with a
    WARNING instead of blocking the driver's bench run forever."""
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.5, 0.5, 0.5))
    bench.wait_for_quiet_host(4.0, max_wait_sec=60)
    assert "WARNING" not in capsys.readouterr().err

    monkeypatch.setattr(bench.os, "getloadavg", lambda: (32.0, 30.0, 30.0))
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)
    clock = iter(range(0, 10_000, 10))
    monkeypatch.setattr(bench.time, "monotonic", lambda: float(next(clock)))
    bench.wait_for_quiet_host(4.0, max_wait_sec=60, poll_sec=10)
    assert "WARNING: starting bench on a LOADED host" in capsys.readouterr().err
    assert sleeps and len(sleeps) <= 7


def test_stdout_line_overflow_raises_not_truncates():
    names = [f"q_very_long_benchmark_query_name_{i:03d}" for i in range(80)]
    with pytest.raises(AssertionError, match="2000-char stdout tail"):
        bench.build_output(
            _worst_case_timings(names), dict.fromkeys(names, 0.0), 3, 0.1
        )


def test_headline_names_are_registered():
    from aws_datalake_framework_ingestion_spark.plans import REGISTRY

    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, f"HEADLINE entries not in REGISTRY: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
