"""The driver-tail contract (round 9): the external driver keeps only the
LAST 2000 chars of bench stdout and json-parses what it finds there, so
bench.py must END its output with a compact-but-complete record. These
tests pin that contract — plus the r12 noise-proofing contract (headline
= single-session total, _triage_set selection rules, sf1 keeper glob) —
without running the bench."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    _compact_record,
    _headline_value,
    _prev_round_times,
    _triage_set,
)

TAIL_CAP = 2000  # chars the driver keeps


def _fake_result(n_queries: int, name_len: int = 40) -> dict:
    return {
        "metric": "registry_total_runtime",
        "unit": "sec",
        "sf": 0.1,
        "value": 123.45,
        "queries": {
            f"q{i}_{'x' * name_len}": round(0.01 * i, 3)
            for i in range(n_queries)
        },
        "extras": {"single_session_total_sec": 99.9},
        "warm": {},
    }


def test_compact_record_fits_driver_tail_at_any_registry_size():
    for n in (0, 1, 50, 203, 500, 1000):
        line = json.dumps(_compact_record(_fake_result(n)))
        assert len(line) <= 1500, (n, len(line))
        parsed = json.loads(line)
        assert parsed["value"] == 123.45
        assert parsed["n_queries"] == n
        assert parsed["n_shown"] == len(parsed["queries"]) <= n
        # a tail capture of (huge full line + compact line) must end with
        # a complete parseable record
        full = json.dumps(_fake_result(n))
        tail = (full + "\n" + line + "\n")[-TAIL_CAP:]
        assert json.loads(tail.strip().splitlines()[-1])["value"] == 123.45


def test_compact_record_uses_driver_contract_queries_key():
    # r14 (r13 verdict item 2): the compact line's per-query map must sit
    # under the contract key ``queries`` — r13 shipped it as
    # ``queries_slowest`` and the driver's PERF per_query/scaling tables
    # came back empty two rounds running
    parsed = _compact_record(_fake_result(203))
    assert "queries" in parsed and parsed["queries"]
    assert "queries_slowest" not in parsed


def test_compact_record_keeps_slowest_queries_first():
    r = _fake_result(300)
    shown = _compact_record(r)["queries"]
    times = list(shown.values())
    assert times == sorted(times, reverse=True)
    assert max(r["queries"].values()) == times[0]


def test_compact_record_handles_error_sentinels():
    r = _fake_result(10)
    r["queries"]["q_failed_one"] = -1.0  # bench error sentinel
    shown = _compact_record(r)["queries"]
    # sentinel sorts last, never displacing a real slow query
    assert list(shown.values())[0] >= 0


# --- r12 noise-proofing contract (r11 verdict item 1) ----------------------


def test_headline_is_single_session_total():
    val, which = _headline_value(396.3, 292.8)
    assert val == 292.8 and which == "single_session_total_sec"
    # single-session pass died -> fall back to the segmented sum
    val, which = _headline_value(396.3, -1.0)
    assert val == 396.3 and which.startswith("segmented_total_sec")


def test_triage_registry_wide_2x_rule_still_holds():
    sel = _triage_set({"qa": 4.1, "qb": 1.9}, {"qa": 2.0, "qb": 1.0},
                      head_names=frozenset(), top_abs=0)
    assert sel == {"qa"}  # qb at 1.9x stays below the registry-wide bar


def test_triage_head_movers_at_1_5x():
    # r11's untriaged head movers: q50 11.83s vs 8.61 (1.37x), but a
    # 1.5x head mover MUST ship with a warm row even below 2x
    queries = {"q50": 9.0, "q99": 9.0}
    prev = {"q50": 6.0, "q99": 6.0}
    sel = _triage_set(queries, prev, head_names=frozenset({"q50"}),
                      top_abs=0)
    assert sel == {"q50"}  # same ratio, non-head stays untriaged


def test_triage_top5_absolute_regressions():
    # big absolute movers below every ratio bar still get triaged
    queries = {f"q{i}": 10.0 + i for i in range(8)}
    prev = {f"q{i}": 9.0 + i for i in range(8)}  # all ~1.1x, +1.0s each
    queries["qbig"] = 20.0
    prev["qbig"] = 15.0  # 1.33x but +5s — the r11 q50-class mover
    sel = _triage_set(queries, prev, head_names=frozenset())
    assert "qbig" in sel and len(sel) == 5
    # improvements and missing baselines are never selected
    sel2 = _triage_set({"qf": 1.0, "qn": 50.0}, {"qf": 2.0}, frozenset())
    assert sel2 == set()


def test_triage_absolute_movers_need_min_delta():
    # r13 advice fix: a round where every query drifts +0.1-0.3s from
    # host noise must not schedule 5 warm re-runs of the largest (still
    # trivial) movers — pure-absolute selection needs >=1s of delta
    queries = {f"q{i}": 1.3 + 0.01 * i for i in range(10)}
    prev = {f"q{i}": 1.1 + 0.01 * i for i in range(10)}  # +0.2s each
    assert _triage_set(queries, prev, frozenset()) == set()
    # exactly at the floor still selects (the r11 +1.0s movers)
    assert _triage_set({"qa": 3.0}, {"qa": 2.0}, frozenset()) == {"qa"}


def test_triage_skips_error_sentinels_and_dead_baselines():
    sel = _triage_set({"qa": -1.0, "qb": 9.0}, {"qa": 1.0, "qb": 0.0},
                      frozenset({"qa", "qb"}))
    assert sel == set()


def test_prev_round_times_finds_same_sf_keeper():
    # the r11 gap: the sf1 keeper found no same-sf baseline because the
    # glob only matched BENCH_full_r*.json — both series must resolve
    assert _prev_round_times(0.1), "no sf0.1 keeper baseline found"
    assert _prev_round_times(1.0), "no sf1 keeper baseline found"
    assert _prev_round_times(123.456) == {}  # alien sf -> empty, not wrong-sf


def test_keeper_sort_is_numeric(tmp_path, monkeypatch):
    # r13 advice fix: keeper ordering must parse the round number as an
    # int — the old string key put r9.json ahead of r10.json and would
    # put r100.json behind r13.json
    import bench as bench_mod

    for name, val in (
        ("BENCH_full_r9.json", {"sf": 0.1, "queries": {"qx": 9.0}}),
        ("BENCH_full_r10.json", {"sf": 0.1, "queries": {"qx": 10.0}}),
        ("BENCH_full_r100.json", {"sf": 0.1, "queries": {"qx": 100.0}}),
    ):
        (tmp_path / name).write_text(json.dumps(val))
    monkeypatch.setattr(bench_mod, "REPO_ROOT", str(tmp_path))
    assert _prev_round_times(0.1) == {"qx": 100.0}


# --- r13: the bench record must survive streaming-shutdown noise ------------


def test_bench_tail_survives_streaming_shutdown_noise():
    """r12 postmortem pin (verdict item 1): BENCH_r12.json came back
    ``parsed: null`` because StateStoreCoordinator maintenance threads
    stack-traced into the capture AFTER the record line printed. Run
    bench on a state-store streaming query with stdout+stderr merged
    (the driver's view) and assert the LAST line of the 2000-char tail
    is the parseable record — i.e. _quiesce silenced/joined the JVM
    before the line printed and nothing followed it."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        BENCH_QUERIES="q43_streaming_dedup",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=600, cwd=repo,
    )
    assert proc.returncode == 0
    tail = proc.stdout[-TAIL_CAP:]
    last = [ln for ln in tail.strip().splitlines() if ln.strip()][-1]
    rec = json.loads(last)
    assert rec["queries"]["q43_streaming_dedup"] >= 0
