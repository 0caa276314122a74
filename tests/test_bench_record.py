"""The driver-tail contract (round 9): the external driver keeps only the
LAST 2000 chars of bench stdout and json-parses what it finds there, so
bench.py must END its output with a compact-but-complete record. These
tests pin that contract without running the bench."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _compact_record  # noqa: E402

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
        assert parsed["n_shown"] == len(parsed["queries_slowest"]) <= n
        # a tail capture of (huge full line + compact line) must end with
        # a complete parseable record
        full = json.dumps(_fake_result(n))
        tail = (full + "\n" + line + "\n")[-TAIL_CAP:]
        assert json.loads(tail.strip().splitlines()[-1])["value"] == 123.45


def test_compact_record_keeps_slowest_queries_first():
    r = _fake_result(300)
    shown = _compact_record(r)["queries_slowest"]
    times = list(shown.values())
    assert times == sorted(times, reverse=True)
    assert max(r["queries"].values()) == times[0]


def test_compact_record_handles_error_sentinels():
    r = _fake_result(10)
    r["queries"]["q_failed_one"] = -1.0  # bench error sentinel
    shown = _compact_record(r)["queries_slowest"]
    # sentinel sorts last, never displacing a real slow query
    assert list(shown.values())[0] >= 0
