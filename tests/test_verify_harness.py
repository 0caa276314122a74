"""Pins for verify_all.py's sanctioned alternate arbiters (round 12).

The q97 recursive-CTE oracle is data-infeasible on skewed hot keys (its
iteration count is max-events-per-key), so above
``Q97_RECURSION_FEASIBLE`` the census substitutes a driver-side Python
recurrence. These tests prove the substitution is sound:

1. arbiter == recursive CTE, row for row and bit for bit, on a feasible
   dataset (so the alternate oracle IS the oracle wherever both run);
2. the data-driven trigger: below the bound the arbiter stays out of the
   way, above it it engages (no flag, no directory-name sniffing);
3. NULL user rows are dropped by both sides (the r10 adversarial pin).

No Spark needed — this is a DuckDB-vs-Python harness property.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import verify_all  # noqa: E402

Q97_ORACLE = None


def _q97_oracle_sql() -> str:
    global Q97_ORACLE
    if Q97_ORACLE is None:
        from etl_procesos_odo_spark.registry import registry

        Q97_ORACLE = {q.name: q.oracle for q in registry()}["q97_ewma"]
    return Q97_ORACLE


@pytest.fixture
def con():
    """An in-memory DuckDB with a synthetic `events` view: 40 users with
    irregular gaps (one 'hot' user at 500 events), plus NULL-user rows
    that both sides must drop."""
    rng = np.random.default_rng(11)
    rows = []
    eid = 0
    for uid in range(40):
        n = 500 if uid == 0 else int(rng.integers(1, 30))
        t = 1_700_000_000_000_000 + np.cumsum(
            rng.integers(1, 3_600_000_000, size=n)
        )
        for ti in t:
            rows.append((uid, eid, float(rng.uniform(0, 100)), int(ti)))
            eid += 1
    for _ in range(5):  # NULL state key: dropped by operator and oracles
        rows.append((None, eid, 1.0, 1_700_000_000_000_000))
        eid += 1
    c = duckdb.connect()
    c.execute("SET TimeZone = 'UTC'")
    c.execute(
        "CREATE TABLE events AS SELECT * FROM (SELECT "
        "CAST(uid AS BIGINT) AS user_id, CAST(eid AS BIGINT) AS event_id, "
        "val AS value, make_timestamp(us) AS ts "
        "FROM (SELECT unnest($rows, recursive := true)) "
        "t(uid, eid, val, us))",
        {"rows": [{"uid": u, "eid": e, "val": v, "us": us}
                  for u, e, v, us in rows]},
    )
    return c


def test_arbiter_matches_recursive_cte_bit_for_bit(con, monkeypatch):
    monkeypatch.setattr(verify_all, "Q97_RECURSION_FEASIBLE", 0)
    got = verify_all._alt_oracle("q97_ewma", con)
    assert got is not None
    a_cols, a_rows, note = got
    assert "python-recurrence" in note
    rel = con.sql(_q97_oracle_sql())
    o_cols, o_rows = list(rel.columns), rel.fetchall()
    assert sorted(a_cols) == sorted(o_cols)
    key = lambda cols, r: (  # noqa: E731 — order-insensitive compare
        r[cols.index("user_id")], r[cols.index("event_id")],
        r[cols.index("ewma")],
    )
    assert sorted(key(a_cols, r) for r in a_rows) == sorted(
        key(o_cols, r) for r in o_rows
    )
    # exact float equality included in the tuples above: same IEEE +*/
    # chain in the same order on both sides


def test_trigger_is_data_driven(con, monkeypatch):
    # hot key = 500 events: below the real bound -> normal oracle runs
    assert verify_all._alt_oracle("q97_ewma", con) is None
    # above the bound -> the arbiter engages and names the hot-key size
    monkeypatch.setattr(verify_all, "Q97_RECURSION_FEASIBLE", 499)
    got = verify_all._alt_oracle("q97_ewma", con)
    assert got is not None and "hot key 500 events" in got[2]
    # never fires for any other query
    assert verify_all._alt_oracle("q50_partitioner_pipeline", con) is None


def test_arbiter_drops_null_users(con, monkeypatch):
    monkeypatch.setattr(verify_all, "Q97_RECURSION_FEASIBLE", 0)
    _, a_rows, _ = verify_all._alt_oracle("q97_ewma", con)
    n_events = con.sql(
        "SELECT count(*) FROM events WHERE user_id IS NOT NULL"
    ).fetchone()[0]
    assert len(a_rows) == n_events
    assert all(r[0] is not None for r in a_rows)
