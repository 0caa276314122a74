#!/usr/bin/env python
"""Batch-isolated correctness runner: every registry query vs its DuckDB
oracle, with optional fresh-process isolation per batch.

Round-1 postmortem: running all 67 registry queries in ONE long-lived JVM
intermittently segfaulted (accumulated cached blocks / streaming state /
Arrow workers), which is the most likely reason the driver's
CORRECTNESS_r01.json came back empty. This runner is the mitigation:

    python verify_all.py                    # one session, whole registry
    python verify_all.py --isolate 12       # fresh subprocess per 12 queries
    python verify_all.py --sf /root/testdata/sf0.01 --out CORRECTNESS_local.json
    python verify_all.py --tier core        # per-iteration gate: skips the
                                            # CONTAINED tier (registry.py),
                                            # 149 of 203 queries

Per query it records the same three driver signals (row-count match,
sorted-schema match, order-insensitive value match) or a rows-only count
for oracle-less queries, plus any error, and exits non-zero if anything
fails. ``--isolate`` survives a crashing batch: the failed batch is
re-run one-query-per-process so a single poisoned query cannot take the
whole artifact down with it.
"""

from __future__ import annotations

import argparse
import datetime
import decimal
import json
import math
import os
import subprocess
import sys


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


# --- sanctioned alternate arbiters (round 12, r11 verdict item 3) ----------
# A query whose SQL oracle is DATA-infeasible on a specific dataset gets a
# driver-side Python arbiter instead of a manual census exclusion. The
# substitution is data-driven (measured from the dataset, not flag-driven),
# value-checked (same three signals as any oracle row), and recorded in the
# artifact row under "arbiter" so the census never hides the substitution.

# q97's recursive-CTE oracle iterates max-events-per-key times, each round
# re-joining the full frame — infeasible on a skewed hot key (the sf1-skew
# census's 200k-event user never finishes in DuckDB; the OPERATOR is one
# linear pass per key). Above this bound the census swaps in the direct
# Python recurrence, which tests/test_adversarial.py pins bit-exact against
# the operator at 50k events and tests/test_verify_harness.py pins
# row-exact against the recursive CTE itself on feasible sizes.
Q97_RECURSION_FEASIBLE = 20_000


def _alt_oracle(name: str, con):
    """(o_cols, o_rows, note) when a sanctioned arbiter replaces the SQL
    oracle for this dataset, else None (the normal oracle runs)."""
    if name != "q97_ewma":
        return None
    hot = con.sql(
        "SELECT coalesce(max(cnt), 0) FROM (SELECT count(*) AS cnt "
        "FROM events WHERE user_id IS NOT NULL GROUP BY user_id)"
    ).fetchone()[0]
    if hot <= Q97_RECURSION_FEASIBLE:
        return None
    # identical arithmetic, operand order, and ordering keys as both the
    # operator (operators/windows.py ewma_time_decay) and the CTE oracle:
    # t = epoch micros / 1e6 in double, gain a = dt/(dt+600), pure +*/
    rows = con.sql(
        "SELECT user_id, event_id, value, "
        "CAST(epoch_us(ts) AS DOUBLE) / 1000000.0 AS t "
        "FROM events WHERE user_id IS NOT NULL "
        "ORDER BY user_id, ts, event_id"
    ).fetchall()
    out: list[tuple] = []
    cur: object = object()
    acc = prev_t = None
    for uid, eid, val, t in rows:
        if uid != cur:
            cur, acc = uid, None
        if acc is None:
            acc = float(val)
        else:
            dt = t - prev_t
            a = dt / (dt + 600.0)
            acc = a * float(val) + (1.0 - a) * acc
        prev_t = t
        out.append((uid, eid, acc))
    return (
        ["user_id", "event_id", "ewma"],
        out,
        f"python-recurrence (hot key {hot} events > "
        f"{Q97_RECURSION_FEASIBLE}: recursive-CTE oracle infeasible — "
        "q97 docstring; arbiter pinned by tests/test_adversarial.py + "
        "tests/test_verify_harness.py)",
    )


def run_queries(names: list[str], sf_dir: str) -> dict:
    import duckdb

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from etl_procesos_odo_spark.registry import registry
    from etl_procesos_odo_spark.session import TABLES, get_spark

    qdefs = {q.name: q for q in registry()}
    spark = get_spark("verify-all")
    con = duckdb.connect()
    con.execute("SET TimeZone = 'UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    results: dict = {}
    for name in names:
        q = qdefs[name]
        try:
            df = q.spark_fn(spark, sf_dir)
            s_cols = list(df.columns)
            s_rows = [tuple(r) for r in df.collect()]
            if q.oracle is None:
                results[name] = {"rows": len(s_rows), "rows_only": True, "ok": True}
                continue
            alt = _alt_oracle(name, con)
            if alt is not None:
                o_cols, o_rows, arbiter_note = alt
            else:
                rel = con.sql(q.oracle)
                o_cols, o_rows = list(rel.columns), rel.fetchall()
                arbiter_note = None
            si = [s_cols.index(c) for c in sorted(s_cols)]
            oi = [o_cols.index(c) for c in sorted(o_cols)]
            schema_match = sorted(s_cols) == sorted(o_cols)
            count_match = len(s_rows) == len(o_rows)
            value_match = sorted(
                tuple(canon(r[i]) for i in si) for r in s_rows
            ) == sorted(tuple(canon(r[i]) for i in oi) for r in o_rows)
            results[name] = {
                "rows": len(s_rows),
                "schema_match": schema_match,
                "count_match": count_match,
                "value_match": value_match,
                "ok": schema_match and count_match and value_match,
            }
            if arbiter_note:
                results[name]["arbiter"] = arbiter_note
        except Exception as e:  # record, keep going
            results[name] = {"ok": False, "error": f"{type(e).__name__}: {e}"[:500]}
    return results


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default="CORRECTNESS_local.json")
    ap.add_argument("--isolate", type=int, default=0, metavar="N",
                    help="run in fresh subprocesses of N queries each")
    ap.add_argument("--jobs", type=int, default=1, metavar="J",
                    help="with --isolate: run up to J batch subprocesses "
                         "concurrently (each child gets cpus/J executor "
                         "threads so the box is not oversubscribed); "
                         "census cost is dominated by ~17 serial JVM "
                         "startups otherwise")
    ap.add_argument("--only", default=None, metavar="CSV",
                    help="restrict to these query names (smoke/CI subsets)")
    ap.add_argument("--tier", choices=("full", "core"), default="full",
                    help="census tier (round 9): 'full' runs every "
                         "registered query; 'core' skips the CONTAINED "
                         "tier (queries whose every shape runs verbatim "
                         "inside other census rows — see registry.CONTAINED"
                         " for the per-query justification). The full tier "
                         "is the weekly / on-touch refresh; core is the "
                         "per-iteration gate.")
    ap.add_argument("--adversarial", action="store_true",
                    help="run the census against the hostile generated "
                         "dataset (datagen.py --adversarial: NULLs, dup "
                         "keys, empty strings, boundary timestamps, zero "
                         "vectors) instead of the driver fixtures; "
                         "generates .scaledata/adversarial on first use "
                         "and defaults --out to "
                         "CORRECTNESS_adversarial.json")
    ap.add_argument("--timeout", type=int, default=1800, metavar="SEC",
                    help="per-batch subprocess timeout with --isolate "
                         "(raise for sf>=1 censuses where one heavy batch "
                         "can legitimately exceed 30 min)")
    ap.add_argument("--run-batch", default=None, help="(internal) CSV of query names")
    args = ap.parse_args()

    if args.run_batch is not None:
        results = run_queries(args.run_batch.split(","), args.sf)
        print("\n" + json.dumps(results))
        return 0

    if args.adversarial:
        adv_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            ".scaledata", "adversarial",
        )
        if not os.path.exists(os.path.join(adv_dir, "lineitem.parquet")):
            import datagen

            datagen.generate(adv_dir, 0.001, adversarial=True)
        args.sf = adv_dir
        if args.out == "CORRECTNESS_local.json":  # the argparse default
            args.out = "CORRECTNESS_adversarial.json"

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from etl_procesos_odo_spark.registry import registry

    names = [q.name for q in registry()]
    if args.only:
        # validate --only against the FULL registry before tier filtering,
        # so a registered-but-contained name gets a truthful message
        wanted = set(args.only.split(","))
        unknown = wanted - set(names)
        if unknown:
            ap.error(f"unknown query names: {sorted(unknown)}")
    if args.tier == "core":
        from etl_procesos_odo_spark.registry import CONTAINED

        if args.only:
            demoted = set(args.only.split(",")) & set(CONTAINED)
            if demoted:
                ap.error(
                    f"excluded by --tier core (registry.CONTAINED): "
                    f"{sorted(demoted)} — drop --tier (full is the "
                    "default) to spot-check contained queries"
                )
        names = [n for n in names if n not in CONTAINED]
    if args.only:
        wanted = set(args.only.split(","))
        names = [n for n in names if n in wanted]
    results: dict = {}
    if not args.isolate:
        results = run_queries(names, args.sf)
    else:
        batches = [names[i:i + args.isolate] for i in range(0, len(names), args.isolate)]
        jobs = max(1, args.jobs)
        child_env = dict(os.environ)
        if jobs > 1:
            # split the box between concurrent children instead of
            # oversubscribing: each child JVM gets cpus/J executor threads
            host_cpus = os.cpu_count() or 32
            try:
                cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(host_cpus)))
            except ValueError:
                cpus = host_cpus
            child_env["SPARK_GRAFT_CPUS"] = str(max(8, cpus // jobs))

        def run_batch(batch: list[str]) -> dict:
            # never let one batch's infrastructure failure (timeout,
            # truncated stdout) propagate and discard every other
            # completed batch — record a per-query error entry instead
            try:
                return _run_batch_inner(batch)
            except Exception as e:
                return {
                    n: {"ok": False,
                        "error": f"batch-level {type(e).__name__}: {e}"[:300]}
                    for n in batch
                }

        def _run_batch_inner(batch: list[str]) -> dict:
            got: dict = {}
            proc = subprocess.run(
                [sys.executable, __file__, "--run-batch", ",".join(batch),
                 "--sf", args.sf],
                capture_output=True, text=True, timeout=args.timeout,
                env=child_env,
            )
            if proc.returncode == 0:
                got.update(json.loads(proc.stdout.strip().splitlines()[-1]))
                return got
            # batch crashed (e.g. JVM segfault) — retry one-by-one so
            # one poisoned query can't empty the whole artifact
            for n in batch:
                p1 = subprocess.run(
                    [sys.executable, __file__, "--run-batch", n, "--sf", args.sf],
                    capture_output=True, text=True, timeout=args.timeout,
                    env=child_env,
                )
                if p1.returncode == 0:
                    got.update(json.loads(p1.stdout.strip().splitlines()[-1]))
                else:
                    got[n] = {
                        "ok": False,
                        "error": f"process rc={p1.returncode}: "
                                 + p1.stderr[-300:],
                    }
            return got

        if jobs == 1:
            for batch in batches:
                results.update(run_batch(batch))
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=jobs) as pool:
                for got in pool.map(run_batch, batches):
                    results.update(got)

    out = results
    if args.only and os.path.exists(args.out):
        # subset runs MERGE into the existing artifact instead of
        # replacing a full-registry census with a handful of rows
        try:
            with open(args.out) as f:
                out = json.load(f)
        except Exception:
            out = {}
        out.update(results)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    n_ok = sum(1 for r in results.values() if r.get("ok"))
    bad = [k for k, r in results.items() if not r.get("ok")]
    print(f"{n_ok}/{len(results)} ok -> {args.out} ({len(out)} entries)")
    if bad:
        print("FAILED:", ", ".join(bad))
    return 0 if not bad else 1


if __name__ == "__main__":
    raise SystemExit(main())
