#!/usr/bin/env python
"""Interleaved fresh-JVM A/B for SESSION-CONF probes (r13, guide §3.1/§9).

Child mode (CONF_AB_ARM set): build one session with the arm's extra conf,
warm it, cold-time the subset queries (construction + noop sink, the bench
methodology), print one JSON line.

Parent mode: alternate arms rep-by-rep (A,B,C,A,B,C,...) so host drift
lands on both arms equally; report per-query times per rep plus a 20M-loop
calibration per child run. Decision rule: compare min-across-reps per query
(strips steal bursts), same as the round's stash A/Bs.

Usage: python plans/r13/ab_conf.py [reps]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

SUBSET = [
    "q64_corpus_prep",
    "q77_corpus_prep_pack",
    "q87_kmeans_step",
    "q103_semantic_dedup",
    "q107_ann_recall",
    "q111_kmeans_train",
    "q112_hybrid_rrf",
    "q120_hybrid_rrf_routed",
    "q123_ann_ivf_trained",
    "q136_dedup_method_agreement",
    "q146_neardup_triangles",
    "q154_tfidf_cosine_pairs",
    "q168_kmv_source_sketch",
]

ARMS = {
    # base: the PRE-CHANGE policy, pinned explicitly (r13 advice fix) —
    # after the shj arm shipped as the session default, an implicit {}
    # base would silently equal the shj arm and the recorded
    # 86.5s -> 59.8s decision could no longer be reproduced
    "base": {"spark.sql.join.preferSortMergeJoin": "true"},
    # planner-level: allow shuffled-hash when its size conditions are met
    "shj": {"spark.sql.join.preferSortMergeJoin": "false"},
    # AQE-level: rewrite SMJ->SHJ at runtime when every post-shuffle
    # partition is under the threshold (scale-safe: falls back to SMJ on
    # big partitions instead of risking a build-side OOM)
    "aqe_shj": {
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m"
    },
}


def child(arm: str) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_procesos_odo_spark.registry import registry
    from etl_procesos_odo_spark.session import get_spark

    spark = get_spark(f"ab-conf-{arm}", extra_conf=ARMS[arm])
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).write.mode(
        "overwrite"
    ).format("noop").save()
    wanted = set(SUBSET)
    times: dict[str, float] = {}
    for q in registry():
        if q.name not in wanted:
            continue
        t0 = time.perf_counter()
        try:
            q.spark_fn(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            times[q.name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:
            times[q.name] = -1.0
            print(f"AB ERROR {q.name}: {exc}", file=sys.stderr)
    t0 = time.perf_counter()
    acc = 0
    for i in range(20_000_000):
        acc += i
    cal = round(time.perf_counter() - t0, 3)
    for sq in spark.streams.active:
        try:
            sq.stop()
        except Exception:
            pass
    spark.stop()
    print(json.dumps({"arm": arm, "cal": cal, "queries": times}), flush=True)


def main() -> None:
    arm = os.environ.get("CONF_AB_ARM")
    if arm:
        child(arm)
        return
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    runs: list[dict] = []
    for r in range(reps):
        for arm in ARMS:
            env = dict(os.environ, CONF_AB_ARM=arm)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
            )
            parsed = None
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    parsed = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
            if parsed is None:
                print(f"AB rep{r} arm={arm}: no JSON rc={proc.returncode}\n"
                      f"{proc.stderr[-800:]}", file=sys.stderr)
                continue
            parsed["rep"] = r
            runs.append(parsed)
            print(json.dumps(parsed), flush=True)
    # summary: min across reps per arm per query
    summary: dict[str, dict[str, float]] = {}
    for run in runs:
        for qn, t in run["queries"].items():
            if t < 0:
                continue
            cur = summary.setdefault(qn, {})
            cur[run["arm"]] = min(cur.get(run["arm"], 1e9), t)
    totals = {a: 0.0 for a in ARMS}
    print("\nquery                              " +
          "".join(f"{a:>10}" for a in ARMS))
    for qn in SUBSET:
        row = summary.get(qn, {})
        print(f"{qn:35}" + "".join(
            f"{row.get(a, float('nan')):10.2f}" for a in ARMS))
        for a in ARMS:
            if a in row:
                totals[a] += row[a]
    print(f"{'TOTAL (min-of-reps)':35}" + "".join(
        f"{totals[a]:10.2f}" for a in ARMS))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "ab_conf_result.json"), "w") as fh:
        json.dump({"runs": runs, "min_of_reps": summary}, fh, indent=1)


if __name__ == "__main__":
    main()
