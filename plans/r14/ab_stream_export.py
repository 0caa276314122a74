#!/usr/bin/env python
"""Interleaved A/B of the run_to_memory export path (r13 driver
collect+createDataFrame vs r14 eager localCheckpoint) across the whole
run_to_memory-backed streaming family, min-of-reps per query per arm.
q58 keeps its r13 shape in the base arm (state_partitions=8) and its r14
shape (python_stateful_partitions) in the ckpt arm, so the A/B measures
the SHIPPED change per query.

Usage: python plans/r14/ab_stream_export.py [sf_dir] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/star_sf1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

QUERIES = [
    "q40_streaming_hourly", "q43_streaming_dedup", "q58_stateful_user_stats",
    "q69_streaming_sessionize", "q90_stream_static_join",
    "q91_streaming_sliding", "q95_stream_stream_join",
    "q113_streaming_heavy_hitters", "q131_streaming_quality_gate",
    "q161_streaming_hll", "q174_streaming_cms",
]


def run_to_memory_r13(df, name, output_mode="complete", state_partitions=8):
    """The pre-r14 export, pinned inline: collect to the driver and
    rebuild a local DataFrame. state_partitions is forced to 8 for q58's
    base arm (its r13 call site passed no override)."""
    spark = df.sparkSession
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(min(int(saved), 8)))
    try:
        q = (df.writeStream.outputMode(output_mode).format("memory")
             .queryName(name).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    sink = spark.table(name)
    rows, schema = sink.collect(), sink.schema
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, schema)


def child(arm: str) -> None:
    """One fresh-JVM arm pass: run all 11 queries once, print JSON."""
    from etl_procesos_odo_spark import queries_streaming_ml as qsm
    from etl_procesos_odo_spark.registry import registry
    from etl_procesos_odo_spark.session import get_spark
    from etl_procesos_odo_spark.streaming import temporal

    by_name = {q.name: q for q in registry() if q.name in QUERIES}
    spark = get_spark(f"r14-stream-export-{arm}")
    if arm == "base":
        # queries_streaming_ml imports run_to_memory by name at module
        # load, so both references must be patched
        temporal.run_to_memory = run_to_memory_r13
        qsm.run_to_memory = run_to_memory_r13
    # untimed streaming warmup: the first streaming query in a fresh JVM
    # pays engine/codegen/state-store init (measured 3-12 s of pure
    # first-run noise landing on whatever ran first)
    by_name["q131_streaming_quality_gate"].spark_fn(spark, SF_DIR).write.mode(
        "overwrite").format("noop").save()
    times: dict = {}
    for qn in QUERIES:
        spark.sparkContext.setJobDescription(f"{qn}-{arm}")
        t0 = time.perf_counter()
        by_name[qn].spark_fn(spark, SF_DIR).write.mode(
            "overwrite").format("noop").save()
        times[qn] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    acc = 0
    for i in range(20_000_000):
        acc += i
    calib = round(time.perf_counter() - t0, 3)
    spark.stop()
    print(json.dumps({"arm": arm, "times": times, "calib_20m": calib}),
          flush=True)


def main():
    """Fresh-JVM-per-arm interleaved A/B (the r13 ab_conf protocol —
    single-session arms contaminate each other through lingering state
    store providers and checkpoint blocks; measured 30 s+ drift on q69
    within one JVM)."""
    import subprocess

    if len(sys.argv) > 3 and sys.argv[3] == "--child":
        child(sys.argv[4])
        return
    res: dict = {}
    calibs = []
    for rep in range(REPS):
        for arm in ("base", "ckpt"):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), SF_DIR,
                 str(REPS), "--child", arm],
                capture_output=True, text=True, timeout=2400)
            rec = None
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    rec = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
            if rec is None:
                print(f"ARM {arm} rep {rep} FAILED rc={proc.returncode}",
                      file=sys.stderr)
                print(proc.stderr[-2000:], file=sys.stderr)
                continue
            calibs.append({"arm": arm, "rep": rep,
                           "calib_20m": rec["calib_20m"]})
            for qn, t in rec["times"].items():
                res.setdefault(qn, {}).setdefault(arm, []).append(t)
    mins = {qn: {arm: min(v) for arm, v in arms.items()}
            for qn, arms in res.items()}
    tot = {arm: round(sum(m.get(arm, 0) for m in mins.values()), 3)
           for arm in ("base", "ckpt")}
    print(json.dumps({"per_query_all_reps": res, "mins": mins,
                      "total_min_of_reps": tot, "calibs": calibs,
                      "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
