#!/usr/bin/env python
"""Round-14 SHJ adverse-condition arm (r13 verdict item 3/5): measure the
guide's named risk for `spark.sql.join.preferSortMergeJoin=false` — a
MISESTIMATED build side (planner statistics far below runtime bytes)
under a small heap, where shuffled-hash's non-spilling build can OOM
while sort-merge spills gracefully.

Setup: the build side is a parquet table of constant-ish 400-char
payloads — dictionary/RLE compression makes the FILE (the planner's size
estimate) ~100x smaller than the runtime rows, the exact post-filter/UDF
misestimation failure mode the advice names. autoBroadcastJoinThreshold
is dropped to 2 MB in every arm so the ~28 MB misestimated side cannot
escape into a broadcast (at 100 TB a build side like this is far over
the broadcast bar anyway) while the planner's SHJ size condition
(est < threshold x partitions = 64 MB, 3x smaller than probe) is still
satisfied by the WRONG estimate. Driver heap is forced small via
SPARK_DRIVER_MEMORY (local mode: one JVM holds all build maps).

Arms (each a fresh subprocess):
  shj  — shipped conf (preferSortMergeJoin=false)
  smj  — SPARK_GRAFT_PREFER_SMJ=true (the documented revert trigger)
  aqe  — prefer SMJ statically + maxShuffledHashJoinLocalMapThreshold=64m
         (the AQE-level alternative the r13 advice suggested: rewrites to
         SHJ only when RUNTIME partition bytes are under the threshold,
         so a misestimated build side falls back to SMJ by itself)

Usage:  python plans/r14/shj_adverse.py            # orchestrate all arms
        python plans/r14/shj_adverse.py --child ARM  # one arm (internal)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

DATA = "/tmp/r14_shj_adverse"
N_BUILD = 8_000_000   # ~3.3 GB runtime build rows vs a ~37 MB file estimate
N_PROBE = 24_000_000
HEAP = os.environ.get("SHJ_ADVERSE_HEAP", "4g")

ARMS = {
    "shj": {},
    "smj": {"spark.sql.join.preferSortMergeJoin": "true"},
    "aqe": {
        "spark.sql.join.preferSortMergeJoin": "true",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
    },
}


def gen(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(DATA, "build", "_SUCCESS")):
        return
    build = spark.range(N_BUILD).select(
        F.col("id").alias("k"),
        F.concat(
            F.lpad(F.lit("x"), 380, "x"), (F.col("id") % 1000).cast("string")
        ).alias("payload"),
    )
    build.write.mode("overwrite").parquet(os.path.join(DATA, "build"))
    probe = spark.range(N_PROBE).select(
        (F.col("id") % N_BUILD).alias("k"), (F.col("id") * 3).alias("v")
    )
    probe.write.mode("overwrite").parquet(os.path.join(DATA, "probe"))


def child(arm: str) -> None:
    from etl_procesos_odo_spark.session import get_spark

    from pyspark.sql import functions as F

    spark = get_spark(f"r14-shj-adverse-{arm}", extra_conf=ARMS[arm])
    gen(spark)
    # threshold window that pins the planner's choice: the ~28 MB build
    # FILE estimate stays over the broadcast bar (no BHJ escape) while
    # estimate < threshold x 32 partitions keeps SHJ's size condition
    # satisfied by the WRONG number (runtime rows are ~2.5 GB)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(2 * 1024 * 1024))
    b = spark.read.parquet(os.path.join(DATA, "build"))
    p = spark.read.parquet(os.path.join(DATA, "probe"))
    j = p.join(b, on="k").select(
        F.sum(F.length("payload") + F.col("v")).alias("s")
    )
    plan = j._sc._jvm.PythonSQLUtils.explainString(
        j._jdf.queryExecution(), "simple")
    join_node = ("ShuffledHashJoin" if "ShuffledHashJoin" in plan
                 else "SortMergeJoin" if "SortMergeJoin" in plan
                 else "other")
    t0 = time.perf_counter()
    j.write.mode("overwrite").format("noop").save()
    el = round(time.perf_counter() - t0, 3)
    print(json.dumps({"arm": arm, "static_join": join_node, "sec": el,
                      "heap": HEAP}), flush=True)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(sys.argv[2])
        return
    # generate the dataset once with a roomy heap so generation never OOMs
    env0 = dict(os.environ, SPARK_DRIVER_MEMORY="8g")
    subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "from etl_procesos_odo_spark.session import get_spark; "
         "import importlib.util as iu; "
         "spec = iu.spec_from_file_location('sa', %r); m = iu.module_from_spec(spec); "
         "spec.loader.exec_module(m); s = get_spark('r14-shj-gen'); m.gen(s); s.stop()"
         % (REPO, os.path.abspath(__file__))],
        env=env0, check=True)
    results = []
    for arm in ARMS:
        env = dict(os.environ, SPARK_DRIVER_MEMORY=HEAP)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", arm],
            env=env, capture_output=True, text=True, timeout=1800)
        rec = None
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                rec = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
        if rec is None:
            tail = (proc.stderr or "")[-1200:]
            err = proc.stderr or ""
            oom = ("OutOfMemoryError" in err or "SparkOutOfMemory" in err
                   or "Java heap space" in err
                   or "Unable to acquire" in err)
            rec = {"arm": arm, "failed": True, "oom_signature": oom,
                   "rc": proc.returncode, "stderr_tail": tail}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    out = os.path.join(REPO, "plans", "r14", "shj_adverse_result.json")
    with open(out, "w") as fh:
        json.dump({"heap": HEAP, "n_build": N_BUILD, "n_probe": N_PROBE,
                   "arms": results}, fh, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
