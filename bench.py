#!/usr/bin/env python
"""Benchmark harness: times every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced with the noop sink (full execution, no driver-side
result transfer), so timings measure the Spark plan, not collect().
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from etl_procesos_odo_spark.registry import registry
from etl_procesos_odo_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    only = os.environ.get("BENCH_QUERIES")
    wanted = set(only.split(",")) if only else None

    spark = get_spark("etl-odo-bench")
    # Warm the JVM/codegen/IO path once so session startup cost doesn't
    # land on whichever query happens to run first.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).write.mode(
        "overwrite"
    ).format("noop").save()
    timings: dict[str, float] = {}
    for q in registry():
        if wanted and q.name not in wanted:
            continue
        t0 = time.perf_counter()
        try:
            df = q.spark_fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            timings[q.name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # keep the bench line parseable on failure
            timings[q.name] = -1.0
            print(f"BENCH ERROR {q.name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "registry_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
