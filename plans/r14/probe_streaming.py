#!/usr/bin/env python
"""Round-14 streaming probes (verdict items 1/8): A/B the run_to_memory
export path (driver collect+createDataFrame vs JVM-side eager
localCheckpoint) and q58's state-partition count, at sf1, noop-sink
timed like the bench.

Usage: python plans/r14/probe_streaming.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/star_sf1"


def run_to_memory_ckpt(df, name, output_mode="complete", state_partitions=8):
    """run_to_memory with the export swapped: sink rows stay in the JVM
    (eager localCheckpoint) instead of a driver collect+createDataFrame
    round-trip."""
    spark = df.sparkSession
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(min(int(saved), state_partitions))
    )
    try:
        q = (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


def main():
    from etl_procesos_odo_spark.session import get_spark
    from etl_procesos_odo_spark.streaming.temporal import (
        attribution_join, events_stream, run_to_memory, sessionized_stream,
        stateful_user_stats,
    )

    spark = get_spark("r14-streaming-probe")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    def q69_base():
        return run_to_memory(
            sessionized_stream(events_stream(spark, SF_DIR)), "p69b", "complete")

    def q69_ckpt():
        return run_to_memory_ckpt(
            sessionized_stream(events_stream(spark, SF_DIR)), "p69c", "complete")

    def q58_base():
        return run_to_memory(
            stateful_user_stats(events_stream(spark, SF_DIR)), "p58b", "append")

    def q58_ckpt_sp32():
        return run_to_memory_ckpt(
            stateful_user_stats(events_stream(spark, SF_DIR)), "p58c",
            "append", state_partitions=32)

    def q95_base():
        clicks = events_stream(spark, SF_DIR).filter(F.col("event_type") == "click")
        purchases = events_stream(spark, SF_DIR).filter(F.col("event_type") == "purchase")
        return run_to_memory(attribution_join(clicks, purchases), "p95b", "append")

    def q95_ckpt():
        clicks = events_stream(spark, SF_DIR).filter(F.col("event_type") == "click")
        purchases = events_stream(spark, SF_DIR).filter(F.col("event_type") == "purchase")
        return run_to_memory_ckpt(attribution_join(clicks, purchases), "p95c", "append")

    arms = {
        "q69_base": q69_base, "q69_ckpt": q69_ckpt,
        "q58_base": q58_base, "q58_ckpt_sp32": q58_ckpt_sp32,
        "q95_base": q95_base, "q95_ckpt": q95_ckpt,
    }
    res = {}
    for rep in range(2):
        for tag, fn in arms.items():
            spark.sparkContext.setJobDescription(f"{tag}-rep{rep}")
            t0 = time.perf_counter()
            noop(fn())
            res.setdefault(tag, []).append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"ab": res, "sf_dir": SF_DIR,
                      "mins": {t: min(v) for t, v in res.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
