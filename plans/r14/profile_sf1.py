#!/usr/bin/env python
"""Round-14 profiling (guide §1: measure first) of the VERDICT-named sf1
targets: q175 ppjoin (stage breakdown), q58/q95/q69 streaming state
(progress telemetry: state rows/bytes/churn + phase durations), q138/q157
(cold + warm timings for the sf1 revisit).

Usage: python plans/r14/profile_sf1.py [q175|streaming|q138q157|all]
Writes JSON lines to stdout; run on a quiet host.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scaledata/star_sf1")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timed(spark, tag, build):
    spark.sparkContext.setJobDescription(tag)
    t0 = time.perf_counter()
    out = build()
    el = round(time.perf_counter() - t0, 3)
    print(json.dumps({"stage": tag, "sec": el, "extra": out}), flush=True)
    spark.sparkContext.setJobDescription(None)
    return el


def profile_q175(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_procesos_odo_spark.llm.dedup import ppjoin_pairs, shingles

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t_n, t_d, k = 4, 5, 3

    g = docs.select(
        F.col("doc_id").alias("id"), shingles(F.col("text"), k).alias("grams")
    ).filter(F.size("grams") > 0)
    timed(spark, "q175/g_checkpoint", lambda: g.localCheckpoint(eager=True) and None)
    g2 = g.localCheckpoint(eager=True)

    df_tab = (
        g2.select(F.explode("grams").alias("gram"))
        .groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    )
    timed(spark, "q175/df_tab", lambda: noop(df_tab))
    n_vocab = df_tab.count()

    w = Window.orderBy("df", "gram")
    rk = df_tab.select("gram", F.row_number().over(w).alias("rk"))
    timed(spark, "q175/rk_global_window", lambda: noop(rk))

    ranked = (
        g2.select("id", F.explode("grams").alias("gram"))
        .join(rk, "gram")
        .groupBy("id")
        .agg(F.expr(
            "transform(array_sort(collect_list(struct(rk, gram))), s -> s.gram)"
        ).alias("sorted_grams"))
        .selectExpr(
            "id", "size(sorted_grams) as n",
            f"slice(sorted_grams, 1, size(sorted_grams) "
            f"- (({t_n} * size(sorted_grams) + {t_d} - 1) div {t_d}) + 1) as prefix",
        )
    )
    timed(spark, "q175/ranked", lambda: noop(ranked))

    pa = ranked.select(F.col("id").alias("id_a"), F.col("n").alias("na"),
                       F.explode("prefix").alias("gram"))
    pb = ranked.select(F.col("id").alias("id_b"), F.col("n").alias("nb"),
                       F.explode("prefix").alias("gram"))
    raw = pa.join(pb, "gram").filter(F.col("id_a") < F.col("id_b"))
    n_raw = raw.count()
    lenf = raw.filter(
        (F.lit(t_n) * F.col("na") <= F.lit(t_d) * F.col("nb"))
        & (F.lit(t_n) * F.col("nb") <= F.lit(t_d) * F.col("na"))
    )
    n_lenf = lenf.count()
    cand = lenf.select("id_a", "id_b").distinct()
    n_cand = cand.count()
    print(json.dumps({"stage": "q175/candidate_volumes", "n_vocab": n_vocab,
                      "n_raw_prefix_matches": n_raw,
                      "n_after_length_filter": n_lenf,
                      "n_distinct_candidates": n_cand}), flush=True)
    timed(spark, "q175/full_cold", lambda: noop(
        ppjoin_pairs(docs, "text", "doc_id", 4, 5)))
    n_pairs = ppjoin_pairs(docs, "text", "doc_id", 4, 5).count()
    print(json.dumps({"stage": "q175/final_pairs", "n": n_pairs}), flush=True)
    timed(spark, "q175/full_warm", lambda: noop(
        ppjoin_pairs(docs, "text", "doc_id", 4, 5)))


def run_stream_profiled(spark, df, name, output_mode, state_partitions):
    """run_to_memory clone that captures progress telemetry."""
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(min(int(saved), state_partitions)))
    prog = []
    try:
        t0 = time.perf_counter()
        q = (df.writeStream.outputMode(output_mode).format("memory")
             .queryName(name).start())
        try:
            q.processAllAvailable()
            prog = [json.loads(p.json) for p in q.recentProgress]
        finally:
            q.stop()
        el = round(time.perf_counter() - t0, 3)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    sink = spark.table(name)
    n = sink.count()
    spark.catalog.dropTempView(name)
    ops = []
    for p in prog:
        for so in p.get("stateOperators", []):
            ops.append({k: so.get(k) for k in (
                "operatorName", "numRowsTotal", "numRowsUpdated",
                "numRowsRemoved", "memoryUsedBytes", "commitTimeMs",
                "timeTakenMs", "numShufflePartitions")})
        ops.append({"durationMs": p.get("durationMs"),
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows")})
    print(json.dumps({"stage": name, "sec": el, "out_rows": n,
                      "state_partitions": state_partitions,
                      "progress": ops}), flush=True)
    return el


def profile_streaming(spark):
    from pyspark.sql import functions as F

    from etl_procesos_odo_spark.streaming.temporal import (
        attribution_join, events_stream, sessionized_stream,
        stateful_user_stats,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for sp in (8, 16, 32):
        run_stream_profiled(
            spark, stateful_user_stats(events_stream(spark, SF_DIR)),
            f"q58_profile_sp{sp}", "append", sp)
    for sp in (8, 16, 32):
        clicks = events_stream(spark, SF_DIR).filter(F.col("event_type") == "click")
        purchases = events_stream(spark, SF_DIR).filter(F.col("event_type") == "purchase")
        run_stream_profiled(
            spark, attribution_join(clicks, purchases),
            f"q95_profile_sp{sp}", "append", sp)
    for sp in (8, 16, 32):
        run_stream_profiled(
            spark, sessionized_stream(events_stream(spark, SF_DIR)),
            f"q69_profile_sp{sp}", "complete", sp)


def profile_q138_q157(spark):
    from etl_procesos_odo_spark.registry import registry

    by_name = {q.name: q for q in registry()}
    for name in ("q138_bigram_lm_score", "q157_substring_removal"):
        q = by_name[name]
        timed(spark, f"{name}/cold", lambda: noop(q.spark_fn(spark, SF_DIR)))
        timed(spark, f"{name}/warm", lambda: noop(q.spark_fn(spark, SF_DIR)))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from etl_procesos_odo_spark.session import get_spark

    spark = get_spark("r14-profile")
    t0 = time.perf_counter()
    acc = 0
    for i in range(20_000_000):
        acc += i
    print(json.dumps({"stage": "calibration_20m_loop",
                      "sec": round(time.perf_counter() - t0, 3)}), flush=True)
    if which in ("q175", "all"):
        profile_q175(spark)
    if which in ("streaming", "all"):
        profile_streaming(spark)
    if which in ("q138q157", "all"):
        profile_q138_q157(spark)
    spark.stop()


if __name__ == "__main__":
    main()
