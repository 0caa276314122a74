"""Structured Streaming temporal operators (SURVEY.md §2.10).

The reference is batch-only; these are the natural streaming mappings of
its temporal semantics, driven here by the parquet file source (the smoke
path — production swaps in Kafka with identical plans):

- hourly/5-min demand counts (A1/A2/A4) → tumbling ``window()`` aggregates;
- dedup-keep-first per key (W1) → ``dropDuplicates`` with watermark;
- late data: the reference silently accepts any timestamp; the streaming
  variants bound state with a 1-day watermark — a documented divergence
  (SURVEY.md §2.10).

Memory-sink helpers run a bounded backfill synchronously
(``processAllAvailable``) and return the result as a batch DataFrame, which
is how the oracle-checked registry queries exercise the streaming engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table, with the same nanos→micros
    timestamp normalization as the batch loader (session.load_table)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def hourly_counts(stream: DataFrame) -> DataFrame:
    """Tumbling 1-hour window counts + exact value sums per event_type —
    the streaming form of the demand-curve aggregate (A1/A2)."""
    return (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )


def dedup_first_stream(stream: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Watermarked keep-one per (user_id, day) — the streaming form of the
    confirmaciones dedup (W1). State for a key is dropped once the
    watermark passes its day."""
    return (
        stream.withColumn("fecha", F.to_date("ts"))
        .withWatermark("ts", watermark)
        .dropDuplicates(["user_id", "fecha"])
    )


def run_to_memory(
    df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming frame to completion against the memory sink and
    return the materialized table (bounded-input smoke path)."""
    spark = df.sparkSession
    spark.catalog.dropTempView(name) if name in [
        t.name for t in spark.catalog.listTables()
    ] else None
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
    return spark.table(name)
