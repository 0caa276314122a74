"""Late-data semantics under a real multi-batch stream (SURVEY.md §2.10):
the watermark must finalize windows and drop events that arrive after it.

The oracle-parity streaming queries (q40/q43/q56/q58) run bounded
single-batch backfills where no data is ever late; this test drives the
actual two-trigger path — file source with maxFilesPerTrigger=1 — and
observes a late event being excluded from a finalized window.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
    ]
)


def test_watermark_drops_late_rows(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = tmp_path / "stream_src"
    src.mkdir()

    def write_batch(name, rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / f"_stage_{name}"))
        # atomically-ish move one parquet file into the source dir
        import glob
        import shutil

        part = glob.glob(str(tmp_path / f"_stage_{name}" / "part-*.parquet"))[0]
        shutil.copy(part, str(src / f"{name}.parquet"))

    t = lambda s: __import__("datetime").datetime.fromisoformat(s)  # noqa: E731
    # batch 1: two rows in the 10:00 window; a 12:00 row pushes the
    # watermark (1h delay) to 11:00, past the 10:00 window's end
    write_batch(
        "b1",
        [
            (1, t("2024-01-01 10:00:00"), "click"),
            (2, t("2024-01-01 10:30:00"), "click"),
            (3, t("2024-01-01 12:00:00"), "click"),
        ],
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_test_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE row for the already-finalized 10:00 window
        # (10:15 < watermark 11:00) plus an on-time 14:00 row
        write_batch(
            "b2",
            [
                (4, t("2024-01-01 10:15:00"), "click"),
                (5, t("2024-01-01 14:00:00"), "click"),
            ],
        )
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            rows = {
                r["window_start"].isoformat(): r["n"]
                for r in spark.table("late_test_out").collect()
            }
            if "2024-01-01T10:00:00" in rows:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    rows = {
        r["window_start"].isoformat(): r["n"]
        for r in spark.table("late_test_out").collect()
    }
    # the 10:00 window finalized with the 2 on-time rows; the late 10:15
    # arrival was dropped by the watermark
    assert rows.get("2024-01-01T10:00:00") == 2, rows


def test_checkpoint_restart_exactly_once(spark, tmp_path):
    """Checkpointed restart: stop a file-source stream mid-corpus, add
    more input, restart from the SAME checkpoint — the resumed query must
    process only the new file (offset log) and the final aggregate must
    equal the batch answer exactly (no duplicates, no gaps). This is the
    recovery contract a production 100 TB pipeline leans on; the memory
    sink is swapped for Kafka/Delta there."""
    from pyspark.sql import functions as F

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    chk = str(tmp_path / "chk")
    src.mkdir()
    base = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )

    def write_flat(ids, name):
        pq.write_table(
            pa.table({"id": ids, "k": [i % 7 for i in ids]}),
            str(src / name),
        )

    write_flat(list(range(60)), "a.parquet")

    def run_once(name):
        stream = (
            spark.readStream.schema("id long, k long").parquet(str(src))
        )
        agg = stream.groupBy("k").agg(
            F.count("*").alias("n"), F.sum("id").alias("s")
        )
        q = (
            agg.writeStream.outputMode("complete").format("memory")
            .queryName(name).option("checkpointLocation", chk).start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.table(name).collect()
        spark.catalog.dropTempView(name)
        return {r["k"]: (r["n"], r["s"]) for r in rows}

    first = run_once("chk_run1")
    assert sum(n for n, _ in first.values()) == 60
    write_flat(list(range(60, 100)), "b.parquet")
    second = run_once("chk_run2")
    expected = {
        r["k"]: (r["n"], r["s"])
        for r in base.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("id").alias("s"))
        .collect()
    }
    assert second == expected
