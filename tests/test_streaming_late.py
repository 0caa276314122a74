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


def test_checkpoint_restart_session_window(spark, tmp_path):
    """Checkpointed restart for the SESSION-WINDOW family (q69's
    sessionized_stream): stop mid-corpus, add a file whose events EXTEND
    an already-emitted session (the state-merge case unique to session
    windows — the restarted query must recover the open session from the
    state store and widen it, not emit a duplicate), plus a brand-new
    session, then restart from the SAME checkpoint. The final complete-
    mode output must equal the batch session_window answer exactly."""
    import datetime

    from pyspark.sql import functions as F

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_procesos_odo_spark.streaming.temporal import sessionized_stream

    src = tmp_path / "src"
    chk = str(tmp_path / "chk")
    src.mkdir()

    def ts(h, m):
        return datetime.datetime(2024, 3, 1, h, m)

    batch1 = [("A", ts(10, 0), 1.5), ("A", ts(10, 10), 2.0),
              ("B", ts(9, 0), 4.25)]
    # A @10:25 is within the 30-min gap of A's (10:00-10:40) session ->
    # the restarted query must EXTEND that session's state; A @12:00 and
    # C are new sessions
    batch2 = [("A", ts(10, 25), 0.5), ("A", ts(12, 0), 3.0),
              ("C", ts(11, 0), 7.0)]

    def write_file(rows, name):
        pq.write_table(
            pa.table({
                "user_id": [r[0] for r in rows],
                "ts": pa.array([r[1] for r in rows],
                               type=pa.timestamp("us", tz="UTC")),
                "value": [r[2] for r in rows],
            }),
            str(src / name),
        )

    write_file(batch1, "a.parquet")

    def run_once(name):
        stream = spark.readStream.schema(
            "user_id string, ts timestamp, value double"
        ).parquet(str(src))
        q = (
            sessionized_stream(stream, gap="30 minutes")
            .writeStream.outputMode("complete").format("memory")
            .queryName(name).option("checkpointLocation", chk).start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.table(name).collect()
        spark.catalog.dropTempView(name)
        return sorted(map(tuple, rows))

    first = run_once("sess_chk_run1")
    # pre-restart: A holds ONE open session (10:00-10:40), B one
    assert len(first) == 2
    write_file(batch2, "b.parquet")
    second = run_once("sess_chk_run2")

    all_rows = spark.createDataFrame(
        batch1 + batch2, "user_id string, ts timestamp, value double"
    )
    expected = sorted(map(tuple, (
        all_rows.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events", "total_value",
        )
    ).collect()))
    assert second == expected
    # the extended A session is one widened row (10:00 -> 10:55), with
    # all three events and the exact decimal sum — not a duplicate pair
    a_sessions = [r for r in second if r[0] == "A"]
    assert len(a_sessions) == 2  # widened morning session + noon session
    widened = min(a_sessions, key=lambda r: r[1])
    assert widened[3] == 3 and abs(widened[4] - 4.0) < 1e-12


def test_checkpoint_restart_stateless_decontamination_gate(spark, tmp_path):
    """Checkpointed restart for the STATELESS q156 family (bloom probe +
    stream-static join, append mode): stop the gate mid-corpus, land
    more corpus files, restart from the SAME checkpoint. Stateless plans
    recover purely from the file-source offset log — the resumed query
    must emit match events for only the NEW files (exactly-once per
    file, no re-emission of batch-1 matches), and the union of both
    runs' append output must equal the batch gate exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from etl_procesos_odo_spark.llm.dedup import (
        BLOOM_K,
        BLOOM_M_BITS,
        bloom_bitmap_bits,
        bloom_probe_filter,
        shingles,
    )

    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    src = tmp_path / "src"
    chk = str(tmp_path / "chk")
    src.mkdir()

    batch1 = [(1, "intro words then " + bench_text + " plus a tail"),
              (2, "nothing in common with anything else at all here")]
    batch2 = [(3, bench_text + " again " + bench_text),
              (4, "still unrelated filler text rows only")]

    def land(rows, name):
        pq.write_table(
            pa.table({"doc_id": [r[0] for r in rows],
                      "text": [r[1] for r in rows]}),
            str(src / name),
        )

    bench = spark.createDataFrame(
        [(100, bench_text), (101, "a second benchmark prompt entirely")],
        ["doc_id", "text"],
    )
    b = bench.select(
        F.col("doc_id").alias("b_id"),
        F.explode(shingles(F.col("text"), 3)).alias("g"),
    )
    bits = bloom_bitmap_bits(b.select("g").distinct(), "g")

    out = str(tmp_path / "out")

    def run_once():
        # append-mode recovery needs a real (file) sink — the memory
        # sink only supports checkpoint recovery in complete mode; a
        # production gate lands match events in Kafka/Delta the same way
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(str(src))
        )
        t = stream.select(
            "doc_id", F.explode(shingles(F.col("text"), 3)).alias("g")
        )
        surv = t.filter(
            bloom_probe_filter(F.col("g"), bits, BLOOM_M_BITS, BLOOM_K)
        )
        matched = surv.join(b, "g").select("doc_id", "b_id")
        q = (
            matched.writeStream.outputMode("append").format("parquet")
            .option("path", out).option("checkpointLocation", chk).start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return sorted(
            tuple(r) for r in spark.read.parquet(out).collect()
        )

    land(batch1, "a.parquet")
    first = run_once()
    assert {d for d, _ in first} == {1}  # doc 1 matches, doc 2 doesn't
    land(batch2, "b.parquet")
    both = run_once()
    # exactly-once per file: the resumed run appends ONLY new-file
    # matches — batch-1 matches appear once, not twice
    second = list(both)
    for r in first:
        second.remove(r)  # raises if a batch-1 row went missing
    assert {d for d, _ in second} == {3}
    # the full sink contents == the batch gate over the full corpus
    corpus = spark.createDataFrame(batch1 + batch2, ["doc_id", "text"])
    t = corpus.select(
        "doc_id", F.explode(shingles(F.col("text"), 3)).alias("g")
    )
    batch_rows = sorted(
        tuple(r)
        for r in t.filter(
            bloom_probe_filter(F.col("g"), bits, BLOOM_M_BITS, BLOOM_K)
        ).join(b, "g").select("doc_id", "b_id").collect()
    )
    assert both == batch_rows


def test_run_append_partials_multibatch_decomposable(spark, tmp_path):
    """run_append_partials must equal the batch aggregate when the
    stream arrives in MULTIPLE micro-batches (maxFilesPerTrigger=1):
    per-batch partial counts unioned + final SUM == one global count —
    the decomposability contract q156 relies on."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_procesos_odo_spark.streaming.temporal import (
        run_append_partials,
    )

    src = tmp_path / "src"
    src.mkdir()
    # key 'a' spans both files -> its count MUST be summed across the
    # two micro-batches, not taken from either one
    pq.write_table(
        pa.table({"k": ["a", "a", "b"], "v": [1, 2, 3]}), str(src / "f1.parquet")
    )
    pq.write_table(
        pa.table({"k": ["a", "c", "c"], "v": [4, 5, 6]}), str(src / "f2.parquet")
    )

    stream = (
        spark.readStream.schema("k string, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )

    def partial(bdf):
        return bdf.groupBy("k").agg(F.count(F.lit(1)).alias("n_part"))

    def finalize(parts):
        return parts.groupBy("k").agg(F.sum("n_part").alias("n"))

    out = run_append_partials(stream, "t_rap_multibatch", partial, finalize)
    assert sorted(tuple(r) for r in out.collect()) == [
        ("a", 3), ("b", 1), ("c", 2)
    ]


def test_run_append_partials_empty_stream(spark, tmp_path):
    """Zero-data stream: no micro-batch ever fires, so no partial file
    exists — the helper must still return an EMPTY frame with the
    finalize schema instead of failing on an empty parquet dir."""
    from etl_procesos_odo_spark.streaming.temporal import (
        run_append_partials,
    )

    src = tmp_path / "empty_src"
    src.mkdir()
    stream = spark.readStream.schema("k string, v long").parquet(str(src))

    def partial(bdf):
        return bdf.groupBy("k").agg(F.count(F.lit(1)).alias("n_part"))

    def finalize(parts):
        return parts.groupBy("k").agg(F.sum("n_part").alias("n"))

    out = run_append_partials(stream, "t_rap_empty", partial, finalize)
    assert out.columns == ["k", "n"]
    assert out.count() == 0


def test_run_append_partials_refire_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once under checkpointed restart/retry: a
    RE-FIRED micro-batch must replace its own spooled partials, never
    double-count them. Drives the module-level emitter directly — fire
    batch 0, fire it AGAIN (the retry), then fire batch 1 — and checks
    the spool reads back as exactly one copy of each batch."""
    from etl_procesos_odo_spark.streaming.temporal import _partial_emitter

    spool = str(tmp_path / "spool")

    def partial(bdf):
        return bdf.groupBy("k").agg(F.count(F.lit(1)).alias("n_part"))

    emit = _partial_emitter(spool, partial)
    b0 = spark.createDataFrame([("a", 1), ("a", 2)], "k string, v long")
    b1 = spark.createDataFrame([("a", 3), ("b", 4)], "k string, v long")
    emit(b0, 0)
    emit(b0, 0)  # the retry: same batch id, same data
    emit(b1, 1)
    parts = spark.read.option("recursiveFileLookup", "true").parquet(spool)
    merged = sorted(
        tuple(r)
        for r in parts.groupBy("k").agg(F.sum("n_part").alias("n")).collect()
    )
    # a += retry would report ("a", 4): batch 0's two rows counted twice
    assert merged == [("a", 3), ("b", 1)]
