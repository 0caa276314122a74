"""SparkSession factory (layer 0).

Local-mode settings follow the harness contract (local[$SPARK_GRAFT_CPUS],
32 shuffle partitions ~ cores); at cluster scale the same builder is reused
with master/shuffle-partitions supplied by the deployment, and AQE re-plans
shuffle sizing and skew joins at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl-procesos-odo-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    UTC session timezone keeps timestamp semantics identical to the DuckDB
    oracle; Arrow is on for the Pandas-UDF slow paths; AQE handles runtime
    partition coalescing and skew-join splitting at scale.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus), 8)
        except ValueError:
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # r13 (guide §3.1/§9): let the planner pick shuffled-hash join when
        # its size conditions hold (build side under
        # autoBroadcastJoinThreshold x shuffle partitions and 3x smaller
        # than the probe) instead of always sorting both sides. Measured
        # on the 13 SortMergeJoin-bearing registry queries (interleaved
        # fresh-JVM A/B, min-of-2-reps, sf0.1, plans/r13/ab_conf_result
        # .json): 86.5 s -> 59.8 s (-31%; q107 19.1->9.3, q168 12.4->7.7,
        # q112 4.1->2.6) with zero plan regressions. Size-conditioned, so
        # it scales with per-partition bytes, not with local[32]; a
        # deployment where build-side estimates are untrustworthy can
        # revert via SPARK_GRAFT_PREFER_SMJ=true without a code change.
        # AQE skew-join splitting covers SHJ as well as SMJ in Spark 3.3+.
        # env value normalized (r13 advice): Spark only accepts
        # case-insensitive true/false for boolean confs, so '1'/'yes'/
        # 'True ' must map to 'true' instead of failing session
        # construction with IllegalArgumentException
        .config(
            "spark.sql.join.preferSortMergeJoin",
            "true"
            if os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false")
            .strip().lower() in ("1", "true", "yes")
            else "false",
        )
        # r14 (adverse-condition arm, plans/r14/shj_adverse.py): on a
        # deliberately misestimated build side (28-37 MB file estimate,
        # 2.5-3.3 GB runtime rows, 4 GB heap) the planner-level SHJ pick
        # is 1.5-2x slower than SMJ and OOM-flaky at the margin, while
        # the AQE-level rewrite (maxShuffledHashJoinLocalMapThreshold)
        # sees the REAL runtime partition bytes and stays on SMJ — safe
        # and fastest there. Deployments with untrustworthy size
        # estimates set SPARK_GRAFT_PREFER_SMJ=true and this threshold
        # (e.g. 64m) to keep the SHJ win only where runtime sizes prove
        # it fits; unset (default 0) preserves the shipped local-mode
        # behavior and the r13 A/B baseline.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_AQE_THRESHOLD", "0"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # driver-generated parquet stores naive (isAdjustedToUTC=false)
        # timestamps; read them as LTZ (session TZ is UTC) so epoch
        # functions work and semantics match the DuckDB oracle
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # long-session hygiene: the correctness harness runs the whole
        # 67-query registry in one JVM — reclaim shuffle files, broadcast
        # blocks and localCheckpoint RDDs promptly instead of at the default
        # 30-min ContextCleaner GC tick
        .config("spark.cleaner.periodicGC.interval", "2min")
        # surface Python-worker native crashes with a stack instead of a
        # silent executor death (diagnosis aid for the Arrow/UDF paths)
        .config("spark.python.worker.faulthandler.enabled", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def multi_consumer_barrier(df):
    """Lineage barrier for a SMALL frame consumed by several downstream
    branches (the r13 lazy-checkpoint pattern: without a barrier every
    consumer re-runs the corpus-scale subtree that built the frame).

    Default: ``localCheckpoint(eager=False)`` — persist semantics plus
    lineage truncation, zero extra jobs, the measured-fastest form in
    local mode. CLUSTER-SAFETY NOTE (r13 verdict item 6): localCheckpoint
    data lives only in executor block managers and its lineage is
    TRUNCATED, so on a real cluster losing an executor after
    materialization makes the frame unrecoverable and fails the job. The
    frames this pattern guards are KB-scale (stats/prefix tables,
    candidate-pair lists), so the exposure window is tiny — but a 100 TB
    deployment that cannot tolerate it sets
    ``SPARK_GRAFT_CLUSTER_SAFE_BARRIER=true`` to get
    ``persist(MEMORY_AND_DISK)`` instead: same multi-consumer reuse, full
    lineage retained, recomputable on executor loss. Results are
    identical either way (tests/test_llm.py pins this); the persist form
    keeps the subtree in the plan, so it re-planned-costs slightly more
    and recomputes on loss rather than failing.
    """
    if os.environ.get("SPARK_GRAFT_CLUSTER_SAFE_BARRIER", "").strip().lower() in (
        "1", "true", "yes",
    ):
        from pyspark import StorageLevel

        return df.persist(StorageLevel.MEMORY_AND_DISK)
    return df.localCheckpoint(eager=False)


def spread_small_input(df):
    """Small-input parallelism guard: a single small parquet file (or any
    sub-parallelism frame) scans as one task, serializing expensive
    per-row expressions or Arrow-batched Python work on one core while
    the rest idle. Repartition up to the session's default parallelism
    only when the frame has fewer partitions — a no-op at scale, where
    file-granular splits already saturate the cluster (and where an
    unconditional shuffle of raw input would be the wrong trade)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _normalize_timestamps(df):
    """Cast any TIMESTAMP_NTZ column to TIMESTAMP (LTZ). The session runs in
    UTC, so the wall-clock values are preserved bit-for-bit and downstream
    epoch functions (``unix_micros`` etc.) that reject NTZ keep working —
    matching DuckDB, whose naive timestamps compare as UTC instants."""
    from pyspark.sql import functions as F

    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Parquet scan for one harness table (predicate/column pushdown apply).

    Timestamp normalization across driver-generated data variants:
    - TIMESTAMP(NANOS) (round-1 data): Spark has no native type — read as
      long nanos (legacy conf, settable at runtime) and truncate to micros,
      exactly like DuckDB's nanos→micros read.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false) (round-2 data): Spark 4
      infers TIMESTAMP_NTZ by default; read as LTZ instead (runtime conf,
      so driver-provided sessions get it too) — identical instants under
      the UTC session timezone.
    """
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # Pin the session TZ here too (not only in get_spark): every registry
    # query loads through this function, so a driver-provided session gets
    # oracle-matching timestamp semantics regardless of its own defaults.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _normalize_timestamps(df)
    return _normalize_timestamps(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def load_star(spark: SparkSession, sf_dir: str) -> dict:
    """All harness tables as a dict of DataFrames (lazy — no reads yet)."""
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
