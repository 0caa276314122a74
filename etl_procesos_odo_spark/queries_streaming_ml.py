"""Streaming + ML query surface (SURVEY.md §2.9 U3/U4, §2.10).

Streaming queries drive the real Structured Streaming engine (file source →
stateful ops → memory sink, run to completion) and return the materialized
result, so the oracle compares the streaming output against the equivalent
batch SQL. The ML query is non-SQL-expressible → rows-only check.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .registry import register
from .streaming.temporal import (
    dedup_first_stream,
    events_stream,
    hourly_counts,
    run_to_memory,
)


@register(
    "q40_streaming_hourly",
    """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc="Streaming tumbling 1-hour window counts + exact sums per "
    "event_type (SURVEY.md §2.10: the A1/A2 demand aggregates as "
    "readStream → window() → memory sink). Bounded backfill run to "
    "completion; the oracle is the equivalent batch aggregation, which "
    "complete-mode output must equal exactly.",
)
def q40_streaming_hourly(spark: SparkSession, sf_dir: str):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    agg = hourly_counts(events_stream(spark, sf_dir))
    return run_to_memory(agg, "q40_streaming_hourly_out", "complete")


@register(
    "q43_streaming_dedup",
    """
    SELECT user_id, COUNT(DISTINCT CAST(ts AS DATE)) AS n_dias
    FROM events GROUP BY user_id
    """,
    doc="Streaming watermarked dedup-keep-one per (user_id, day) "
    "(SURVEY.md §2.10: W1 as dropDuplicates + 1-day watermark), then a "
    "batch rollup of the deduped append output. Which physical row "
    "survives is arrival-order dependent, so the oracle checks the "
    "arrival-order-independent projection: distinct days per user.",
)
def q43_streaming_dedup(spark: SparkSession, sf_dir: str):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    deduped = dedup_first_stream(events_stream(spark, sf_dir))
    out = run_to_memory(deduped, "q43_streaming_dedup_out", "append")
    return out.groupBy("user_id").agg(F.count("*").alias("n_dias"))


@register(
    "q41_forecast_demand",
    None,  # pyspark.ml models are not SQL-expressible → rows-only check
    doc="Demand forecasting (U3/U4, app_calculo_necesidad_recepción_call_"
    "center.py:553-713): hourly demand features → 70/30 split seed 42 → "
    "LinearRegression vs GBTRegressor → best-by-R² → (weekday × hour) "
    "grid inference clamped ≥ 0.",
)
def q41_forecast_demand(spark: SparkSession, sf_dir: str):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from .ml.forecast import demand_features, forecast_grid, train_best_forecaster
    from .registry import load_table

    feats = demand_features(load_table(spark, sf_dir, "events"))
    model, _metrics = train_best_forecaster(feats, seed=42)
    return forecast_grid(spark, model)
