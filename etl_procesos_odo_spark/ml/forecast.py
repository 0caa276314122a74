"""Demand forecasting via pyspark.ml — rebuild of the reference's sklearn
pipeline (app_calculo_necesidad_recepción_call_center.py:553-713,
1213-1231, 1305-1389):

- features per (date, hour): weekday, hour, month, day-of-month,
  week-of-month; label = hourly demand count;
- 70/30 split, seed 42 (reference :620);
- candidate models: LinearRegression + GBTRegressor + RandomForestRegressor
  (the reference's LinearRegression / MLPRegressor / GradientBoostingRegressor
  trio — MLP regression has no pyspark.ml equivalent, so a random forest
  fills the third best-of-3 slot; GBT covers the boosted one);
- best-by-R² on the held-out split (reference :697-713);
- batch inference over a (weekday × hour) grid, predictions clamped ≥ 0
  (reference :1370 ``max(pred, 0)``), averaged across days per slot (U4).

Training data never leaves the cluster: feature build, split, fit, score
and the inference grid are all DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.datetime_fns import week_of_month, weekday_monday0


def demand_features(events: DataFrame) -> DataFrame:
    """Hourly demand counts with calendar features (U3 feature build)."""
    keyed = events.select(
        F.to_date("ts").alias("fecha"),
        F.hour("ts").cast("long").alias("hora"),
    )
    daily = keyed.groupBy("fecha", "hora").agg(F.count("*").alias("demanda"))
    return daily.select(
        "fecha",
        "hora",
        weekday_monday0("fecha").alias("dia_semana"),
        F.month("fecha").cast("long").alias("mes"),
        F.dayofmonth("fecha").cast("long").alias("dia_mes"),
        week_of_month("fecha").alias("semana_mes"),
        F.col("demanda").cast("double").alias("demanda"),
    )


FEATURES = ["dia_semana", "hora", "mes", "dia_mes", "semana_mes"]


def train_best_forecaster(features: DataFrame, seed: int = 42):
    """Fit the three candidates on a 70/30 split and return
    (best_model, metrics) by held-out R² — the reference's best-of-3 pick
    (app_calculo_necesidad_recepción_call_center.py:620-713)."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import (
        GBTRegressor,
        LinearRegression,
        RandomForestRegressor,
    )

    assembler = VectorAssembler(inputCols=FEATURES, outputCol="features")
    # the feature frame is post-aggregate — at most (#days × 24) rows no
    # matter the raw scale — but inherits the aggregation's shuffle
    # partitioning, so every internal fit iteration (GBT ~20, RF ~30)
    # schedules a full-width job over near-empty partitions. Repartition
    # to ONE partition AFTER the parallel aggregation (repartition, not
    # coalesce: coalesce would collapse the upstream agg to one task too)
    # and cache: iteration jobs become single-task over in-memory rows.
    data = (
        assembler.transform(features)
        .select("features", "demanda")
        .repartition(1)
        .cache()
    )
    train, test = data.randomSplit([0.7, 0.3], seed=seed)
    evaluator = RegressionEvaluator(
        labelCol="demanda", predictionCol="prediction", metricName="r2"
    )
    candidates = {
        "linear_regression": LinearRegression(labelCol="demanda"),
        "gbt": GBTRegressor(labelCol="demanda", seed=seed, maxIter=20),
        "random_forest": RandomForestRegressor(
            labelCol="demanda", seed=seed, numTrees=30
        ),
    }
    # The three fits are independent — run them on concurrent scheduler
    # threads (the CrossValidator(parallelism=N) pattern): wall time drops
    # from the sum of the fits to the slowest one, and on a real cluster
    # the small single-model jobs interleave instead of idling executors.
    # Results are unchanged: each fit is seeded and reads the same cached
    # split frames.
    from concurrent.futures import ThreadPoolExecutor

    train = train.cache()
    test = test.cache()

    def fit_score(item):
        name, est = item
        model = est.fit(train)
        return name, model, evaluator.evaluate(model.transform(test))

    with ThreadPoolExecutor(max_workers=len(candidates)) as pool:
        fitted = list(pool.map(fit_score, candidates.items()))

    best_name, best_model, best_r2 = None, None, float("-inf")
    metrics = {}
    for name, model, r2 in fitted:
        metrics[name] = r2
        if r2 > best_r2:
            best_name, best_model, best_r2 = name, model, r2
    for frame in (train, test, data):
        frame.unpersist()
    return best_model, {"best": best_name, "r2": metrics}


def forecast_grid(spark: SparkSession, model) -> DataFrame:
    """U4 — score a full (weekday × hour) grid with mid-range calendar
    features, clamping predictions at 0."""
    from pyspark.ml.feature import VectorAssembler

    grid = (
        spark.range(7)
        .select(F.col("id").alias("dia_semana"))
        .crossJoin(spark.range(24).select(F.col("id").alias("hora")))
        .withColumn("mes", F.lit(6).cast("long"))
        .withColumn("dia_mes", F.lit(15).cast("long"))
        .withColumn("semana_mes", F.lit(3).cast("long"))
    )
    assembler = VectorAssembler(inputCols=FEATURES, outputCol="features")
    scored = model.transform(assembler.transform(grid))
    return scored.select(
        "dia_semana",
        "hora",
        F.greatest(F.col("prediction"), F.lit(0.0)).alias("demanda_prevista"),
    )
