"""U3/U4 forecaster semantics: three candidates (the reference's best-of-3,
app_calculo_necesidad_recepción_call_center.py:620-713), winner by held-out
R², grid inference clamped at zero."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_procesos_odo_spark.ml.forecast import (
    demand_features,
    forecast_grid,
    train_best_forecaster,
)


def _synthetic_events(spark, n_days=21):
    """Deterministic hourly event pattern: demand depends on (weekday, hour)
    so the tree models have signal to fit."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(n_days):
        for h in range(8, 18):
            day = base + datetime.timedelta(days=d)
            n = 1 + (day.weekday() * 3 + h) % 7
            for i in range(n):
                rows.append((day.replace(hour=h, minute=i % 60),))
    return spark.createDataFrame(rows, "ts timestamp")


def test_best_of_three_by_r2(spark):
    feats = demand_features(_synthetic_events(spark))
    model, info = train_best_forecaster(feats, seed=42)
    assert set(info["r2"]) == {"linear_regression", "gbt", "random_forest"}
    assert info["best"] == max(info["r2"], key=info["r2"].get)
    assert model is not None


def test_forecast_grid_clamped(spark):
    feats = demand_features(_synthetic_events(spark))
    model, _ = train_best_forecaster(feats, seed=42)
    grid = forecast_grid(spark, model)
    rows = grid.collect()
    assert len(rows) == 7 * 24
    assert all(r["demanda_prevista"] >= 0.0 for r in rows)
    assert grid.columns == ["dia_semana", "hora", "demanda_prevista"]
