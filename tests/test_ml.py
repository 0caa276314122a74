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


def test_lr_closed_form_matches_pyspark_ml(spark):
    """The unrolled-Cholesky solve must agree with pyspark.ml's own
    unregularized LinearRegression (normal solver) on the same
    CORE_FEATURES design — independent cross-check of the math behind
    q151's bit-exact oracle."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    from etl_procesos_odo_spark.ml.forecast import (
        CORE_FEATURES,
        lr_forecast_closed_form,
    )

    events = _synthetic_events(spark)
    feats = demand_features(events)
    data = VectorAssembler(
        inputCols=CORE_FEATURES, outputCol="features"
    ).transform(feats)
    model = LinearRegression(
        labelCol="demanda", regParam=0.0, solver="normal"
    ).fit(data)

    got = {
        (r["dia_semana"], r["hora"]): r["demanda_lr"]
        for r in lr_forecast_closed_form(spark, events).collect()
    }
    assert len(got) == 7 * 24
    b0 = model.intercept
    b = model.coefficients
    for (dia, hora), pred in got.items():
        want = max(0.0, b0 + b[0] * dia + b[1] * hora + b[2] * 15.0)
        assert abs(pred - want) <= 1e-6 * max(1.0, abs(want)), (
            dia, hora, pred, want
        )


def test_cholesky_solve_exprs_identity(spark):
    """The generated solve, fed a hand-built SPD system through plain
    selectExpr, must reproduce the known solution."""
    import numpy as np

    from etl_procesos_odo_spark.ml.forecast import cholesky_solve_exprs

    rng = np.random.RandomState(7)
    A = rng.randint(-3, 4, size=(4, 6)).astype(float)
    S = A @ A.T + np.eye(4)  # SPD
    beta_true = np.array([1.5, -2.0, 0.25, 3.0])
    bvec = S @ beta_true

    cols = {f"s_{i}_{j}": float(S[i, j]) for i in range(4) for j in range(i + 1)}
    cols.update({f"b_{i}": float(bvec[i]) for i in range(4)})
    df = spark.createDataFrame(
        [tuple(cols.values())], list(cols.keys())
    )
    for name, expr in cholesky_solve_exprs(4):
        df = df.withColumn(name, F.expr(expr))
    row = df.select("beta_0", "beta_1", "beta_2", "beta_3").collect()[0]
    for i in range(4):
        assert abs(row[i] - beta_true[i]) < 1e-9, (i, row[i], beta_true[i])


def test_seasonal_backtest_crafted_series(spark):
    """Hand-checkable MASE: a perfectly weekly series scores 0; a series
    that deviates by a known amount in the last week scores the exact
    integer-ratio MASE, replicated here with Fractions."""
    import datetime as dt
    from fractions import Fraction

    from etl_procesos_odo_spark.ml.forecast import seasonal_naive_backtest

    base = dt.datetime(2024, 1, 1)
    rows = []
    # series P: weekly pattern [1,2,3,4,5,6,7] repeated 5 weeks (35 days)
    pat = [1, 2, 3, 4, 5, 6, 7]
    for day in range(35):
        for _ in range(pat[day % 7]):
            rows.append(("P", base + dt.timedelta(days=day)))
    # series Q: same but the final week adds +2 events per day
    for day in range(35):
        for _ in range(pat[day % 7] + (2 if day >= 28 else 0)):
            rows.append(("Q", base + dt.timedelta(days=day)))
    df = spark.createDataFrame(rows, ["event_type", "ts"])
    out = {
        (r["event_type"], r["fold"]): r
        for r in seasonal_naive_backtest(
            df, "event_type", "ts", period=7, horizon=7, n_folds=3
        ).collect()
    }
    # P: seasonal-naive is exact everywhere -> every fold's MASE is 0
    for fold in (1, 2, 3):
        r = out[("P", fold)]
        assert r["h"] == 7 and r["sum_abs_err"] == 0 and r["mase"] == 0.0
    # Q fold 1 (origin = day 27): eval days 28..34 each err |+2| -> 14;
    # train diffs over days 1..27: |pattern step| = 1 x 24 + |1-7| x 3
    #   (wrap-around days 7,14,21 step 7 -> 1, diff 6) -> 24 + 18 = 42
    r = out[("Q", 1)]
    assert (r["h"], r["sum_abs_err"]) == (7, 14)
    assert (r["n_train"], r["sum_train_abs_diff"]) == (27, 42)
    exp = Fraction(14 * 27, 7 * 42)
    assert r["mase"] == exp.numerator / exp.denominator


def test_q41_model_selection_deterministic_across_sessions():
    """r8-verdict item 4: q41's rows-only contract row gets a
    reproducibility pin — the best-of-3 winner (model id) and every
    candidate's held-out R² (to 10 decimals) must be identical across
    two FRESH SparkSessions at sf0.01. Everything that feeds the pick
    is seeded (split seed 42, GBT/RF seeds) and single-partition
    (repartition(1) before fit), so the selection cannot drift with
    scheduler interleaving or session history."""
    import json
    import os
    import subprocess
    import sys

    script = r"""
import json, sys
sys.path.insert(0, %r)
from etl_procesos_odo_spark.session import get_spark
from etl_procesos_odo_spark.registry import load_table
from etl_procesos_odo_spark.ml.forecast import (
    demand_features, train_best_forecaster,
)
spark = get_spark("q41-determinism")
spark.conf.set("spark.sql.session.timeZone", "UTC")
feats = demand_features(load_table(spark, "/root/testdata/sf0.01", "events"))
model, info = train_best_forecaster(feats, seed=42)
print("RESULT " + json.dumps(
    {"best": info["best"],
     "r2": {k: round(v, 10) for k, v in sorted(info["r2"].items())}},
    sort_keys=True,
))
""" % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),)

    def run_once():
        proc = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True, text=True, timeout=900,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        assert line, proc.stdout[-2000:]
        return json.loads(line[-1][len("RESULT "):])

    a, b = run_once(), run_once()
    assert a == b, (a, b)
    assert a["best"] in {"linear_regression", "gbt", "random_forest"}
