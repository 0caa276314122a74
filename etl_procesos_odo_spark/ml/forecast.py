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


# ---------------------------------------------------------------------------
# Closed-form LR arm (U4 predict surface with a hard oracle)
# ---------------------------------------------------------------------------

# x-column order is the model contract: x1..x3 = CORE_FEATURES; the grid
# scores (dia_semana, hora) with the same mid-range day-of-month constant
# forecast_grid uses (dia_mes=15). mes and semana_mes are EXCLUDED from
# the closed-form arm: on a single-month span (the sf0.01 fixture —
# January 2024, which starts on a Monday) mes is constant (collinear with
# the intercept) and dia_mes == dia_semana + 7*semana_mes - 6 exactly, so
# the 6x6 normal equations are singular. Cholesky demands positive
# definiteness at EVERY data span, and ridge-style regularization would
# break the exact-oracle contract — so the hard-oracle surface carries
# the provably independent core features only (q41's best-of-3 fit keeps
# the full feature set on the rows-only path).
CORE_FEATURES = ["dia_semana", "hora", "dia_mes"]
GRID_CONSTS = [("dia_mes", 15)]


def lr_stat_exprs(n_x: int) -> list[str]:
    """SQL aggregate expressions for the OLS sufficient statistics of an
    intercept + n_x-feature regression: s_i_j = sum(x_i * x_j) for i >= j
    (x_0 == 1, so s_0_0 = n and s_i_0 = sum(x_i)) and b_i = sum(x_i * y).

    Every x_i and y is a small integer, so each SUM is exact integer
    arithmetic in both engines and the CAST to DOUBLE is exact (all sums
    << 2**53). The same strings run under Spark ``selectExpr`` and inside
    the DuckDB oracle, so the statistics are bit-identical by construction.
    """
    exprs = ["CAST(COUNT(*) AS DOUBLE) AS s_0_0"]
    for i in range(1, n_x + 1):
        exprs.append(f"CAST(SUM(x{i}) AS DOUBLE) AS s_{i}_0")
        for j in range(1, i + 1):
            exprs.append(f"CAST(SUM(x{i} * x{j}) AS DOUBLE) AS s_{i}_{j}")
    exprs.append("CAST(SUM(y) AS DOUBLE) AS b_0")
    for i in range(1, n_x + 1):
        exprs.append(f"CAST(SUM(x{i} * y) AS DOUBLE) AS b_{i}")
    return exprs


def cholesky_solve_exprs(k: int) -> list[tuple[str, str]]:
    """Ordered (name, sql_expr) pairs solving the k x k normal equations
    S beta = b by unrolled Cholesky (S = L L^T, forward then back
    substitution). Inputs are columns ``s_i_j`` (i >= j) and ``b_i``;
    outputs ``beta_0`` .. ``beta_{k-1}``.

    The SAME expression strings are evaluated by Spark (``F.expr``) and
    DuckDB (lateral column aliases), and +,-,*,/ and sqrt are all
    correctly-rounded IEEE-754 double ops in both engines — identical
    expression trees over identical (exact-integer-derived) inputs give
    BIT-identical coefficients, which is what the repr()-level value hash
    of the correctness gate demands. No driver-side matrix math: the
    solve is a fixed 1-row expression DAG, so the whole query stays a
    single partial-aggregatable shuffle at any data scale.
    """
    out: list[tuple[str, str]] = []
    for j in range(k):
        diag = f"s_{j}_{j}" + "".join(
            f" - l_{j}_{p} * l_{j}_{p}" for p in range(j)
        )
        out.append((f"l_{j}_{j}", f"sqrt({diag})"))
        for i in range(j + 1, k):
            num = f"s_{i}_{j}" + "".join(
                f" - l_{i}_{p} * l_{j}_{p}" for p in range(j)
            )
            out.append((f"l_{i}_{j}", f"({num}) / l_{j}_{j}"))
    for i in range(k):
        num = f"b_{i}" + "".join(f" - l_{i}_{p} * z_{p}" for p in range(i))
        out.append((f"z_{i}", f"({num}) / l_{i}_{i}"))
    for i in reversed(range(k)):
        num = f"z_{i}" + "".join(
            f" - l_{p}_{i} * beta_{p}" for p in range(i + 1, k)
        )
        out.append((f"beta_{i}", f"({num}) / l_{i}_{i}"))
    return out


def lr_grid_pred_expr() -> str:
    """Shared prediction expression over the (dia_semana, hora) grid with
    the model's mid-range constants, clamped at 0 like the reference's
    ``max(pred, 0)`` (app_calculo_necesidad_recepción_call_center.py:1370)."""
    pred = (
        "beta_0"
        " + beta_1 * CAST(dia_semana AS DOUBLE)"
        " + beta_2 * CAST(hora AS DOUBLE)"
    )
    for i, (_, val) in enumerate(GRID_CONSTS, start=3):
        pred += f" + beta_{i} * CAST({val} AS DOUBLE)"
    return f"greatest({pred}, CAST(0 AS DOUBLE))"


N_CORE = len(CORE_FEATURES)


def lr_forecast_closed_form(spark: SparkSession, events: DataFrame) -> DataFrame:
    """The q41 LinearRegression arm, closed-form: demand features →
    exact-integer sufficient statistics → unrolled-Cholesky normal
    equations → (weekday × hour) prediction grid clamped at 0.

    Analytically identical to an unregularized ``LinearRegression``
    (fitIntercept=True, regParam=0) fit on the CORE_FEATURES frame —
    pyspark.ml's "normal" solver computes exactly these normal equations —
    but expressed as one aggregation plus a 1-row expression DAG, so it
    is oracle-checkable bit-for-bit (see cholesky_solve_exprs) and never
    collects training data. q41's best-of-3 fit/predict stays on the
    rows-only contract; this covers the U4 predict surface with a hard
    oracle."""
    feats = demand_features(events)
    xy = feats.selectExpr(
        *[f"CAST({c} AS BIGINT) AS x{i}"
          for i, c in enumerate(CORE_FEATURES, start=1)],
        "CAST(demanda AS BIGINT) AS y",
    )
    stats = xy.selectExpr(*lr_stat_exprs(N_CORE))
    # one projection with lateral column aliases (not 30 chained
    # withColumns, which would pay a Catalyst re-analysis each) — the
    # same alias-chain shape the DuckDB oracle evaluates
    sol = stats.selectExpr(
        "*",
        *[f"{e} AS {n}" for n, e in cholesky_solve_exprs(N_CORE + 1)],
    )
    betas = sol.select(*[f"beta_{i}" for i in range(N_CORE + 1)])
    grid = (
        spark.range(7).selectExpr("id AS dia_semana")
        .crossJoin(spark.range(24).selectExpr("id AS hora"))
    )
    return (
        grid.crossJoin(F.broadcast(betas))
        .selectExpr(
            "dia_semana", "hora", f"{lr_grid_pred_expr()} AS demanda_lr"
        )
    )


def seasonal_naive_backtest(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    period: int = 7,
    horizon: int = 7,
    n_folds: int = 3,
) -> DataFrame:
    """Rolling-origin backtest of the seasonal-naive forecaster
    (Hyndman & Koehler 2006's MASE protocol): per series, evaluate
    ``n_folds`` forecast origins stepping back ``horizon`` days from
    the series end; at each origin the model predicts day ``d`` as the
    actual of ``d - period`` (data at or before the origin only), and
    errors are scaled by the in-sample one-step naive MAE.

    The evaluation arm the ML family lacked: q41/q151 FIT and PREDICT,
    this measures whether ANY fitted model beats the seasonal baseline
    on honest out-of-time splits. All error arithmetic is exact BIGINT
    (counts, absolute differences, integer products); MASE is ONE
    final division — bit-identical cross-engine, no libm.

    Plan: one combining groupBy to daily counts; a dense integer-day
    spine (per-key sequence explode against one broadcast min/max row)
    so the period lag is positional; LAG windows per key over the
    COMPRESSED daily table (bounded by days, never raw rows); a
    3-element literal fold explode; one final aggregate. Two shuffles
    total (daily groupBy; key window) at any corpus size.
    """
    from pyspark.sql import Window

    if horizon > period:
        raise ValueError(
            f"horizon ({horizon}) > period ({period}) would leak: the "
            "lag-period forecast for late horizon days would read actuals "
            "from INSIDE the evaluation window (after the origin); iterate "
            "folds or shorten the horizon"
        )
    day = F.datediff(F.col(ts_col).cast("date"), F.lit("1970-01-01"))
    daily = (
        events.select(F.col(key_col).alias("k"), day.alias("d"))
        .groupBy("k", "d")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bounds = daily.agg(
        F.min("d").alias("_mn"), F.max("d").alias("_mx")
    )
    spine = (
        daily.select("k")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "k", F.explode(F.sequence(F.col("_mn"), F.col("_mx"))).alias("d")
        )
    )
    dense = (
        spine.join(daily, ["k", "d"], "left")
        .select("k", "d", F.coalesce("c", F.lit(0)).alias("c"))
    )
    w = Window.partitionBy("k").orderBy("d")
    lagp = F.lag("c", period).over(w)
    lag1 = F.lag("c", 1).over(w)
    enr = dense.select(
        "k", "d", "c", lagp.alias("_lp"), lag1.alias("_l1")
    ).crossJoin(F.broadcast(bounds))
    folds = F.explode(
        F.array(*[F.lit(i) for i in range(1, n_folds + 1)])
    ).alias("fold")
    e = enr.select("*", folds).withColumn(
        "_origin", F.col("_mx") - F.lit(horizon) * F.col("fold")
    )
    is_eval = (
        (F.col("d") > F.col("_origin"))
        & (F.col("d") <= F.col("_origin") + horizon)
        & F.col("_lp").isNotNull()
    )
    is_train = (F.col("d") <= F.col("_origin")) & F.col("_l1").isNotNull()
    agg = e.groupBy(F.col("k").alias(key_col), "fold").agg(
        F.sum(F.when(is_eval, 1).otherwise(0)).cast("long").alias("h"),
        F.sum(F.when(is_eval, F.abs(F.col("c") - F.col("_lp"))).otherwise(0))
        .cast("long")
        .alias("sum_abs_err"),
        F.sum(F.when(is_train, 1).otherwise(0)).cast("long").alias("n_train"),
        F.sum(
            F.when(is_train, F.abs(F.col("c") - F.col("_l1"))).otherwise(0)
        )
        .cast("long")
        .alias("sum_train_abs_diff"),
    )
    mase = F.when(
        (F.col("sum_train_abs_diff") > 0) & (F.col("h") > 0),
        (F.col("sum_abs_err") * F.col("n_train")).cast("double")
        / (F.col("h") * F.col("sum_train_abs_diff")).cast("double"),
    )
    return agg.withColumn("fold", F.col("fold").cast("long")).withColumn(
        "mase", mase
    )
