"""Aggregation operator kit — SURVEY.md §2.4 (A1–A16).

Every helper is a pure DataFrame -> DataFrame transform built from hash
aggregates and windows; Spark always performs partial (map-side) + final
aggregation, so these shuffle only the grouped partials — the property that
keeps them viable at 100 TB.

Determinism policy (oracle-hash safety): averages/ratios are computed as
``CAST(SUM(...) AS DOUBLE) / COUNT(...)`` — integer/decimal sums are exact
in any order, and a single IEEE division is bit-deterministic — rather than
rounding floating-point accumulations.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def avg_of_daily_counts(
    df: DataFrame,
    date_col: Column | str,
    group_cols: Sequence[str],
    out_col: str = "avg_daily",
) -> DataFrame:
    """A2 — two-level avg-of-daily-counts: count per (date, keys) then mean
    over dates per keys.

    Matches the reference exactly: the average is over days *with data only*,
    not calendar days (app_calculo_necesidad_recepción_call_center.py:250-255;
    app_indicadores_modelo_atencion.py:216-221).

    Two hash aggregates; the second groups a strict subset of the first's
    keys, so the shuffled partials are tiny.
    """
    dc = F.col(date_col) if isinstance(date_col, str) else date_col
    daily = df.groupBy(dc.alias("_d"), *group_cols).agg(F.count("*").alias("_n"))
    return daily.groupBy(*group_cols).agg(
        (F.sum("_n").cast("double") / F.count("*")).alias(out_col)
    )


def percent_of_total(
    df: DataFrame,
    group_cols: Sequence[str],
    count_col: str = "n",
    pct_col: str = "pct",
) -> DataFrame:
    """A9 — per-group count plus percent of grand total
    (app_indicadores_modelo_atencion.py:469-472).

    Uses an empty-frame window (single global total via exchange), not a
    driver-side collect.
    """
    counted = df.groupBy(*group_cols).agg(F.count("*").alias(count_col))
    total = F.sum(count_col).over(Window.partitionBy())
    return counted.withColumn(
        pct_col, F.col(count_col) * 100.0 / total.cast("double")
    )


def pivot_count(
    df: DataFrame,
    row_col: Column | str,
    pivot_col: str,
    values: Sequence[str],
    total_col: str | None = "TOTAL",
) -> DataFrame:
    """A12 — crosstab count with explicit pivot values + optional TOTAL col
    (app_indicadores_modelo_atencion.py:523-543).

    ``values`` must be explicit: at scale an unbounded ``pivot()`` first runs
    a distinct scan AND creates unbounded-width rows (SURVEY.md §7 watch-out).
    """
    out = (
        df.groupBy(row_col)
        .pivot(pivot_col, list(values))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(values))
    )
    if total_col:
        out = out.withColumn(
            total_col, sum(F.col(f"`{v}`") for v in values).cast("long")
        )
    return out


def with_total_row(
    df: DataFrame,
    group_col: str,
    aggs: dict[str, Column],
    total_label: str = "TOTAL",
) -> DataFrame:
    """A11 — grouped aggregate plus an appended grand-TOTAL row
    (app.py:383-392; app_indicadores_modelo_atencion.py:250-257).

    Implemented as ROLLUP (one pass, partial aggs reused) with the rollup
    row identified by ``GROUPING(group_col)`` — not by coalescing NULLs, so
    a natural NULL group in ``group_col`` stays distinguishable from the
    grand-total row (it surfaces as a NULL-labeled group, exactly like the
    reference's pandas groupby(dropna=False) + appended total).
    """
    agg_exprs = [v.alias(k) for k, v in aggs.items()]
    return (
        df.rollup(group_col)
        .agg(*agg_exprs, F.grouping(group_col).alias("_is_total"))
        .withColumn(
            group_col,
            F.when(F.col("_is_total") == 1, F.lit(total_label)).otherwise(
                F.col(group_col)
            ),
        )
        .drop("_is_total")
    )


def pareto(
    df: DataFrame,
    key_col: str,
    measure_decimal: Column,
    top_n: int = 10,
    others_label: str = "OTROS",
) -> DataFrame:
    """A13 — Pareto: top-N keys by measure, rest bucketed as OTROS, with
    percent and running cumulative percent
    (indicador-modelo-vs-facturacion.py:1012-1026).

    ``measure_decimal`` must aggregate to a DECIMAL (exact) type: ranking,
    OTROS regrouping and the running total all happen in exact arithmetic;
    doubles appear only in the two final divisions. The expensive grouping
    of raw data happens once; the rank + cumulative windows run on the
    already-aggregated result (≤ distinct keys rows).
    """
    grouped = df.groupBy(key_col).agg(measure_decimal.alias("_dec"))
    ranked = grouped.withColumn(
        "_rk", F.row_number().over(Window.orderBy(F.desc("_dec"), F.col(key_col)))
    )
    bucketed = (
        ranked.withColumn(
            key_col,
            F.when(F.col("_rk") <= top_n, F.col(key_col)).otherwise(
                F.lit(others_label)
            ),
        )
        .groupBy(key_col)
        .agg(F.sum("_dec").alias("_dec"), F.min("_rk").alias("_rk"))
    )
    total = F.sum("_dec").over(Window.partitionBy()).cast("double")
    w_cum = Window.orderBy(F.col("_rk")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        bucketed.withColumn("valor", F.col("_dec").cast("double"))
        .withColumn("pct", F.col("_dec").cast("double") * 100.0 / total)
        .withColumn(
            "pct_acumulado",
            F.sum("_dec").over(w_cum).cast("double") * 100.0 / total,
        )
        .drop("_rk", "_dec")
    )


def profile_columns(
    df: DataFrame,
    cols: Sequence[str],
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """One-pass dataset profiler (q114's engine surface, generalized):
    per column the row count, null count, distinct count, and min/max in
    a cross-engine-stable string representation (integers and
    epoch-micros as strings — never float/timestamp formatting, which
    differs between engines).

    ``exact`` is the 100 TB knob: True fuses ``countDistinct`` per column
    into one aggregation pass (Spark plans multi-distinct via Expand — a
    documented len(cols)x row expansion behind one shuffle; the
    oracle-parity mode). False swaps in ``approx_count_distinct``
    (HyperLogLog++, relative error ``rsd``) — no Expand, one partial-agg
    pass at scan speed, the deploy-scale default where an exact distinct
    of a billion-key column would shuffle every key for a dashboard
    number. Everything else (nulls, min/max, row count) is identical and
    exact in both modes.

    Returns one row per column: (col_name, n_rows, n_nulls, n_distinct,
    min_repr, max_repr), ordered by col_name via the stack order.
    """
    from pyspark.sql.types import TimestampType

    if not cols:
        raise ValueError("cols must be non-empty")
    nd = (
        (lambda c: F.countDistinct(c))
        if exact
        else (lambda c: F.approx_count_distinct(c, rsd))
    )

    def repr_col(c: str) -> Column:
        if isinstance(df.schema[c].dataType, TimestampType):
            return F.unix_micros(F.col(c))
        return F.col(c)

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in sorted(cols):
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"nn_{c}"),
            nd(c).alias(f"nd_{c}"),
            F.min(repr_col(c)).cast("string").alias(f"mn_{c}"),
            F.max(repr_col(c)).cast("string").alias(f"mx_{c}"),
        ]
    a = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in sorted(cols)
    )
    return a.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "AS (col_name, n_nulls, n_distinct, min_repr, max_repr)"
        ),
        "n_rows",
    ).select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_repr", "max_repr"
    )
