"""End-to-end pipeline queries — the reference's entry-point flows
(SURVEY.md §3) re-expressed over the harness star schema.

Each pipeline is a pure (spark, sf_dir) -> DataFrame plan composing the
layer-1 expression library and layer-2 operator kit; Catalyst supplies
parse→optimize→execute (SURVEY.md §3 "engine consequence").
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .functions.datetime_fns import weekday_monday0
from .operators.aggregates import avg_of_daily_counts
from .registry import load_table, register


@register(
    "q53_callcenter_demand",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, isodow(ts) - 1 AS dia, hour(ts) AS hora,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2, 3
    ),
    promedio AS (
      SELECT dia, hora, CAST(SUM(n) AS DOUBLE) / COUNT(*) AS promedio_llamadas
      FROM daily GROUP BY dia, hora
    ),
    spine AS (
      SELECT d.dia, h.hora
      FROM (SELECT CAST(unnest(generate_series(0, 6)) AS BIGINT) AS dia) d
      CROSS JOIN (SELECT CAST(unnest(generate_series(0, 23)) AS BIGINT) AS hora) h
    )
    SELECT s.dia, s.hora,
           COALESCE(p.promedio_llamadas, CAST(0 AS DOUBLE)) AS promedio_llamadas,
           COALESCE(p.promedio_llamadas, CAST(0 AS DOUBLE)) / CAST(3.0 AS DOUBLE)
             AS recursos_necesarios
    FROM spine s LEFT JOIN promedio p ON s.dia = p.dia AND s.hora = p.hora
    """,
    doc="Entry-point 2 pipeline (call-center demand, SURVEY.md §3 / §7 "
    "minimum slice; procesar_datos_demanda_filtrada, "
    "app_calculo_necesidad_recepción_call_center.py:142-266): derive time "
    "keys → per-day counts → avg over days-with-data per (weekday, hour) "
    "(A2) → full weekday×hour spine left-join 0-fill (G2/J4) → /3.0 "
    "resource ratio. The flagship ``entry()`` query.",
)
def callcenter_demand(spark: SparkSession, sf_dir: str):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("dia", weekday_monday0("ts"))
        .withColumn("hora", F.hour("ts").cast("long"))
    )
    promedio = avg_of_daily_counts(
        ev, F.to_date("ts"), ["dia", "hora"], out_col="promedio_llamadas"
    )
    spine = (
        spark.range(7)
        .select(F.col("id").alias("dia"))
        .crossJoin(spark.range(24).select(F.col("id").alias("hora")))
    )
    filled = (
        spine.join(F.broadcast(promedio), on=["dia", "hora"], how="left")
        .withColumn(
            "promedio_llamadas",
            F.coalesce(F.col("promedio_llamadas"), F.lit(0.0)),
        )
    )
    return filled.withColumn(
        "recursos_necesarios", F.col("promedio_llamadas") / F.lit(3.0)
    )
