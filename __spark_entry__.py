"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual query surface lives in ``etl_procesos_odo_spark.registry`` —
each entry pairs a Spark plan with its DuckDB oracle SQL and cites the
reference behavior (file:line) it rebuilds.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_procesos_odo_spark.registry import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The call-center demand curve (SURVEY.md §7 minimum slice): events →
    derived time keys → two-level avg-of-daily-counts → hour×weekday spine
    join with 0-fill → resource ratio.
    """
    from etl_procesos_odo_spark.queries_pipelines import callcenter_demand

    return callcenter_demand(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {q.name: q.spark_fn for q in registry()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted (rows-only check) for
    genuinely non-SQL-expressible ops (ML models, streaming state)."""
    return {q.name: q.oracle for q in registry() if q.oracle is not None}
