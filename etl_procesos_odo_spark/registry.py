"""Query registry: every implemented operator as a (Spark plan, DuckDB
oracle SQL) pair — the correctness surface consumed by ``__spark_entry__``.

Conventions that make the Spark result hash-identical to the oracle:

- **Decimal-exact sums.** ``SUM`` / ``AVG`` over double columns is
  order-dependent in floating point; both sides compute
  ``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)`` so the aggregate is
  exact integer arithmetic and the final double is bit-identical.
  Averages of integers are exact in double (< 2^53) and safe as-is.
- **Fractional epochs.** Spark's ``unix_timestamp`` truncates to seconds;
  use ``cast(ts as double)`` (micros-exact) to match DuckDB's ``epoch()``.
- **Explicit tie-breaks** on every top-N / argmax / dedup-first ordering.
- **Aliases match** between the Spark plan and the oracle SQL column for
  column (driver sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import TABLES, load_table


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    doc: str = ""


_REGISTRY: list[QueryDef] = []


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        _REGISTRY.append(QueryDef(name, fn, oracle, doc))
        return fn

    return deco


def registry() -> list[QueryDef]:
    from . import queries_relational  # noqa: F401
    from . import queries_llm  # noqa: F401
    from . import queries_pipelines  # noqa: F401
    from . import queries_streaming_ml  # noqa: F401
    from . import queries_enrich  # noqa: F401

    return list(_REGISTRY)


def views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register harness tables as temp views for spark.sql-style plans."""
    for n in names or TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


# Shared expression shorthands ------------------------------------------------

def dsum(col, alias: str, ndigits: int = 6):
    """Order-independent exact sum of a double column (see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(25,6)")).cast("double").alias(alias)


def davg(col, alias: str):
    """Exact-sum average of a double column: one deterministic division."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast("decimal(25,6)")).cast("double") / F.count(c)
    ).alias(alias)


# DuckDB-side equivalents (string templates)
def o_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,6))) AS DOUBLE)"


def o_davg(expr: str) -> str:
    return f"{o_dsum(expr)} / COUNT({expr})"
