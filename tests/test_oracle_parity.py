"""Operator-level golden tests against the DuckDB oracle (SURVEY.md §5.1):
every registry query with an oracle must hash-match it exactly at sf0.001.
The driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from etl_procesos_odo_spark.registry import registry

from .conftest import SF_DIR, assert_parity

QUERIES = registry()


@pytest.mark.parametrize(
    "qdef", QUERIES, ids=[q.name for q in QUERIES]
)
def test_oracle_parity(qdef, spark, ddb):
    df = qdef.spark_fn(spark, SF_DIR)
    if qdef.oracle is None:
        assert df.count() >= 0  # rows-only smoke, mirrors driver's weak check
        return
    assert_parity(df, ddb, qdef.oracle, name=qdef.name)
