"""Shared fixtures: one SparkSession, one DuckDB connection with the harness
tables registered, and the oracle-parity comparator that mimics the driver's
row-count + schema + order-insensitive value check.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import pytest

from etl_procesos_odo_spark.session import TABLES, get_spark

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("etl-odo-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    con.execute("SET TimeZone = 'UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def canon(v):
    """Canonicalize a single value for exact cross-engine comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def assert_parity(spark_df, ddb_con, oracle_sql, name=""):
    """Driver-style compare: column names (sorted), row count, and the
    order-insensitive multiset of canonicalized rows must match exactly."""
    rel = ddb_con.sql(oracle_sql)
    o_cols = list(rel.columns)
    o_rows = rel.fetchall()
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    )

    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    o_idx = [o_cols.index(c) for c in sorted(o_cols)]
    s_set = sorted(tuple(canon(r[i]) for i in s_idx) for r in s_rows)
    o_set = sorted(tuple(canon(r[i]) for i in o_idx) for r in o_rows)
    if s_set != o_set:
        diffs = [
            (a, b) for a, b in zip(s_set, o_set) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark, oracle): {diffs}"
        )
