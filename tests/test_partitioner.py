"""Partitioner invariants (SURVEY.md §5.4, replacing the reference's
comparar_particiones app.py:183-209): disjoint cover, per-unit balance ≤1,
remainder to lowest part ids, determinism under a fixed seed, and the
constrained variant's allowed-subset property.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_procesos_odo_spark.operators.partitioner import (
    balanced_partition,
    check_partition,
    constrained_partition,
)
from etl_procesos_odo_spark.session import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def customer(spark):
    return load_table(spark, SF_DIR, "customer")


@pytest.mark.parametrize("hash_method", ["xxhash64", "md5"])
def test_balanced_partition_invariants(spark, customer, hash_method):
    assign = balanced_partition(
        customer, "c_mktsegment", "c_custkey", 4, seed=42, hash_method=hash_method
    )
    checks = check_partition(assign, "c_mktsegment", "c_custkey")
    assert checks == {"duplicated_keys": 0, "imbalanced_units": 0}

    # covers all keys
    n_keys = customer.select("c_mktsegment", "c_custkey").distinct().count()
    assert assign.count() == n_keys

    # remainder goes to the lowest part ids (reference quota math app.py:77-87)
    sizes = (
        assign.groupBy("c_mktsegment", "particion")
        .count()
        .orderBy("c_mktsegment", "particion")
        .collect()
    )
    by_unit: dict = {}
    for r in sizes:
        by_unit.setdefault(r["c_mktsegment"], []).append(r["count"])
    for unit, szs in by_unit.items():
        assert szs == sorted(szs, reverse=True), (unit, szs)


def test_balanced_partition_deterministic(spark, customer):
    a = balanced_partition(customer, "c_mktsegment", "c_custkey", 4, seed=7)
    b = balanced_partition(customer, "c_mktsegment", "c_custkey", 4, seed=7)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    c = balanced_partition(customer, "c_mktsegment", "c_custkey", 4, seed=8)
    # a different seed must actually reshuffle membership
    assert a.exceptAll(c).count() > 0


def test_constrained_partition_respects_allowed(spark, customer):
    units = [r[0] for r in customer.select("c_mktsegment").distinct().collect()]
    allowed_rows = []
    for i, u in enumerate(sorted(units)):
        parts = [1, 2] if i % 2 == 0 else [3, 4, 5]
        allowed_rows += [(u, p) for p in parts]
    allowed = spark.createDataFrame(allowed_rows, ["c_mktsegment", "particion"])

    assign = constrained_partition(
        customer, "c_mktsegment", "c_custkey", allowed, seed=42
    )
    bad = assign.join(allowed, on=["c_mktsegment", "particion"], how="left_anti")
    assert bad.count() == 0

    checks = check_partition(assign, "c_mktsegment", "c_custkey")
    assert checks["duplicated_keys"] == 0
    # round-robin over allowed parts keeps per-unit sizes within 1
    spread = (
        assign.groupBy("c_mktsegment", "particion")
        .count()
        .groupBy("c_mktsegment")
        .agg((F.max("count") - F.min("count")).alias("d"))
        .agg(F.max("d"))
        .collect()[0][0]
    )
    assert spread <= 1


def test_skew_profile_semantics_and_plan(spark):
    """skew_profile on a crafted skewed frame: exact summary stats, the
    hot key ranked first with deterministic tie-break, the recommended
    salt bounds the hottest key at target_rows_per_task, and the top-k
    plans as TakeOrderedAndProject (heap, not a global sort)."""
    import pytest as _pytest

    from etl_procesos_odo_spark.operators.partitioner import skew_profile

    rows = [("hot",)] * 90 + [("warm",)] * 8 + [("a",), ("b",)]
    df = spark.createDataFrame(rows, "k string").repartition(4)
    out = skew_profile(df, "k", target_rows_per_task=10, top_k=2)
    got = out.orderBy(F.desc("hot_cnt"), "hot_key").collect()
    assert [(r["hot_key"], r["hot_cnt"]) for r in got] == [
        ("hot", 90),
        ("warm", 8),
    ]
    r = got[0]
    assert (r["n_rows"], r["n_keys"], r["max_cnt"]) == (100, 4, 90)
    assert r["avg_cnt"] == 25.0
    assert r["skew_ratio"] == 90 * 4 / 100.0
    assert r["rec_salt"] == 9  # ceil(90 / 10)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "TakeOrderedAndProject" in plan, plan

    with _pytest.raises(ValueError, match="target_rows_per_task"):
        skew_profile(df, "k", target_rows_per_task=0)
