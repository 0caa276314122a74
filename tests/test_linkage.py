"""Fellegi-Sunter linkage: exact-rational weight algebra + thresholds."""

from __future__ import annotations

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from etl_procesos_odo_spark.operators.linkage import (
    Comparator,
    fs_classify,
)


def _comps():
    return [
        Comparator("lang", F.col("al"), 19, 20, 1, 4),
        Comparator("source", F.col("asrc"), 9, 10, 1, 20),
        Comparator("len", F.col("alen"), 4, 5, 1, 10),
    ]


def test_comparator_validation(spark):
    with pytest.raises(ValueError):  # u >= m
        Comparator("bad", F.lit(True), 1, 4, 19, 20)
    with pytest.raises(ValueError):  # m = 1
        Comparator("bad", F.lit(True), 5, 5, 1, 10)
    with pytest.raises(ValueError):  # thresholds inverted
        fs_classify(None, _comps(), link_at=(1, 4), nonlink_below=(1, 2))


def test_weights_match_fraction_arithmetic(spark):
    """Every agreement pattern's weight must equal the exact Fraction
    product of per-field likelihood ratios, and the decision must be the
    cross-multiplied threshold test — replicated here with
    fractions.Fraction as the independent arbiter."""
    rows = [
        (i, bool(i & 4), bool(i & 2), bool(i & 1)) for i in range(8)
    ]
    df = spark.createDataFrame(rows, ["pid", "al", "asrc", "alen"])
    got = {
        r["pid"]: (r["weight"], r["decision"])
        for r in fs_classify(df, _comps()).collect()
    }
    params = [
        (Fraction(19, 20), Fraction(1, 4)),
        (Fraction(9, 10), Fraction(1, 20)),
        (Fraction(4, 5), Fraction(1, 10)),
    ]
    for pid, al, asrc, alen in rows:
        w = Fraction(1)
        for agree, (m, u) in zip((al, asrc, alen), params):
            w *= (m / u) if agree else ((1 - m) / (1 - u))
        exp_dec = (
            "link" if w >= 32 else "nonlink" if w < Fraction(1, 2)
            else "possible"
        )
        w_dbl, dec = got[pid]
        assert dec == exp_dec, (pid, w)
        # the double is ONE division of the exact num/den
        assert w_dbl == w.numerator / w.denominator, pid


def test_all_agree_links_all_disagree_rejects(spark):
    df = spark.createDataFrame(
        [(1, True, True, True), (2, False, False, False)],
        ["pid", "al", "asrc", "alen"],
    )
    out = {r["pid"]: r["decision"] for r in fs_classify(df, _comps()).collect()}
    assert out == {1: "link", 2: "nonlink"}


def test_fs_overflow_guard(spark):
    """Non-ANSI long multiply wraps silently, so fs_classify must refuse
    comparator sets whose worst-case factor product can reach 2^62 —
    twelve q199-grade fields overflow (76^12 ~ 3.7e22), one is fine."""
    many = [
        Comparator(f"f{i}", F.lit(True), 19, 20, 1, 4) for i in range(12)
    ]
    with pytest.raises(ValueError, match="overflow"):
        fs_classify(None, many)
    fs_classify(
        spark.createDataFrame([(1, True)], ["pid", "al"]),
        [Comparator("lang", F.col("al"), 19, 20, 1, 4)],
    )


def test_fs_weight_guards_its_own_capacity(spark):
    """fs_weight is a public composition surface (ADVICE r8): a caller
    using it outside fs_classify must hit the same BIGINT capacity
    guard, not silent non-ANSI wraparound."""
    from etl_procesos_odo_spark.operators.linkage import fs_weight

    many = [
        Comparator(f"f{i}", F.lit(True), 19, 20, 1, 4) for i in range(12)
    ]
    with pytest.raises(ValueError, match="overflow"):
        fs_weight(many)
    # a safe set still returns the column pair
    num, den = fs_weight(_comps())
    row = (
        spark.createDataFrame([(True, True, True)], ["al", "asrc", "alen"])
        .select(num.alias("n"), den.alias("d"))
        .collect()[0]
    )
    assert Fraction(row["n"], row["d"]) == (
        Fraction(19, 20) / Fraction(1, 4)
        * Fraction(9, 10) / Fraction(1, 20)
        * Fraction(4, 5) / Fraction(1, 10)
    )


def test_fs_capacity_message_survives_huge_products(spark):
    """r9 review: the guard must raise its ValueError (with the coarsen
    hint) even when the worst-case product exceeds float max — float()/
    f-string .3e formatting OverflowErrors past ~1.8e308."""
    from etl_procesos_odo_spark.operators.linkage import fs_weight

    huge = [
        Comparator(f"f{i}", F.lit(True), 10**6 - 1, 10**6, 1, 10**6)
        for i in range(30)  # factor product far beyond 1e308
    ]
    with pytest.raises(ValueError, match="coarsen the m/u rationals"):
        fs_weight(huge)
    with pytest.raises(ValueError, match="coarsen the m/u rationals"):
        fs_classify(None, huge)
