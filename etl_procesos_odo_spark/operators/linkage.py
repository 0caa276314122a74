"""Probabilistic record linkage: Fellegi-Sunter match weighting.

Fellegi & Sunter (JASA 1969): for each candidate pair, every compared
field contributes a likelihood ratio — ``m/u`` if the field agrees,
``(1-m)/(1-u)`` if it disagrees — where ``m`` is the agreement
probability among true matches and ``u`` among non-matches. The
composite match weight is the product of the per-field ratios, and two
thresholds cut the score line into link / possible (clerical review) /
non-link.

Engine-exactness discipline: the classical formulation sums LOG ratios,
which drags platform-varying libm into every score. The m/u parameters
here are exact RATIONALS, so the product of ratios is a ratio of two
BIGINT products — the weight is computed as ``(w_num, w_den)`` in exact
integer arithmetic, thresholds are applied by integer cross-
multiplication, and the reported double score is ONE correctly-rounded
IEEE division (the repo's log-free monotone-transform discipline, as in
the q194/q198 rankings, extended from single ratios to PRODUCTS of
ratios).

Scale: weighting and classification are per-row expressions over an
already-blocked candidate-pair frame — zero shuffle beyond whatever
blocking produced the pairs (q130's key blocks, q149's sorted
neighborhood). Parameter magnitudes: each field multiplies num/den by
at most max over its branches of the integer factors, so capacity is
checked DRIVER-SIDE at build time — ``fs_classify`` multiplies the
worst-case per-field factors (plus the threshold cross-multipliers)
and raises if the product can exceed 2^62, because Spark's default
non-ANSI long multiply would otherwise WRAP SILENTLY and misclassify
pairs (with q199's two-digit rationals that ceiling is ~8 fields;
coarser rationals buy more).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Comparator:
    """One compared field: its agreement predicate and (m, u) rationals.

    ``m = m_num/m_den`` — P(field agrees | pair is a true match);
    ``u = u_num/u_den`` — P(field agrees | pair is a non-match).
    Requires 0 < u < m < 1 (a useful comparator agrees more often on
    matches than on random pairs).
    """

    name: str
    agree: Column
    m_num: int
    m_den: int
    u_num: int
    u_den: int

    def __post_init__(self) -> None:
        if not (0 < self.u_num * self.m_den < self.m_num * self.u_den):
            raise ValueError(f"{self.name}: need 0 < u < m")
        if self.m_num >= self.m_den or self.u_num >= self.u_den:
            raise ValueError(f"{self.name}: need m < 1 and u < 1")


def _weight_capacity(comparators: list[Comparator]) -> tuple[int, int]:
    """Worst-case (numerator, denominator) factor products across all
    agreement patterns — exact, driver-side Python ints."""
    max_num = max_den = 1
    for c in comparators:
        max_num *= max(c.m_num * c.u_den, (c.m_den - c.m_num) * c.u_den)
        max_den *= max(c.m_den * c.u_num, c.m_den * (c.u_den - c.u_num))
    return max_num, max_den


def _fmt_big(n: int) -> str:
    """Render an arbitrarily large int for an error message without the
    OverflowError that float(n)/f"{n:.3e}" raises past ~1.8e308."""
    s = str(n)
    return s if len(s) <= 6 else f"{s[0]}.{s[1:4]}e+{len(s) - 1}"


def _check_capacity(bound: int) -> None:
    if bound >= 2 ** 62:
        raise ValueError(
            f"comparator factor product can reach {_fmt_big(bound)} — too "
            "close to BIGINT overflow; coarsen the m/u rationals or drop "
            "fields"
        )


def _weight_columns(comparators: list[Comparator]) -> tuple[Column, Column]:
    """(unguarded) build the BIGINT product columns — callers must have
    run _check_capacity first."""
    num: Column = F.lit(1).cast("long")
    den: Column = F.lit(1).cast("long")
    for c in comparators:
        num = num * F.when(
            c.agree, F.lit(c.m_num * c.u_den)
        ).otherwise(F.lit((c.m_den - c.m_num) * c.u_den))
        den = den * F.when(
            c.agree, F.lit(c.m_den * c.u_num)
        ).otherwise(F.lit(c.m_den * (c.u_den - c.u_num)))
    return num, den


def fs_weight(comparators: list[Comparator]) -> tuple[Column, Column]:
    """Exact-integer composite match weight: returns (w_num, w_den)
    BIGINT columns with ``w_num/w_den = prod_i ratio_i``, where
    ``ratio_i = m/u`` on agreement and ``(1-m)/(1-u)`` on disagreement.

    Guards its own capacity: fs_weight is a public composition surface,
    so the worst-case factor product must stay inside BIGINT here too —
    Spark's default non-ANSI long multiply wraps SILENTLY, and a caller
    composing fs_weight directly (outside fs_classify's
    threshold-augmented check) would otherwise get wrong weights with
    many or fine-grained comparators.
    """
    max_num, max_den = _weight_capacity(comparators)
    _check_capacity(max(max_num, max_den))
    return _weight_columns(comparators)


def fs_classify(
    pairs: DataFrame,
    comparators: list[Comparator],
    link_at: tuple[int, int] = (32, 1),
    nonlink_below: tuple[int, int] = (1, 2),
) -> DataFrame:
    """Append per-field agreement flags, the exact-rational composite
    weight, its double rendering (one division), and the three-way
    Fellegi-Sunter decision to a blocked candidate-pair frame.

    ``link_at = (a, b)`` links when weight >= a/b;
    ``nonlink_below = (c, d)`` rejects when weight < c/d — both applied
    by BIGINT cross-multiplication, never on the double.
    """
    la_n, la_d = link_at
    nl_n, nl_d = nonlink_below
    if la_n * nl_d <= nl_n * la_d:
        raise ValueError("link_at must exceed nonlink_below")
    # capacity check (exact, driver-side): the worst-case |_wn| / |_wd|
    # across agreement patterns, times the largest threshold
    # cross-multiplier, must stay inside BIGINT — Spark's default
    # non-ANSI long multiply wraps silently, which would turn an
    # overflow into wrong link/nonlink decisions instead of an error.
    # (fs_weight guards the bare product; this is the stricter
    # threshold-augmented bound, checked once — the column build below
    # is the unguarded helper, so the capacity product runs once and the
    # threshold-aware message always wins.)
    max_num, max_den = _weight_capacity(comparators)
    bound = max(max_num * max(la_d, nl_d), max_den * max(la_n, nl_n))
    _check_capacity(bound)
    num, den = _weight_columns(comparators)
    out = pairs
    for c in comparators:
        out = out.withColumn(f"agree_{c.name}", c.agree)
    out = out.withColumn("_wn", num).withColumn("_wd", den)
    decision = (
        F.when(F.col("_wn") * la_d >= F.col("_wd") * la_n, F.lit("link"))
        .when(F.col("_wn") * nl_d < F.col("_wd") * nl_n, F.lit("nonlink"))
        .otherwise(F.lit("possible"))
    )
    return out.withColumn(
        "weight", F.col("_wn").cast("double") / F.col("_wd").cast("double")
    ).withColumn("decision", decision).drop("_wn", "_wd")
