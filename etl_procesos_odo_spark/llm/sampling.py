"""Deterministic corpus sampling for training-data pipelines.

At 100 TB, ``rand()``-based sampling (``df.sample``, ``sampleBy``) is the
wrong tool for corpus construction: results change across runs, retries,
and partition layouts, so a re-run of a failed stage yields a different
corpus. Hash-based sampling keys the keep/drop decision on a content-
derived uniform — reproducible across runs AND engines (the md5 primitive
matches DuckDB bit-for-bit, so the sample itself is oracle-checkable),
stable under repartitioning, and embarrassingly parallel (a per-row
expression at scan speed, no shuffle, no RNG state to coordinate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash60

TWO_POW_60 = float(1 << 60)


def hash_uniform(key: Column, salt: str = "s1") -> Column:
    """Deterministic uniform in [0, 1): 60-bit md5 hash of (salt ‖ key)
    scaled by 2^60. Change the salt to draw an independent sample."""
    return hash60(F.concat(F.lit(salt), key.cast("string"))) / F.lit(TWO_POW_60)


def hash_sample(
    df: DataFrame,
    id_col: str,
    rates: dict[str, float],
    strata_col: str,
    default_rate: float = 0.0,
    salt: str = "s1",
) -> DataFrame:
    """Stratified deterministic sample: keep a row iff
    ``hash_uniform(id) < rates[stratum]`` — e.g. language rebalancing for
    a training mix (keep 50% of English, 30% of Spanish, ...). Strata not
    in ``rates`` fall back to ``default_rate``. Expected (not exact)
    fractions, like ``sampleBy`` — but re-runnable."""
    rate: Column = F.lit(default_rate)
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(r)).otherwise(rate)
    return df.filter(hash_uniform(F.col(id_col), salt) < rate)
