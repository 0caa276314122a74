"""Bounded-memory sketch operators with exact final answers.

The pattern: a sketch pass generates a SMALL candidate set with a
provable no-false-negative guarantee, then an exact pass verifies only
the candidates. The output is exact (oracle-checkable with plain SQL) —
the sketch is purely a cost optimization, so sketch nondeterminism
(partition layout, eviction order) can never change the answer.

Why this matters at 100 TB: a full ``GROUP BY key`` over a heavy-tailed
key column shuffles every distinct key; when only the heavy keys are
wanted, that shuffle is almost entirely wasted work. Misra-Gries gives a
per-partition candidate summary of fixed size (``counters`` entries, no
matter how many rows or distinct keys a partition holds), and the exact
recount touches only candidate rows via a broadcast semi-join filter —
so the wide aggregation runs over a tiny key set.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries_partition(
    batches: Iterator[pd.DataFrame], key: str, counters: int
) -> Iterator[pd.DataFrame]:
    """Classic Misra-Gries over one partition's stream of Arrow batches:
    ``counters`` live (key, count) slots; a miss with a full table decrements
    every slot and drops zeros. Guarantee: any key occurring more than
    n_partition/(counters+1) times in this partition survives."""
    table: dict = {}
    for pdf in batches:
        # vectorized pre-count per batch, then merge — same summary-size
        # bound, ~100x fewer dict ops than row-at-a-time MG
        for k, c in pdf[key].value_counts().items():
            if k in table:
                table[k] += int(c)
            elif len(table) < counters:
                table[k] = int(c)
            else:
                # decrement-by-min instead of unit decrements: merging a
                # batch count c into a full table is the standard
                # mergeable-summaries step (Agarwal et al., PODS'12)
                dec = min(int(c), min(table.values()))
                table = {
                    k2: v - dec for k2, v in table.items() if v - dec > 0
                }
                if int(c) - dec > 0 and len(table) < counters:
                    table[k] = int(c) - dec
    yield pd.DataFrame({key: list(table.keys())})


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    theta: float,
    slack: float = 2.0,
) -> DataFrame:
    """Exact heavy hitters: every ``key_col`` value occurring in at least
    ``theta`` fraction of rows, with its exact count — two passes, bounded
    executor memory, no full-key-space shuffle.

    Pass 1 (candidates): per-partition Misra-Gries with
    ``ceil(slack/theta)`` counters via ``mapInPandas``. Pigeonhole: a key
    with global frequency >= theta*N has local frequency >= theta*n_p in
    at least one partition p, and MG with c >= 1/theta counters retains
    every key above n_p/(c+1) — so the union of partition summaries is a
    SUPERSET of the true heavy hitters regardless of partition layout
    (``slack`` > 1 only widens the net). Summary size is fixed at ``c``
    keys per partition — independent of data volume.

    Pass 2 (exact): broadcast the candidate keys (at most c *
    n_partitions, thousands not billions), semi-join-filter the corpus,
    exact count per surviving key, keep count >= ceil(theta * N). N is an
    exact single-column count (cheap column-pruned scan).

    The result is EXACT and partition-invariant — false positives from
    pass 1 are removed by the recount, false negatives cannot occur.

    NULL keys: pandas ``value_counts`` silently drops NaN/None, so a
    null key could never become an MG candidate (and the semi-join would
    not match it) — yet the plain ``GROUP BY ... HAVING`` oracle keeps a
    NULL group. Nulls are therefore counted in a separate exact branch
    (they're one group — no sketch needed) and the NULL row is emitted
    whenever it crosses the same threshold.
    """
    if not 0.0 < theta <= 1.0:
        raise ValueError(f"theta must be in (0, 1], got {theta}")
    if slack < 1.0:
        raise ValueError(
            "slack must be >= 1.0 — the superset guarantee needs "
            f"counters >= 1/theta, got slack={slack}"
        )
    counters = max(1, math.ceil(slack / theta))
    keyed = df.select(key_col)
    tot = keyed.agg(
        F.count(F.lit(1)).alias("n"), F.count(key_col).alias("nn")
    ).collect()[0]
    n_total, null_cnt = tot["n"], tot["n"] - tot["nn"]
    # max(1, ...) only matters when n_total == 0: ceil(theta * 0) == 0
    # would make the NULL branch emit a spurious (NULL, 0) row where the
    # GROUP BY ... HAVING oracle returns an empty frame. For any
    # non-empty input ceil(theta * n_total) >= 1 already.
    threshold = max(1, math.ceil(theta * n_total))

    field = keyed.schema[key_col]
    cands = keyed.mapInPandas(
        lambda it: _misra_gries_partition(it, key_col, counters),
        schema=f"{key_col} {field.dataType.simpleString()}",
    ).distinct()

    out = (
        keyed.join(F.broadcast(cands), on=key_col, how="left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )
    if null_cnt >= threshold:
        null_row = df.sparkSession.createDataFrame(
            [(None, null_cnt)], schema=out.schema
        )
        out = out.unionByName(null_row)
    return out
