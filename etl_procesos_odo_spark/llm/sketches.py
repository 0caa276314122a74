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

# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al., AofA 2007) with a cross-engine-exact
# formulation: the key hash is the repo's shared md5/hash60 primitive
# (bit-identical hex in both engines; only the hex->int spelling differs
# per engine, an exact integer step), register extraction is exact
# integer math (modulo + bin()-bit-length — no shift operators, whose
# spelling differs between engines), and every estimate step is either a
# power-of-two-exact integer sum or one correctly-rounded IEEE double
# operation (+ - * / and int->double casts), so Spark and any ANSI-SQL
# oracle produce BIT-IDENTICAL estimates. The libm-dependent pieces (ln
# in the linear-counting correction, the alpha_m constant) are
# precomputed in Python and embedded as double literals, never evaluated
# by either engine's math library. A linear congruential hash is NOT
# usable here: max-of-leading-zeros needs avalanche, and an affine map of
# sequential keys is a lattice whose low bits almost never land near 0 —
# measured 20x underestimation at 5k sequential keys.
# ---------------------------------------------------------------------------

#: Standard small-m bias constants (Flajolet et al., Fig. 3).
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}

#: Width of the md5-derived hash60 primitive (15 hex chars).
_HLL_HASH_BITS = 60


def _dlit(x: float) -> str:
    """A double literal BOTH engines parse as DOUBLE. A bare decimal
    literal (``118.803...``) parses as DECIMAL in both Spark and DuckDB,
    and a 64-branch CASE then unifies branches of differing decimal
    scales by clamping — silently rounding some values (measured: one-ulp
    divergence in the linear-counting lookup). Scientific notation is a
    DOUBLE literal in both engines; ``repr`` round-trips exactly."""
    s = repr(float(x))
    return s if ("e" in s or "E" in s) else s + "e0"


def hll_register_exprs(
    key_sql: str, p: int = 6, engine: str = "spark"
) -> dict:
    """SQL fragments mapping a non-null key to its HLL register. All
    steps are exact integer arithmetic, so the per-engine spelling of the
    md5-hex->int conversion (Spark ``conv``, ANSI ``CAST('0x'||...)``)
    cannot perturb parity:

    - ``h``: the repo's hash60 — first 15 md5 hex chars as a positive
      60-bit BIGINT (md5 output is bit-identical across engines).
    - ``bucket``: the HIGH ``p`` bits of h, extracted as
      ``(h - h % 2^W) / 2^W``. The numerator is a multiple of 2^W with
      only ``p`` significant bits, so the double division is exact.
    - ``rho``: position of the leftmost 1-bit of the LOW ``W = 60 - p``
      bits ``w``, via ``(W + 1) - length(bin(w))`` — ``bin()`` renders
      the minimal binary string in both engines, making bit-length (and
      hence the leading-zero count) available without shift operators.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    if engine not in ("spark", "duckdb"):
        raise ValueError(f"engine must be spark|duckdb, got {engine}")
    m = 1 << p
    w_bits = _HLL_HASH_BITS - p
    two_w = 1 << w_bits
    if engine == "spark":
        h = (
            f"cast(conv(substring(md5(cast({key_sql} as string)), 1, 15), "
            f"16, 10) as bigint)"
        )
    else:
        h = (
            f"cast('0x' || substring(md5(cast({key_sql} as varchar)), "
            f"1, 15) as bigint)"
        )
    w = f"({h} % {two_w})"
    bucket = f"cast(({h} - {h} % {two_w}) / {two_w} as bigint)"
    rho = (
        f"(case when {w} = 0 then {w_bits + 1} "
        f"else cast({w_bits + 1} - length(bin({w})) as bigint) end)"
    )
    return {"bucket": bucket, "rho": rho, "m": m, "w_bits": w_bits}


def hll_estimate_exprs(p: int = 6) -> dict:
    """SQL fragments turning per-group register aggregates into the HLL
    estimate. Expects two BIGINT columns computed from the register table
    (one row per set register, ``r`` = max rho in that register):

    - ``n_set``  = COUNT(*)              (registers with r >= 1)
    - ``s_set``  = SUM(2^(W + 1 - r))    (exact: each term <= 2^W, at most
      m terms, so the sum fits a BIGINT for every p <= 16)

    The raw estimate alpha_m * m^2 / Z with Z = sum_j 2^(-r_j) over ALL m
    registers (absent registers contribute 2^0) is algebraically
    alpha_m * m^2 * 2^(W+1) / (s_set + (m - n_set) * 2^(W+1)): one exact
    integer denominator, one embedded double constant, one cast, one
    division — bit-identical across engines. The small-range correction
    (linear counting m*ln(m/V) when E <= 2.5m and V > 0) needs ln, so the
    m possible values are precomputed here and emitted as a CASE lookup of
    double literals. The large-range correction fires above 2^60/30 —
    unreachable for real key domains — and is omitted.
    """
    m = 1 << p
    w_bits = _HLL_HASH_BITS - p
    two_w1 = 1 << (w_bits + 1)
    alpha = _HLL_ALPHA.get(m, 0.7213 / (1 + 1.079 / m))
    c_num = float(alpha * m * m * two_w1)
    raw = (
        f"({_dlit(c_num)} / cast(s_set + ({m} - n_set) * "
        f"cast({two_w1} as bigint) as double))"
    )
    lc_branches = " ".join(
        f"when {v} then {_dlit(m * math.log(m / v))}"
        for v in range(1, m + 1)
    )
    lc = f"(case ({m} - n_set) {lc_branches} end)"
    est = (
        f"(case when n_set < {m} and {raw} <= {_dlit(2.5 * m)} "
        f"then {lc} else {raw} end)"
    )
    return {"raw_est": raw, "est": est, "m": m}


def hll_cardinality(
    df: DataFrame,
    key_sql: str,
    group_exprs: dict,
    p: int = 6,
    exact_audit: bool = True,
) -> DataFrame:
    """Approximate COUNT(DISTINCT key) per group with FIXED per-group
    state: ``m = 2^p`` max-registers instead of one state entry per
    distinct key.

    Why this matters at 100 TB: exact distinct-count shuffles every
    distinct (group, key) pair — at billions of users the shuffle IS the
    job. The register pass here is a ``groupBy(group, bucket).max(rho)``
    whose map-side partial aggregation bounds every partition's output at
    m rows per group (8*m bytes of state), and whose merge is a plain
    ``max`` — the sketch is mergeable across partitions, days, or
    clusters by construction. Accuracy is the standard 1.04/sqrt(m).

    ``exact_audit=True`` adds the exact COUNT(DISTINCT) arm and the
    relative error column — the accuracy audit a pipeline runs at small
    scale before trusting the sketch at large scale (and what makes the
    operator oracle-checkable end-to-end). Production at 100 TB runs with
    ``exact_audit=False``: registers only, no per-key shuffle.

    All estimate arithmetic is shared-expression-string exact (see
    ``hll_register_exprs`` / ``hll_estimate_exprs``), so the output is
    bit-identical to an ANSI-SQL oracle evaluating the same strings.
    """
    reg = hll_register_exprs(key_sql, p, engine="spark")
    est = hll_estimate_exprs(p)
    w_bits = reg["w_bits"]
    groups = list(group_exprs)
    projected = df.filter(F.expr(f"{key_sql} is not null")).selectExpr(
        *[f"{sql} as {alias}" for alias, sql in group_exprs.items()],
        f"{reg['bucket']} as bucket",
        f"{reg['rho']} as rho",
    )
    registers = projected.groupBy(*groups, "bucket").agg(
        F.max("rho").alias("r")
    )
    per_group = registers.groupBy(*groups).agg(
        F.expr("count(*)").alias("n_set"),
        F.expr(
            f"sum(shiftleft(cast(1 as bigint), "
            f"cast({w_bits + 1} - r as int)))"
        ).alias("s_set"),
    )
    cols = [
        *groups,
        "n_set",
        f"{est['raw_est']} as raw_est",
        f"{est['est']} as hll_est",
    ]
    if not exact_audit:
        return per_group.selectExpr(*cols)
    exact = (
        df.filter(F.expr(f"{key_sql} is not null"))
        .selectExpr(
            *[f"{sql} as {alias}" for alias, sql in group_exprs.items()],
            f"{key_sql} as __k",
        )
        .groupBy(*groups)
        .agg(F.countDistinct("__k").alias("n_exact"))
    )
    return per_group.join(exact, on=groups).selectExpr(
        *cols,
        "n_exact",
        f"(({est['est']}) - cast(n_exact as double)) "
        "/ cast(n_exact as double) as rel_err",
    )


def hll_oracle_sql(
    table_sql: str,
    key_sql: str,
    group_exprs: dict,
    p: int = 6,
) -> str:
    """The ANSI-SQL oracle for ``hll_cardinality(exact_audit=True)`` —
    the SAME register/estimate expression strings, composed with plain
    GROUP BYs (DuckDB spells the power-of-two register sum with ``<<``
    and the md5-hex->int step with ``CAST('0x'||...)``; Spark needs
    ``shiftleft`` / ``conv`` — all exact integer ops, so the spelling
    differences cannot perturb the result)."""
    reg = hll_register_exprs(key_sql, p, engine="duckdb")
    est = hll_estimate_exprs(p)
    w_bits = reg["w_bits"]
    g_aliases = ", ".join(group_exprs)
    g_sql = ", ".join(
        f"{sql} AS {alias}" for alias, sql in group_exprs.items()
    )
    return f"""
    WITH keyed AS (
      SELECT {g_sql}, {reg["bucket"]} AS bucket, {reg["rho"]} AS rho
      FROM {table_sql} WHERE {key_sql} IS NOT NULL
    ),
    registers AS (
      SELECT {g_aliases}, bucket, MAX(rho) AS r
      FROM keyed GROUP BY {g_aliases}, bucket
    ),
    per_group AS (
      SELECT {g_aliases}, COUNT(*) AS n_set,
             SUM(CAST(1 AS BIGINT) << CAST({w_bits + 1} - r AS INT)) AS s_set
      FROM registers GROUP BY {g_aliases}
    ),
    exact AS (
      SELECT {g_sql}, COUNT(DISTINCT {key_sql}) AS n_exact
      FROM {table_sql} WHERE {key_sql} IS NOT NULL
      GROUP BY {g_aliases}
    )
    SELECT {g_aliases}, n_set,
           {est["raw_est"]} AS raw_est,
           {est["est"]} AS hll_est,
           n_exact,
           (({est["est"]}) - CAST(n_exact AS DOUBLE))
             / CAST(n_exact AS DOUBLE) AS rel_err
    FROM per_group JOIN exact USING ({g_aliases})
    """


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


# ---------------------------------------------------------------------------
# KMV / bottom-k distinct-value sketch (Bar-Yossef et al., RANDOM 2002;
# Beyer et al., SIGMOD 2007 "On synopses for distinct-value estimation
# under multiset operations"). The property HLL registers cannot offer:
# a KMV sketch is a SAMPLE of the distinct-key hash space, so sketches
# compose under set INTERSECTION, not just union — the k smallest hashes
# of A ∪ B are computable from the two sketches alone, and the fraction
# of them present in both sketches is an unbiased Jaccard estimator
# (exactly the MinHash argument, but with ONE hash function and a
# bottom-k sample instead of k independent permutations — one md5 per
# key instead of k).
#
# Cross-engine exactness: the hash is the shared md5/hash60 primitive;
# "k smallest distinct" is exact integer ordering (collision-free in
# practice at 60 bits, and identical in both engines even on collision);
# the estimator (k-1) * 2^60 / h_(k) is one division of two exactly-
# representable doubles ((k-1)*2^60 is a 7-significant-bit multiple of a
# power of two; h_(k) < 2^60 int->double casts round identically), so
# every estimate is bit-identical to an ANSI-SQL oracle.
# ---------------------------------------------------------------------------

#: Size of the hash60 value space — KMV scales the k-th order statistic
#: against this to recover the distinct count.
_KMV_SPACE = 1 << _HLL_HASH_BITS


def kmv_min_k(
    df: DataFrame,
    group_cols: list[str],
    h_col: str = "h",
    k: int = 128,
    stripes: int = 8,
) -> DataFrame:
    """The ``k`` smallest DISTINCT ``h_col`` values per group, with their
    rank: the KMV sketch build. Returns ``group_cols + [h_col, 'rn']``.

    Scale shape: the distinct pass is a map-side-combinable shuffle on
    (group, h). The min-k pass is a TWO-stage window — stage 1 ranks
    within (group, h % stripes) and keeps k per stripe, so the
    per-group sort parallelizes ``stripes``-way and stage 2's exact
    global rank orders at most ``stripes * k`` survivors per group
    (the q50 striped-rank pattern; a single window per group would
    funnel every distinct hash of a hot group through one reducer).
    """
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if stripes < 1:
        raise ValueError(f"stripes must be >= 1, got {stripes}")
    d = df.select(*group_cols, h_col).distinct()
    w1 = Window.partitionBy(
        *group_cols, F.pmod(F.col(h_col), F.lit(stripes))
    ).orderBy(h_col)
    pruned = (
        d.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .drop("_rn1")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(h_col)
    return (
        pruned.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
    )


def kmv_estimate_expr(
    k: int, n_col: str = "n_set", hk_col: str = "hk"
) -> str:
    """SQL fragment (valid in Spark and DuckDB) turning the per-group
    sketch aggregates ``n_col`` = COUNT(*) (<= k) and ``hk_col`` = MAX(h)
    into the KMV distinct-count estimate:

    - short sketch (n < k): every distinct hash was kept — the count is
      EXACT, returned as-is.
    - full sketch: the k-th order statistic of n uniform draws on
      [0, 2^60) sits at ~ k/(n+1) * 2^60, so the unbiased estimator is
      (k-1) * 2^60 / h_(k)  (Beyer et al. 2007, eq. 2).
    """
    num = _dlit(float((k - 1) * _KMV_SPACE))
    return (
        f"(case when {n_col} < {k} then cast({n_col} as double) "
        f"else {num} / cast({hk_col} as double) end)"
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005): a
# d x w grid of counters; key k increments cell (j, h_j(k) % w) in each
# of the d rows, and a point query reads the MIN over the d cells — an
# OVERestimate, never an under (each cell >= the key's true count), with
# error <= eps * N at probability 1 - delta for w = ceil(e/eps),
# d = ceil(ln 1/delta). The frequency complement to Misra-Gries (q106:
# exact top-k only) and the HLL/KMV cardinality arms: CMS answers "how
# often does ANY key occur" in fixed d*w state, and sketches of disjoint
# streams merge by cellwise ADDITION. The same grid also estimates JOIN
# sizes (AGM-style planner statistics): sum_k cA(k)*cB(k) <= the
# row-wise inner product of two sketches, minimized over rows.
#
# Everything is exact integer arithmetic on md5-derived cells, so sketch
# contents, point estimates, and inner products are bit-identical to an
# ANSI-SQL oracle by construction.
# ---------------------------------------------------------------------------


def cms_cell_exprs(
    key_sql: str, d: int, w: int, salt: str, engine: str
) -> list[str]:
    """Per-row cell expressions ``h_j(key) % w`` for j in [0, d): the
    shared md5/hash60 primitive seeded by ``salt || j``."""
    if not (1 <= d <= 8 and 2 <= w):
        raise ValueError(f"need 1 <= d <= 8 and w >= 2, got d={d} w={w}")
    cells = []
    for j in range(d):
        if engine == "spark":
            h = (
                f"cast(conv(substring(md5(concat('{salt}{j}:', "
                f"cast({key_sql} as string))), 1, 15), 16, 10) as bigint)"
            )
        elif engine == "duckdb":
            h = (
                f"CAST('0x' || substr(md5('{salt}{j}:' || "
                f"CAST({key_sql} AS VARCHAR)), 1, 15) AS BIGINT)"
            )
        else:
            raise ValueError(f"engine must be spark|duckdb, got {engine}")
        cells.append(f"({h} % {w})")
    return cells


def cms_sketch(
    df: DataFrame, key_sql: str, d: int = 4, w: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Build the CMS counter grid as a DataFrame ``(j, cell, cnt)`` —
    at most d*w rows regardless of input volume. One pass: ``stack``
    emits the d (row, cell) coordinates per input row and the groupBy
    partial-aggregates map-side, so the shuffle carries counter
    partials (<= d*w per task), not raw rows. Disjoint-stream sketches
    merge by unioning the frames and re-summing (cellwise addition) —
    the mergeable-summaries property that lets 1000 executors sketch
    independently."""
    cells = cms_cell_exprs(key_sql, d, w, salt, "spark")
    stack_args = ", ".join(f"{j}, {c}" for j, c in enumerate(cells))
    return (
        df.selectExpr(f"stack({d}, {stack_args}) as (j, cell)")
        .groupBy("j", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_point_estimates(
    sketch: DataFrame, keys: DataFrame, key_col: str,
    d: int = 4, w: int = 256, salt: str = "cms",
) -> DataFrame:
    """Point-frequency estimates for a key panel: each key's d cells
    (same seeded expressions), left-joined against the counter grid,
    MIN over rows (absent cell = 0). Returns ``(key_col, est)``; the
    estimate is >= the true count always, and the grid side of the
    join is broadcast-tiny (d*w rows)."""
    cells = cms_cell_exprs(key_col, d, w, salt, "spark")
    stack_args = ", ".join(f"{j}, {c}" for j, c in enumerate(cells))
    probes = keys.selectExpr(
        key_col, f"stack({d}, {stack_args}) as (j, cell)"
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "cell"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("est")
        )
    )
