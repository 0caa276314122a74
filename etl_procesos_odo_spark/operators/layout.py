"""Multi-dimensional data layout: Z-order (Morton) clustering.

A 100 TB table queried by more than one dimension (user AND time, key
AND date) can only be range-partitioned on one of them — the other
dimension's filters then touch every file. Z-ordering interleaves the
bits of several normalized dimensions into one sort key, so sorting by
it co-locates rows that are close in EVERY dimension: each parquet
file's min/max spans stay narrow on all interleaved columns at once,
and row-group/file pruning works for filters on any of them (the
layout Delta/Iceberg expose as OPTIMIZE ZORDER BY; Morton 1966).

Everything here is exact integer expression arithmetic — engine-
identical, so the z-values themselves are oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_to_bits(
    col: Column, lo: float, hi: float, bits: int
) -> Column:
    """Map a numeric column into [0, 2^bits) by linear scaling over the
    PROVIDED [lo, hi] domain (pass stats from a prior 1-row agg or
    catalog metadata — keeping the domain explicit keeps the expression
    pure and both engines identical). Values outside clamp to the
    edges; the scale factor is one double multiply, floored to integer.
    """
    if bits < 1:
        raise ValueError(f"bits must be >= 1, got {bits}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    span = hi - lo
    scaled = F.floor(
        (
            F.least(F.greatest(col.cast("double"), F.lit(float(lo))),
                    F.lit(float(hi)))
            - F.lit(float(lo))
        )
        / F.lit(span)
        * F.lit(float((1 << bits) - 1))
    ).cast("long")
    return scaled


def zorder_key(dims: Sequence[Column], bits: int = 16) -> Column:
    """Morton interleave of pre-normalized integer dims (each already in
    [0, 2^bits)): output bit (b * ndims + i) = bit b of dims[i]. Pure
    shift/mask/sum — total output bits = bits * len(dims) must stay
    <= 63 (long)."""
    ndims = len(dims)
    if bits * ndims > 63:
        raise ValueError(
            f"bits * ndims = {bits * ndims} exceeds a signed long"
        )
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, d in enumerate(dims):
            out = out + (
                F.shiftleft(
                    F.shiftright(d.cast("long"), b).bitwiseAND(F.lit(1)),
                    b * ndims + i,
                )
            )
    return out


def zorder_file_spans(
    df: DataFrame,
    key: Column,
    span_cols: Sequence[str],
    n_files: int,
) -> DataFrame:
    """Layout-quality probe: sort by ``key``, slice into ``n_files``
    equal ranges ("files"), and report each file's min/max span per
    ``span_cols`` — the exact statistics parquet footers would carry.
    A filter on a column prunes every file whose [min, max] misses it,
    so narrower spans == more pruning. Used by the layout test to show
    z-order beats single-column order on the non-leading dimension."""
    from pyspark.sql import Window

    w = Window.orderBy(key.asc(), *[F.col(c) for c in span_cols])
    ranked = df.withColumn("_rn", F.row_number().over(w))
    total = df.count()
    per = max(1, -(-total // n_files))
    binned = ranked.withColumn(
        "_file", ((F.col("_rn") - 1) / F.lit(per)).cast("long")
    )
    aggs = []
    for c in span_cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return binned.groupBy("_file").agg(*aggs)


def table_digest(df, cols: Sequence[str]) -> "DataFrame":
    """Order-independent content digest of a table: SUM of per-row
    60-bit md5 hashes in DECIMAL(38,0), reduced mod the Mersenne prime
    2^61 - 1 — commutative and associative, so the digest is invariant
    under partitioning, file layout, task order, and row order.

    This is the replication / migration validator a 100 TB estate runs
    after a bucketed rewrite, a Z-order compaction (this module), an
    engine migration, or a cross-cluster copy: digest(source) ==
    digest(rewritten) proves content equality with ONE map-side-
    combinable aggregation per side — no sort, no join, no row
    comparison, constant memory. Headroom: a 60-bit term summed over
    10^12 rows stays < 10^31, inside DECIMAL(38,0).

    ``cols`` must be string-cast-stable types (int/bigint/string/date/
    decimal — NOT raw double, whose string rendering is engine-
    dependent); rows hash as ``md5('|'-joined values)`` with an explicit
    NULL sentinel (``concat_ws`` alone would collapse NULL and empty).
    Collision note: md5 keeps this safe against accidental divergence,
    not adversarial construction.
    """
    from ..llm.dedup import hash60

    sentinel = F.lit("␀")  # symbol-for-null; outside the data alphabet
    parts = [
        F.coalesce(F.col(c).cast("string"), sentinel) for c in cols
    ]
    h = hash60(F.concat_ws("|", *parts))
    return df.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(
            "cast(sum(cast(h as decimal(38,0))) % 2305843009213693951 "
            "as bigint)"
        ).alias("digest"),
    )


def bucketed_digest(
    df, cols: Sequence[str], key_col: str, n_buckets: int = 64
) -> "DataFrame":
    """Per-bucket content digests — the Merkle-style refinement of
    ``table_digest``: rows are assigned to ``n_buckets`` stable hash
    buckets by ``key_col`` (md5-derived, engine-portable), and each
    bucket gets its own order-independent digest + row count.

    Two copies of a 100 TB table that disagree are then DIFFED by
    joining 2 x n_buckets summary rows — divergence is localized to the
    damaged key range(s) without comparing, sorting, or shuffling any
    rows; repair re-syncs only the mismatched buckets. Same aggregation
    shape as ``table_digest`` (map-side combinable, constant memory),
    plus one tiny bucket key."""
    from ..llm.dedup import hash60

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    sentinel = F.lit("␀")
    parts = [
        F.coalesce(F.col(c).cast("string"), sentinel) for c in cols
    ]
    h = hash60(F.concat_ws("|", *parts))
    bucket = hash60(F.col(key_col).cast("string")) % n_buckets
    return (
        df.select(bucket.alias("bucket"), h.alias("h"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(
                "cast(sum(cast(h as decimal(38,0))) "
                "% 2305843009213693951 as bigint)"
            ).alias("digest"),
        )
    )


def digest_diff(
    a, b, cols: Sequence[str], key_col: str, n_buckets: int = 64
) -> "DataFrame":
    """Full-outer comparison of two tables' bucketed digests: one row
    per bucket present on either side, with per-side row counts/digests
    and an ``is_match`` verdict. The repair planner for replicated
    estates — only ``is_match = false`` buckets need re-sync."""
    da = bucketed_digest(a, cols, key_col, n_buckets)
    db = bucketed_digest(b, cols, key_col, n_buckets)
    return (
        da.alias("a")
        .join(db.alias("b"), on="bucket", how="full_outer")
        .select(
            "bucket",
            F.col("a.n_rows").alias("n_rows_a"),
            F.col("b.n_rows").alias("n_rows_b"),
            F.col("a.digest").alias("digest_a"),
            F.col("b.digest").alias("digest_b"),
            (
                F.col("a.digest").eqNullSafe(F.col("b.digest"))
                & F.col("a.n_rows").eqNullSafe(F.col("b.n_rows"))
            ).alias("is_match"),
        )
    )


def zonemap_prune_audit(
    df: DataFrame,
    layouts: dict[str, Column],
    value_col: str,
    predicates: Sequence[tuple[int, str, str]],
) -> DataFrame:
    """Data-skipping effectiveness audit: for each candidate LAYOUT
    (an expression assigning every row to a "file") and each range
    predicate in a literal workload, report how many files — and rows —
    a zone-map-pruning scan would have to read.

    This is the measurement that justifies (or rejects) a 100 TB layout
    rewrite BEFORE paying for it: per-file min/max footer stats are
    simulated by ``groupBy(layout, file).agg(min, max, count)`` — one
    combining aggregate per layout, no sort, no window (the layout is an
    EXPRESSION, so candidate layouts are evaluated without materializing
    either one) — and a file must be read iff its [min, max] span
    overlaps the predicate's [lo, hi]. A clustered layout yields
    read fractions near the predicate's selectivity; a hash layout
    yields 1.0 (every file overlaps everything). Complements
    ``zorder_key`` (which BUILDS a layout) with the audit that says
    whether it pays.

    ``predicates``: (pred_id, lo, hi) ISO-date literals, inclusive.
    Returns (layout, pred_id, n_files, files_read, rows_read,
    read_frac) — exact integers plus ONE division.
    """
    if not layouts:
        raise ValueError("need at least one candidate layout")
    if not predicates:
        raise ValueError(
            "need at least one predicate — an empty workload would return "
            "zero rows, indistinguishable from 'nothing needs reading'"
        )
    parts = []
    for name, file_expr in layouts.items():
        parts.append(
            df.select(
                F.lit(name).alias("layout"),
                file_expr.cast("long").alias("file_id"),
                F.col(value_col).cast("date").alias("_d"),
            )
        )
    tagged = parts[0]
    for p in parts[1:]:
        tagged = tagged.unionByName(p)
    stats = tagged.groupBy("layout", "file_id").agg(
        F.min("_d").alias("min_d"),
        F.max("_d").alias("max_d"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    preds = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(pid).cast("long").alias("pred_id"),
                    F.lit(lo).cast("date").alias("lo"),
                    F.lit(hi).cast("date").alias("hi"),
                )
                for pid, lo, hi in predicates
            ]
        )
    ).alias("p")
    audit = stats.select("*", preds).select(
        "layout", "file_id", "n_rows",
        F.col("p.pred_id").alias("pred_id"),
        (
            (F.col("min_d") <= F.col("p.hi"))
            & (F.col("max_d") >= F.col("p.lo"))
        ).alias("_read"),
    )
    return audit.groupBy("layout", "pred_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.when(F.col("_read"), 1).otherwise(0))
        .cast("long")
        .alias("files_read"),
        F.sum(F.when(F.col("_read"), F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_read"),
    ).withColumn(
        "read_frac",
        F.col("files_read").cast("double") / F.col("n_files").cast("double"),
    )
