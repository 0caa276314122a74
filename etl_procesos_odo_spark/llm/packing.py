"""Sequence assembly for training pipelines: packing documents into
fixed token-budget training sequences, and chunking long documents into
overlapping context windows.

Scale design
------------
- **Packing** is inherently order-dependent (a document's pack depends on
  every document before it), so the scalable form is *stratum-local*:
  a deterministic order within bounded strata (language, source, or a
  hash stripe — the partitioner's stripe pattern composes here for
  unbounded key spaces), one window cumulative sum per stratum, no
  global serial pass.
- **Chunking** is embarrassingly parallel: tokenize once, explode one
  row per chunk — per-row expressions at scan speed, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text_analysis import token_count_ws, tokens


def pack_sequences(
    df: DataFrame,
    id_col: str,
    budget: int,
    strata_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to a fixed token-budget training sequence:
    documents are laid out in deterministic ``id_col`` order within each
    stratum and the pack boundary falls at every ``budget`` cumulative
    tokens — ``pack_id = cum_tokens_before // budget`` (a document
    spanning a boundary belongs to the pack where it starts).

    Returns (id, stratum, n_tokens, pack_id, offset_in_pack). The window
    runs per stratum: strata must be bounded in size (language/source
    buckets, or compose with a hash-stripe column for arbitrary volume —
    the same two-pass trick operators/partitioner.py uses)."""
    t = df.select(
        F.col(id_col),
        F.col(strata_col),
        token_count_ws(F.col(text_col)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy(strata_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
        "cum_before"
    )
    s = t.select(id_col, strata_col, "n_tokens", cum_before)
    return s.select(
        id_col,
        strata_col,
        "n_tokens",
        F.floor(F.col("cum_before") / budget).cast("long").alias("pack_id"),
        (F.col("cum_before") % budget).cast("long").alias("offset_in_pack"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document's token stream into overlapping context-window
    chunks (stride = chunk_tokens - overlap), one output row per chunk:
    (id, chunk_idx, n_chunk_tokens, chunk_text). Empty documents produce
    no chunks; the final chunk may be short. Tokenize-once + explode —
    scan-speed, no shuffle."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    w = tokens(F.col(text_col))
    n = F.size(w)
    # number of chunks: 1 + ceil(max(n - chunk, 0) / stride), exact in
    # double for any realistic document length
    n_chunks = (
        F.lit(1)
        + F.floor(
            (F.greatest(n - chunk_tokens, F.lit(0)) + F.lit(stride - 1))
            / F.lit(stride)
        )
    ).cast("int")
    base = df.select(F.col(id_col), w.alias("_w"), n_chunks.alias("_nc")).filter(
        F.size("_w") > 0
    )
    chunk = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.col("_nc") - 1),
            lambda i: F.struct(
                i.cast("long").alias("idx"),
                F.slice(F.col("_w"), i * stride + 1, chunk_tokens).alias("toks"),
            ),
        )
    )
    return base.select(F.col(id_col), chunk.alias("c")).select(
        id_col,
        F.col("c.idx").alias("chunk_idx"),
        F.size("c.toks").cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", "c.toks").alias("chunk_text"),
    )


def interleave_order(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    salt: str = "il1",
    seq_stripes: int = 256,
) -> DataFrame:
    """Deterministic proportional interleave — the global training-data
    ordering step: shuffle each stratum (source/language) by a content
    hash, then stride-merge the strata so every prefix of the stream
    carries approximately the corpus mix (a doc ranked r of n in its
    stratum lands at position key (r - 1/2) / n in [0, 1]). Any prefix
    of length L then holds between floor(L·n_s/N) - 1 and
    ceil(L·n_s/N) + 1 docs of each stratum s — the curriculum/mixing
    guarantee batch-local random shuffles do NOT give (a random order
    leaves Θ(sqrt(L)) mix drift; stride interleave caps it at 1).

    No single-reducer pass at any step: the within-stratum shuffle rank
    is computed per (stratum, hash-stripe) window + tiny offset table
    (the q50 `_striped_global_rank` pattern, md5-hash-keyed so the
    order is engine-portable); the GLOBAL sequence number uses the same
    two-phase trick striped by ``floor(pos_key * seq_stripes)`` —
    monotone in pos_key, so local ranks + a ≤ ``seq_stripes``-row
    offset table compose to the exact global rank. At 100 TB the export
    writes with ``repartitionByRange(pos_key)`` + per-file local sort;
    the seq/stripe machinery here also hands each doc its shard.

    Returns one row per doc: stratum, id, ``r_src``/``n_src`` (rank and
    size within stratum), ``pos_key`` (double — exact (r - 0.5)/n, one
    correctly-rounded division), ``seq`` (1-based global position).
    """
    from .dedup import hash60

    # within-stratum rank by (hash, id): striped local windows + offsets
    keyed = df.select(
        F.col(stratum_col).alias("stratum"), F.col(id_col).alias("id")
    ).withColumn(
        "_h", hash60(F.concat(F.lit(salt), F.col("id").cast("string")))
    ).withColumn(
        "_st", F.shiftright(F.col("_h"), 52)
    )
    wl = Window.partitionBy("stratum", "_st").orderBy("_h", "id")
    wp = Window.partitionBy("stratum", "_st")
    local = keyed.withColumn("_lrk", F.row_number().over(wl)).withColumn(
        "_c", F.count("*").over(wp)
    )
    cnts = local.filter(F.col("_lrk") == 1).select("stratum", "_st", "_c")
    w_off = (
        Window.partitionBy("stratum")
        .orderBy("_st")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = cnts.select(
        "stratum",
        "_st",
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_c").over(Window.partitionBy("stratum")).alias("n_src"),
    )
    ranked = (
        local.join(F.broadcast(offs), ["stratum", "_st"])
        .withColumn("r_src", (F.col("_off") + F.col("_lrk")).cast("long"))
        .select(
            "stratum", "id", "r_src", F.col("n_src").cast("long").alias("n_src")
        )
        .withColumn(
            "pos_key",
            F.expr("(cast(r_src as double) - 0.5e0) / cast(n_src as double)"),
        )
        # one narrow row per doc, consumed by the global-seq local-rank
        # branch, its offset-table branch, and the final join;
        # unmaterialized each consumer re-runs the scan + the striped
        # within-stratum window (measured 4 scans). ~40 B/row — at
        # cluster scale this is persist(MEMORY_AND_DISK) territory, in
        # a single JVM an eager checkpoint; either way cache bytes beat
        # three recomputes of the rank subtree.
        .localCheckpoint(eager=True)
    )
    # global sequence: same two-phase rank, striped monotonically in the
    # position key (pos_key in (0, 1) by construction)
    g = ranked.withColumn(
        "_gs", F.expr(f"cast(floor(pos_key * {seq_stripes}e0) as int)")
    )
    wgl = Window.partitionBy("_gs").orderBy("pos_key", "stratum", "id")
    wgp = Window.partitionBy("_gs")
    glocal = g.withColumn("_glrk", F.row_number().over(wgl)).withColumn(
        "_gc", F.count("*").over(wgp)
    )
    gcnts = glocal.filter(F.col("_glrk") == 1).select("_gs", "_gc")
    w_goff = (
        Window.partitionBy(F.lit(1))
        .orderBy("_gs")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    goffs = gcnts.select(
        "_gs", F.coalesce(F.sum("_gc").over(w_goff), F.lit(0)).alias("_goff")
    )
    return (
        glocal.join(F.broadcast(goffs), "_gs")
        .withColumn("seq", (F.col("_goff") + F.col("_glrk")).cast("long"))
        .select("stratum", "id", "r_src", "n_src", "pos_key", "seq")
    )
