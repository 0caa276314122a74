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
