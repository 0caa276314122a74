"""Parameter-fuzz arbiter (round 11): for parameterized operators, draw
seeded-random parameter sets and RE-DERIVE the DuckDB oracle SQL from the
same constants, then require exact driver-style parity.

The fixed-fixture oracle rows pin one point of each operator's parameter
space; the randomized SCD2/CDC arbiters (round 8) showed that bugs hide
at the points the fixtures never visit (q202's NULL-history class). This
module generalizes that: each operator below has a parameterized oracle
BUILDER (the same function its registry row is generated from), so any
parameter draw yields a full Spark-vs-DuckDB hash comparison, not a
weaker property check.

Seeded (random.Random(FUZZ_SEED)) — a failure reproduces exactly; the
draws are stable across runs and machines. Parameter grids are chosen to
respect each operator's documented contracts (e.g. simhash exact recall
needs max_hamming <= bands-1 and bands | 60; minhash needs
bands | num_hashes) and to exercise both-verdict regions at the sf0.001
fixture's value ranges (e.g. semantic-dedup thresholds below the ~0.5
max within-cluster cosine so kept AND pruned rows appear).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etl_procesos_odo_spark.session import load_table

from .conftest import SF_DIR, assert_parity

FUZZ_SEED = 20260816
_R = random.Random(FUZZ_SEED)
N_DRAWS = 3


def _draws(fn):
    """Materialize N_DRAWS parameter dicts at collection time (stable:
    one shared seeded stream, consumed in file order)."""
    return [fn(_R) for _ in range(N_DRAWS)]


# --- 1. MinHash-LSH near-dup pairs (llm/dedup.py minhash_lsh_pairs) ----

_MINHASH = _draws(lambda r: {
    "bands": (b := r.choice((2, 3, 4, 6))),
    "num_hashes": b * r.choice((2, 3)),
    "threshold": r.choice((0.3, 0.4, 0.5, 0.6)),
})


@pytest.mark.parametrize("p", _MINHASH, ids=[str(p) for p in _MINHASH])
def test_fuzz_minhash_lsh(p, spark, ddb):
    from etl_procesos_odo_spark.llm.dedup import minhash_lsh_pairs
    from etl_procesos_odo_spark.queries_llm import _minhash_oracle

    docs = load_table(spark, SF_DIR, "documents")
    df = minhash_lsh_pairs(
        docs, "text", "doc_id", k=3,
        num_hashes=p["num_hashes"], bands=p["bands"],
        threshold=p["threshold"],
    )
    assert_parity(
        df, ddb,
        _minhash_oracle(p["num_hashes"], p["bands"], p["threshold"]),
        name=f"fuzz_minhash{p}",
    )


# --- 2. SimHash banded pairs (llm/dedup.py simhash_neardup_pairs) ------

_SIMHASH = _draws(lambda r: {
    "bands": (b := r.choice((3, 4, 5, 6))),   # must divide 60
    "max_hamming": r.randint(0, b - 1),        # exact-recall contract
})


@pytest.mark.parametrize("p", _SIMHASH, ids=[str(p) for p in _SIMHASH])
def test_fuzz_simhash_pairs(p, spark, ddb):
    from etl_procesos_odo_spark.llm.dedup import simhash_neardup_pairs
    from etl_procesos_odo_spark.queries_llm import _simhash_pairs_oracle

    docs = load_table(spark, SF_DIR, "documents")
    df = simhash_neardup_pairs(
        docs, "text", "doc_id",
        max_hamming=p["max_hamming"], bands=p["bands"],
    )
    assert_parity(
        df, ddb, _simhash_pairs_oracle(p["max_hamming"], p["bands"]),
        name=f"fuzz_simhash{p}",
    )


# --- 3. LSH-bucket ANN (llm/similarity.py lsh_bucket_topk) -------------

_ANN = _draws(lambda r: {
    "n_planes": r.choice((4, 6, 8, 10)),
    "k": r.choice((3, 5, 8)),
    "seed": r.choice((1, 7, 42, 123)),
})


@pytest.mark.parametrize("p", _ANN, ids=[str(p) for p in _ANN])
def test_fuzz_ann_lsh(p, spark, ddb):
    from etl_procesos_odo_spark.llm.similarity import lsh_bucket_topk
    from etl_procesos_odo_spark.queries_llm import _ann_oracle

    emb = load_table(spark, SF_DIR, "embeddings")
    df = lsh_bucket_topk(
        emb, emb.filter(F.col("vec_id") < 10), dim=64,
        k=p["k"], n_planes=p["n_planes"], seed=p["seed"],
    )
    assert_parity(
        df, ddb, _ann_oracle(64, p["n_planes"], p["seed"], p["k"]),
        name=f"fuzz_ann{p}",
    )


# --- 4. IVF ANN (llm/similarity.py ivf_topk) ---------------------------

_IVF = _draws(lambda r: {
    "n_cells": r.choice((4, 8, 16, 32)),
    "k": r.choice((3, 5, 8)),
    "nprobe": r.choice((1, 2, 3)),
})


@pytest.mark.parametrize("p", _IVF, ids=[str(p) for p in _IVF])
def test_fuzz_ivf(p, spark, ddb):
    from etl_procesos_odo_spark.llm.similarity import ivf_topk
    from etl_procesos_odo_spark.queries_llm import _ivf_oracle

    emb = load_table(spark, SF_DIR, "embeddings")
    df = ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10),
        n_cells=p["n_cells"], k=p["k"], nprobe=p["nprobe"],
    )
    assert_parity(
        df, ddb, _ivf_oracle(p["n_cells"], p["k"], p["nprobe"]),
        name=f"fuzz_ivf{p}",
    )


# --- 5. PageRank over the near-dup graph (llm/dedup.py pagerank_rounds) -

_PAGERANK = _draws(lambda r: {
    "damping": r.choice((0.5, 0.7, 0.85, 0.9)),
    "rounds": r.randint(1, 3),
    "threshold": r.choice((0.4, 0.5, 0.6)),
})


@pytest.mark.parametrize("p", _PAGERANK, ids=[str(p) for p in _PAGERANK])
def test_fuzz_pagerank(p, spark, ddb):
    from etl_procesos_odo_spark.llm.dedup import (
        minhash_lsh_pairs, pagerank_rounds,
    )
    from etl_procesos_odo_spark.queries_llm import _pagerank_oracle

    docs = load_table(spark, SF_DIR, "documents")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", threshold=p["threshold"]
    ).select("id_a", "id_b")
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    df = pagerank_rounds(
        edges, damping=p["damping"], rounds=p["rounds"]
    ).select(F.col("node").alias("doc_id"), "rank")
    assert_parity(
        df, ddb,
        _pagerank_oracle(p["damping"], p["rounds"], p["threshold"]),
        name=f"fuzz_pagerank{p}",
    )


# --- 6. Semantic dedup (llm/similarity.py semantic_dedup) --------------

_SEMDEDUP = _draws(lambda r: {
    "n_cells": r.choice((4, 8, 12)),
    # below the ~0.5 max within-cluster cosine so both verdicts appear
    "threshold": r.choice((0.25, 0.3, 0.35, 0.4)),
})


@pytest.mark.parametrize("p", _SEMDEDUP, ids=[str(p) for p in _SEMDEDUP])
def test_fuzz_semantic_dedup(p, spark, ddb):
    from etl_procesos_odo_spark.llm.similarity import semantic_dedup
    from etl_procesos_odo_spark.queries_enrich import _semantic_dedup_oracle

    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .distinct()
    )
    df = semantic_dedup(
        emb, "vec_id", "embedding",
        n_cells=p["n_cells"], threshold=p["threshold"],
    )
    assert_parity(
        df, ddb, _semantic_dedup_oracle(p["n_cells"], p["threshold"]),
        name=f"fuzz_semdedup{p}",
    )


# --- 7. BM25 retrieval (llm/text_analysis.py bm25_topk) ----------------

_VOCAB = ("vector", "stream", "filter", "join", "scan", "window",
          "hash", "sort", "merge", "query")
_BM25 = _draws(lambda r: {
    "terms": sorted(r.sample(_VOCAB, r.randint(2, 4))),
    "k1": r.choice((0.8, 1.2, 1.5, 2.0)),
    "b": r.choice((0.0, 0.25, 0.5, 0.75, 1.0)),
    "topk": r.choice((5, 10, 20)),
})


@pytest.mark.parametrize("p", _BM25, ids=[str(p) for p in _BM25])
def test_fuzz_bm25(p, spark, ddb):
    from etl_procesos_odo_spark.llm.text_analysis import bm25_topk
    from etl_procesos_odo_spark.queries_llm import _bm25_oracle

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .distinct()
    )
    df = bm25_topk(
        docs, "text", "doc_id", p["terms"],
        k1=p["k1"], b=p["b"], topk=p["topk"],
    )
    assert_parity(
        df, ddb, _bm25_oracle(p["terms"], p["k1"], p["b"], p["topk"]),
        name=f"fuzz_bm25{p}",
    )


# --- 8. Mixture rebalance (llm/sampling.py mix_rebalance) --------------

def _mix_targets(r) -> dict[str, float]:
    """Random positive shares over the 5 fixture langs, normalized to an
    exactly-representable grid (integer twentieths) so both engines
    parse the identical double literals."""
    langs = ("de", "en", "es", "fr", "zh")
    w = [r.randint(1, 8) for _ in langs]
    tot = sum(w)
    # snap to /20 grid: keep shares simple and text-round-trip-stable
    shares = [max(1, round(20 * x / tot)) for x in w]
    shares[0] += 20 - sum(shares)
    if shares[0] < 1:  # re-balance a negative snap into the largest share
        j = shares.index(max(shares))
        shares[j] += shares[0] - 1
        shares[0] = 1
    return dict(zip(langs, (s / 20 for s in shares)))


_MIX = _draws(lambda r: {"targets": _mix_targets(r),
                         "salt": r.choice(("mixA", "mixB", "mixC"))})


@pytest.mark.parametrize("p", _MIX, ids=[str(p) for p in _MIX])
def test_fuzz_mix_rebalance(p, spark, ddb):
    from etl_procesos_odo_spark.llm.sampling import mix_rebalance
    from etl_procesos_odo_spark.llm.text_analysis import tokens
    from etl_procesos_odo_spark.queries_llm import _mix_oracle

    docs = load_table(spark, SF_DIR, "documents")
    base = docs.select(
        "doc_id", "lang",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    df = mix_rebalance(
        base, "doc_id", "lang", "n_tokens", p["targets"], salt=p["salt"]
    ).select("doc_id", "lang", "n_tokens", "rate")
    assert_parity(
        df, ddb, _mix_oracle(p["targets"], p["salt"]),
        name=f"fuzz_mix{p}",
    )


# --- 9. Salted join (operators/joins.py salted_join) -------------------
# The oracle is the PLAIN join — parameter-free by construction: salting
# is placement-only, so every n_salt must reproduce it bit-for-bit.

_SALTED = _draws(lambda r: {"n_salt": r.choice((2, 3, 8, 16, 32))})

_SALTED_ORACLE = """
    SELECT c_mktsegment, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """


@pytest.mark.parametrize("p", _SALTED, ids=[str(p) for p in _SALTED])
def test_fuzz_salted_join(p, spark, ddb):
    from etl_procesos_odo_spark.operators.joins import salted_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, SF_DIR, "events")
    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = salted_join(
        ev, cust, "user_id", "c_custkey", "event_id", n_salt=p["n_salt"]
    )
    df = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias(
            "total_value"
        ),
    )
    assert_parity(df, ddb, _SALTED_ORACLE, name=f"fuzz_salted{p}")


# --- 10. K-means Lloyd step (llm/similarity.py kmeans_lloyd_step) ------

_KMEANS = _draws(lambda r: {"n_cells": r.choice((4, 8, 12, 16))})


@pytest.mark.parametrize("p", _KMEANS, ids=[str(p) for p in _KMEANS])
def test_fuzz_kmeans_step(p, spark, ddb):
    from etl_procesos_odo_spark.llm.similarity import kmeans_lloyd_step
    from etl_procesos_odo_spark.queries_enrich import _kmeans_oracle

    emb = load_table(spark, SF_DIR, "embeddings")
    df = kmeans_lloyd_step(emb, "vec_id", "embedding", n_cells=p["n_cells"])
    assert_parity(
        df, ddb, _kmeans_oracle(p["n_cells"]), name=f"fuzz_kmeans{p}"
    )


# --- 11. Z-order keys (operators/layout.py zorder_key) -----------------

_ZORDER = _draws(lambda r: {"bits": r.choice((4, 6, 8, 10, 12))})


@pytest.mark.parametrize("p", _ZORDER, ids=[str(p) for p in _ZORDER])
def test_fuzz_zorder(p, spark, ddb):
    from etl_procesos_odo_spark.operators.layout import (
        normalize_to_bits, zorder_key,
    )
    from etl_procesos_odo_spark.queries_enrich import _zorder_oracle

    bits = p["bits"]
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, SF_DIR, "events")
    day = F.floor(
        (F.col("ts").cast("double") - F.lit(1704067200.0)) / F.lit(86400.0)
    )
    du = normalize_to_bits(F.col("user_id"), 0.0, 149.0, bits)
    dd = normalize_to_bits(day, 0.0, 365.0, bits)
    df = ev.select("event_id", zorder_key([du, dd], bits=bits).alias("zkey"))
    assert_parity(df, ddb, _zorder_oracle(bits), name=f"fuzz_zorder{p}")
