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

# o_dsum routes the decimal -> double cast through VARCHAR like every
# registry oracle (r11 lint convention): safe at any sum magnitude, not
# just the sf0.001 fixture's (r11 advice)
from etl_procesos_odo_spark.registry import o_dsum  # noqa: E402

_SALTED_ORACLE = f"""
    SELECT c_mktsegment, COUNT(*) AS n_events,
           {o_dsum('value')} AS total_value
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


# --- 12. Balanced partitioner (operators/partitioner.py, r11 verdict) ---
# Membership is seeded-hash-order dependent (documented divergence from
# the reference RNG shuffle), so the oracle is the ntile SIZE invariant:
# per-(unit, particion) counts must equal ntile's closed-form quota for
# EVERY (num_parts, seed) draw — sizes differ <=1, remainder to the
# lowest part ids.

_PARTITIONER = _draws(lambda r: {
    "num_parts": r.choice((2, 3, 4, 5, 7, 8)),
    "seed": r.choice((1, 7, 42, 99, 123)),
})


def _partitioner_oracle(num_parts: int) -> str:
    return f"""
    WITH a AS (
      SELECT c_mktsegment,
             ntile({num_parts}) OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_custkey) AS particion
      FROM (SELECT DISTINCT c_mktsegment, c_custkey FROM customer)
    )
    SELECT c_mktsegment, CAST(particion AS BIGINT) AS particion,
           COUNT(*) AS n_keys
    FROM a GROUP BY 1, 2
    """


@pytest.mark.parametrize(
    "p", _PARTITIONER, ids=[str(p) for p in _PARTITIONER]
)
def test_fuzz_partitioner(p, spark, ddb):
    from etl_procesos_odo_spark.operators.partitioner import (
        balanced_partition,
    )

    cust = load_table(spark, SF_DIR, "customer")
    assign = balanced_partition(
        cust, "c_mktsegment", "c_custkey", p["num_parts"], seed=p["seed"]
    )
    df = assign.groupBy(
        "c_mktsegment", F.col("particion").cast("long").alias("particion")
    ).agg(F.count("*").alias("n_keys"))
    assert_parity(
        df, ddb, _partitioner_oracle(p["num_parts"]),
        name=f"fuzz_partitioner{p}",
    )


# --- 13. Decontamination (llm/dedup.py decontaminate, r11 verdict) ------

_DECON = _draws(lambda r: {
    "k": r.choice((2, 3, 4)),
    "min_shared": r.randint(1, 3),
    # exact-in-binary fractions (n/64) so FLOOR(frac * n_docs) is the
    # same IEEE product on both sides; ints exercise the absolute cap
    "max_df": r.choice((5, 20, 50, 1 / 64, 1 / 32, 3 / 64)),
})


@pytest.mark.parametrize("p", _DECON, ids=[str(p) for p in _DECON])
def test_fuzz_decontaminate(p, spark, ddb):
    from etl_procesos_odo_spark.llm.dedup import decontaminate
    from etl_procesos_odo_spark.queries_llm import _decontaminate_oracle

    docs = load_table(spark, SF_DIR, "documents")
    df = decontaminate(
        docs.filter(F.col("doc_id") % 50 != 0),
        docs.filter(F.col("doc_id") % 50 == 0),
        "text", "doc_id",
        k=p["k"], min_shared=p["min_shared"], max_df=p["max_df"],
    )
    assert_parity(
        df, ddb,
        _decontaminate_oracle(p["k"], p["min_shared"], p["max_df"]),
        name=f"fuzz_decon{p}",
    )


# --- 14. As-of join tolerance (operators/joins.py, r11 verdict) ---------

_ASOF = _draws(lambda r: {
    # sf0.001 purchase gaps span minutes-to-days: these tolerances put
    # both fresh and stale matches in play
    "tolerance": r.choice((600.0, 3600.0, 6 * 3600.0, 86400.0, None)),
})


def _asof_oracle(tolerance: float | None) -> str:
    val = "r.value"
    rts = "r.ts"
    if tolerance is not None:
        fresh = (
            "(CAST(epoch_us(l.ts) AS DOUBLE) / 1000000.0 - "
            f"CAST(epoch_us(r.ts) AS DOUBLE) / 1000000.0) <= {tolerance!r}"
        )
        val = f"CASE WHEN {fresh} THEN r.value END"
        rts = f"CASE WHEN {fresh} THEN r.ts END"
    return f"""
    WITH rdd AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rk
        FROM events WHERE event_type = 'purchase'
      ) WHERE rk = 1
    ),
    l AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click')
    SELECT l.event_id, l.user_id, l.ts,
           {val} AS last_purchase_value, {rts} AS last_purchase_ts
    FROM l ASOF LEFT JOIN rdd r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """


@pytest.mark.parametrize("p", _ASOF, ids=[str(p) for p in _ASOF])
def test_fuzz_asof_tolerance(p, spark, ddb):
    from pyspark.sql import Window

    from etl_procesos_odo_spark.operators.joins import asof_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, SF_DIR, "events")
    wdd = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rk", F.row_number().over(wdd))
        .filter("rk = 1")
        .select("user_id", "ts", "value")
    )
    left = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    df = asof_join(
        left, right, "user_id", "ts", "ts",
        {"value": "last_purchase_value", "ts": "last_purchase_ts"},
        tolerance_seconds=p["tolerance"],
    )
    assert_parity(
        df, ddb, _asof_oracle(p["tolerance"]), name=f"fuzz_asof{p}"
    )


# --- 15. CDC chunk bounds (llm/packing.py cdc_chunks, r11 verdict) ------

_CDC = _draws(lambda r: {
    "divisor": r.choice((4, 8, 16, 32, 64)),
    "hash_mod": r.choice((4096, 8192, 16384, 32768)),
})


@pytest.mark.parametrize("p", _CDC, ids=[str(p) for p in _CDC])
def test_fuzz_cdc_chunks(p, spark, ddb):
    from etl_procesos_odo_spark.llm.packing import cdc_chunks
    from etl_procesos_odo_spark.queries_llm import _cdc_oracle

    docs = load_table(spark, SF_DIR, "documents")
    df = cdc_chunks(
        docs, "text", "doc_id",
        window=4, divisor=p["divisor"], hash_mod=p["hash_mod"],
    )
    assert_parity(
        df, ddb, _cdc_oracle(p["divisor"], p["hash_mod"]),
        name=f"fuzz_cdc{p}",
    )


# --- 16. Near-dup triangle count (queries_llm q146 shape) ---------------

_TRI = _draws(lambda r: {"threshold": r.choice((0.3, 0.4, 0.5, 0.6))})


@pytest.mark.parametrize("p", _TRI, ids=[str(p) for p in _TRI])
def test_fuzz_triangles(p, spark, ddb):
    from etl_procesos_odo_spark.llm.dedup import minhash_lsh_pairs
    from etl_procesos_odo_spark.queries_llm import _triangles_oracle

    docs = load_table(spark, SF_DIR, "documents")
    e = (
        minhash_lsh_pairs(docs, "text", "doc_id", threshold=p["threshold"])
        .select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .localCheckpoint(eager=True)
    )
    e2 = e.select(F.col("a").alias("b2a"), F.col("b").alias("c"))
    e3 = e.select(F.col("a").alias("va"), F.col("b").alias("vb"))
    tri = (
        e.join(e2, e["b"] == e2["b2a"])
        .join(e3, (F.col("a") == F.col("va")) & (F.col("c") == F.col("vb")))
    )
    n_tri = tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    n_e = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    assert_parity(
        n_tri.crossJoin(n_e), ddb, _triangles_oracle(p["threshold"]),
        name=f"fuzz_tri{p}",
    )


# --- 17. K-means training loop (llm/similarity.py kmeans_train) ---------

_KTRAIN = _draws(lambda r: {
    "n_cells": r.choice((4, 8, 12)),
    "rounds": r.randint(1, 4),
})


@pytest.mark.parametrize("p", _KTRAIN, ids=[str(p) for p in _KTRAIN])
def test_fuzz_kmeans_train(p, spark, ddb):
    from etl_procesos_odo_spark.llm.similarity import kmeans_train
    from etl_procesos_odo_spark.queries_enrich import _kmeans_train_oracle

    emb = load_table(spark, SF_DIR, "embeddings")
    df = kmeans_train(
        emb, "vec_id", "embedding",
        n_cells=p["n_cells"], rounds=p["rounds"],
    )
    assert_parity(
        df, ddb, _kmeans_train_oracle(p["n_cells"], p["rounds"]),
        name=f"fuzz_ktrain{p}",
    )


# --- 18. Trained-IVF ANN (llm/similarity.py, q123 shape) -----------------

_IVFT = _draws(lambda r: {
    "n_cells": r.choice((4, 8, 12)),
    "rounds": r.randint(1, 3),
    "k": r.choice((3, 5)),
    "nprobe": r.randint(1, 3),
})


@pytest.mark.parametrize("p", _IVFT, ids=[str(p) for p in _IVFT])
def test_fuzz_ivf_trained(p, spark, ddb):
    from etl_procesos_odo_spark.llm.similarity import (
        ivf_topk, kmeans_train_centroids,
    )
    from etl_procesos_odo_spark.queries_enrich import _ivf_trained_oracle

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = kmeans_train_centroids(
        emb, "vec_id", "embedding", n_cells=p["n_cells"], rounds=p["rounds"]
    )
    df = ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10),
        n_cells=p["n_cells"], k=p["k"], nprobe=p["nprobe"],
        centroids=cents,
    ).withColumn("cell", F.col("cell").cast("long"))
    assert_parity(
        df, ddb,
        _ivf_trained_oracle(
            n_cells=p["n_cells"], rounds=p["rounds"],
            k=p["k"], nprobe=p["nprobe"],
        ),
        name=f"fuzz_ivft{p}",
    )


# --- 19. IVF recall@k eval (llm/similarity.py ann_recall, q107 shape) ---

_RECALL = _draws(lambda r: {
    "n_cells": r.choice((8, 16, 32)),
    "k": r.choice((3, 5, 8)),
    "nprobe": r.randint(1, 3),
})


@pytest.mark.parametrize("p", _RECALL, ids=[str(p) for p in _RECALL])
def test_fuzz_recall(p, spark, ddb):
    from etl_procesos_odo_spark.llm.similarity import ann_recall
    from etl_procesos_odo_spark.queries_llm import _recall_oracle

    emb = load_table(spark, SF_DIR, "embeddings")
    df = ann_recall(
        emb, emb.filter(F.col("vec_id") < 10),
        n_cells=p["n_cells"], k=p["k"], nprobe=p["nprobe"],
    )
    assert_parity(
        df, ddb, _recall_oracle(p["n_cells"], p["k"], p["nprobe"]),
        name=f"fuzz_recall{p}",
    )


# --- 20. Hybrid RRF fusion (llm/similarity.py hybrid_rrf_topk) -----------

_RRF = _draws(lambda r: {
    "n_queries": r.choice((4, 8)),
    "pool": r.choice((10, 20)),
    "k": r.choice((5, 10)),
    "rrf_k": r.choice((10, 60, 100)),
})


@pytest.mark.parametrize("p", _RRF, ids=[str(p) for p in _RRF])
def test_fuzz_hybrid_rrf(p, spark, ddb):
    from etl_procesos_odo_spark.llm.similarity import hybrid_rrf_topk
    from etl_procesos_odo_spark.queries_llm import _rrf_oracle

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    df = hybrid_rrf_topk(
        docs, emb,
        n_queries=p["n_queries"], pool=p["pool"],
        k=p["k"], rrf_k=p["rrf_k"],
    )
    assert_parity(
        df, ddb,
        _rrf_oracle(p["n_queries"], p["pool"], p["k"], p["rrf_k"]),
        name=f"fuzz_rrf{p}",
    )


# --- 21. Multi-probe hyperplane-LSH ANN (q68 shape) ----------------------

_PROBE = _draws(lambda r: {
    "n_planes": r.choice((6, 8, 10)),
    "k": r.choice((3, 5)),
    "seed": r.choice((1, 42, 123)),
})


@pytest.mark.parametrize("p", _PROBE, ids=[str(p) for p in _PROBE])
def test_fuzz_ann_multiprobe(p, spark, ddb):
    from etl_procesos_odo_spark.llm.similarity import (
        lsh_bucket_topk_multiprobe,
    )
    from etl_procesos_odo_spark.queries_llm import _ann_multiprobe_oracle

    emb = load_table(spark, SF_DIR, "embeddings")
    df = lsh_bucket_topk_multiprobe(
        emb, emb.filter(F.col("vec_id") < 10),
        dim=64, k=p["k"], n_planes=p["n_planes"], seed=p["seed"], probe=2,
    )
    assert_parity(
        df, ddb,
        _ann_multiprobe_oracle(64, p["n_planes"], p["seed"], p["k"]),
        name=f"fuzz_probe{p}",
    )


# --- 22. Embedding near-dup pairs (q48 shape) -----------------------------

_ENEAR = _draws(lambda r: {
    "threshold": r.choice((0.25, 0.35, 0.45)),
    "n_planes": r.choice((6, 8)),
    "seed": r.choice((7, 42)),
})


@pytest.mark.parametrize("p", _ENEAR, ids=[str(p) for p in _ENEAR])
def test_fuzz_embedding_neardup(p, spark, ddb):
    from etl_procesos_odo_spark.llm.similarity import cosine_neardup_pairs
    from etl_procesos_odo_spark.queries_llm import _neardup_oracle

    emb = load_table(spark, SF_DIR, "embeddings")
    df = cosine_neardup_pairs(
        emb, dim=64,
        threshold=p["threshold"], n_planes=p["n_planes"], seed=p["seed"],
    )
    assert_parity(
        df, ddb,
        _neardup_oracle(64, p["n_planes"], p["seed"], p["threshold"]),
        name=f"fuzz_eneardup{p}",
    )


# --- 23. IVF hard-negative mining (q118 shape) ----------------------------

_HARDNEG = _draws(lambda r: {
    "n_cells": r.choice((4, 8)),
    "nprobe": r.randint(2, 4),
    "band": r.choice(((0.05, 0.25), (0.0, 0.2), (0.1, 0.3))),
    "n": r.choice((3, 5)),
})


@pytest.mark.parametrize("p", _HARDNEG, ids=[str(p) for p in _HARDNEG])
def test_fuzz_hard_negatives(p, spark, ddb):
    from etl_procesos_odo_spark.llm.similarity import (
        hard_negatives_topk_ivf,
    )
    from etl_procesos_odo_spark.queries_llm import _hard_neg_ivf_oracle

    emb = load_table(spark, SF_DIR, "embeddings")
    lo, hi = p["band"]
    df = hard_negatives_topk_ivf(
        emb, emb.filter(F.col("vec_id") < 10),
        band_lo=lo, band_hi=hi, n=p["n"],
        n_cells=p["n_cells"], nprobe=p["nprobe"],
    )
    assert_parity(
        df, ddb,
        _hard_neg_ivf_oracle(
            n_cells=p["n_cells"], nprobe=p["nprobe"],
            band_lo=lo, band_hi=hi, n=p["n"],
        ),
        name=f"fuzz_hardneg{p}",
    )


# --- 24. HLL register width p (llm/sketches.py, q159 shape, r12 verdict) --

_HLLP = _draws(lambda r: {"p": r.choice((4, 5, 7, 8, 10))})


@pytest.mark.parametrize("p", _HLLP, ids=[str(p) for p in _HLLP])
def test_fuzz_hll_p(p, spark, ddb):
    """Every estimate constant (alpha_m, the linear-counting ln table,
    the register split) is a function of p — a drawn p re-derives ALL
    of them on both engines through the shared expression generators."""
    from etl_procesos_odo_spark.llm.sketches import (
        hll_cardinality, hll_oracle_sql,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    groups = {"wk": "cast(date_trunc('week', ts) as date)"}
    ev = load_table(spark, SF_DIR, "events")
    df = hll_cardinality(ev, "user_id", groups, p=p["p"])
    assert_parity(
        df, ddb,
        hll_oracle_sql("events", "user_id", groups, p=p["p"]),
        name=f"fuzz_hll{p}",
    )


# --- 25. CMS grid d x w (llm/sketches.py, q171 shape, r12 verdict) --------

_CMSG = _draws(lambda r: {
    "d": r.choice((1, 2, 3, 5, 8)),
    "w": r.choice((64, 128, 512, 1024)),
})


@pytest.mark.parametrize("p", _CMSG, ids=[str(p) for p in _CMSG])
def test_fuzz_cms_grid(p, spark, ddb):
    """The full q171 composite (point estimates + join-size inner
    product + both exact audit arms) under a drawn counter grid: every
    seeded cell expression and the min-over-rows reductions re-derive
    from (d, w) on both engines."""
    from etl_procesos_odo_spark.queries_llm import (
        _cms_frequency_plan, _cms_oracle,
    )

    df = _cms_frequency_plan(spark, SF_DIR, p["d"], p["w"])
    assert_parity(
        df, ddb, _cms_oracle(p["d"], p["w"]), name=f"fuzz_cms{p}"
    )


# --- 26. Priority-sample k / salt (llm/sampling.py, q169, r12 verdict) ----

_PRIO = _draws(lambda r: {
    "k": r.choice((4, 8, 16, 48, 64)),
    "salt": r.choice(("ps1", "psA", "psB")),
})


@pytest.mark.parametrize("p", _PRIO, ids=[str(p) for p in _PRIO])
def test_fuzz_priority_sample(p, spark, ddb):
    """tau, the sample membership, and both estimator columns all move
    with (k, salt); small k exercises tau > many weights (adjusted
    weights dominate), large k exercises groups smaller than k
    (tau = 0, sample = whole group)."""
    from etl_procesos_odo_spark.llm.sampling import priority_sample
    from etl_procesos_odo_spark.queries_llm import _priority_sample_oracle

    docs = load_table(spark, SF_DIR, "documents")
    df = priority_sample(
        docs, ["source"], "doc_id", "n_chars", k=p["k"], salt=p["salt"]
    )
    assert_parity(
        df, ddb, _priority_sample_oracle(p["k"], p["salt"]),
        name=f"fuzz_prio{p}",
    )


# --- 27. Interval-overlap bin width (operators/joins.py, r12 verdict) -----

_IOV = _draws(lambda r: {
    "bin_s": r.choice((300, 900, 3600, 7200, 21600)),
    "max_span_bins": r.choice((None, 4, 16)),
})


def _interval_overlap_oracle() -> str:
    """Bin-width-INVARIANT oracle: the drawn (bin_us, max_span_bins)
    are implementation knobs — the overlap-pair result must be the
    direct nested-loop predicate's, exactly, for every draw."""
    return """
    WITH l AS (SELECT event_id AS l_id,
                      CAST(epoch_us(ts) AS BIGINT) AS start_us,
                      CAST(epoch_us(ts) + 2700000000 AS BIGINT) AS end_us
               FROM events WHERE event_type = 'purchase'),
    r AS (SELECT event_id AS r_id,
                 CAST(epoch_us(ts) AS BIGINT) AS r_start_us,
                 CAST(epoch_us(ts) + 5400000000 AS BIGINT) AS r_end_us
          FROM events WHERE event_type = 'click')
    SELECT l.l_id, l.start_us, l.end_us,
           r.r_id, r.r_start_us, r.r_end_us,
           CAST(least(l.end_us, r.r_end_us)
                - greatest(l.start_us, r.r_start_us) AS BIGINT)
             AS overlap_us
    FROM l JOIN r
      ON least(l.end_us, r.r_end_us)
         - greatest(l.start_us, r.r_start_us) > 0
    """


@pytest.mark.parametrize("p", _IOV, ids=[str(p) for p in _IOV])
def test_fuzz_interval_overlap_bin(p, spark, ddb):
    from etl_procesos_odo_spark.operators.joins import interval_overlap_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, SF_DIR, "events")
    left = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("l_id"),
        F.unix_micros("ts").alias("start_us"),
        (F.unix_micros("ts") + 2_700_000_000).alias("end_us"),
    )
    right = ev.filter("event_type = 'click'").select(
        F.col("event_id").alias("r_id"),
        F.unix_micros("ts").alias("r_start_us"),
        (F.unix_micros("ts") + 5_400_000_000).alias("r_end_us"),
    )
    df = interval_overlap_join(
        left, right, l_keys=["l_id"], r_keys=["r_id"],
        bin_us=p["bin_s"] * 1_000_000,
        max_span_bins=p["max_span_bins"],
    )
    assert_parity(
        df, ddb, _interval_overlap_oracle(), name=f"fuzz_iov{p}"
    )


# --- 28. Decision-rule helpers (recommend_salting / recommend_state_store)

_RULES = _draws(lambda r: {
    "frac": round(r.random(), 3),
    "red": r.choice((8, 32, 200, 1024)),
    "state_gb": r.choice((0.1, 1.0, 8.0, 16.0, 64.0)),
    "churn": round(r.random(), 3),
    "heap_gb": r.choice((8, 24, 64)),
})


@pytest.mark.parametrize("p", _RULES, ids=[str(p) for p in _RULES])
def test_fuzz_recommend_rules(p):
    """Property-fuzz for the two codified decision rules (no SQL
    oracle — pure functions): outputs must re-derive from the inputs
    via the documented branch conditions, and the clamps must hold at
    every draw."""
    import math

    from etl_procesos_odo_spark.operators.joins import recommend_salting
    from etl_procesos_odo_spark.streaming.temporal import (
        recommend_state_store,
    )

    # salting: AQE-capable never salts; otherwise the documented
    # excess > 3 rule with n_salt = ceil(excess) clamped to [2, red]
    salt, n, why = recommend_salting(p["frac"], p["red"])
    assert not salt and n == 1
    salt, n, why = recommend_salting(
        p["frac"], p["red"], aqe_skew_split_available=False
    )
    excess = p["frac"] * p["red"]
    if excess <= 3.0:
        assert not salt and n == 1
    else:
        assert salt and n == max(2, min(p["red"], math.ceil(excess)))

    # state store: churn-heavy -> default; else heap-pressure >= 0.4 ->
    # rocksdb; else default — and the class string always matches
    GB = 1 << 30
    prov, cls, _ = recommend_state_store(
        int(p["state_gb"] * GB), p["churn"], p["heap_gb"] * GB
    )
    if p["churn"] > 0.3:
        want = "hdfs_backed_default"
    elif p["state_gb"] / p["heap_gb"] >= 0.4:
        want = "rocksdb"
    else:
        want = "hdfs_backed_default"
    assert prov == want
    assert cls.endswith(
        "RocksDBStateStoreProvider" if prov == "rocksdb"
        else "HDFSBackedStateStoreProvider"
    )
