"""Hostile-data regression pins (round 10).

The adversarial census (``verify_all.py --adversarial`` over
``datagen.py --adversarial``'s NULL/dup/boundary dataset) surfaced a
class of bugs the clean driver fixtures cannot: NULL keys silently
dropped by equi-joins, ``last(ignorenulls)`` conflating "no row yet"
with "row with NULL attribute", ANSI divide-by-zero aborting scans
DuckDB survives with NULL, and Spark's decimal→double cast double-
rounding past 2⁵³ unscaled. Each fix gets a minimal unit pin here so a
regression fails fast without regenerating the hostile dataset.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def test_balanced_partition_keeps_null_units(spark):
    # r10: _striped_global_rank's offsets join must be null-safe — a
    # NULL unit is one ordinary group, not a dropped row
    from etl_procesos_odo_spark.operators.partitioner import balanced_partition

    rows = [(None, i) for i in range(7)] + [("a", i) for i in range(5)]
    df = spark.createDataFrame(rows, "unit string, key long")
    out = balanced_partition(df, "unit", "key", 3, seed=42)
    got = {(r["unit"], r["particion"]) for r in out.collect()}
    n_null = out.filter(F.col("unit").isNull()).count()
    assert n_null == 7, got
    # balance invariant holds inside the NULL unit too: 7 = 3+2+2
    sizes = sorted(
        r["n"] for r in out.filter(F.col("unit").isNull())
        .groupBy("particion").agg(F.count("*").alias("n")).collect()
    )
    assert sizes == [2, 2, 3]


def test_asof_join_carries_null_right_attribute(spark):
    # r10: the latest right row WINS even when its attached value is
    # NULL — per-column last(ignorenulls) used to bleed the previous
    # row's value over it
    from etl_procesos_odo_spark.operators.joins import asof_join

    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, None)], "k long, t long, v double"
    )
    left = spark.createDataFrame([(101, 1, 25)], "eid long, k long, t long")
    row = asof_join(left, right, "k", "t", "t", {"v": "last_v", "t": "last_t"}).collect()[0]
    assert row["last_t"] == 20        # the t=20 row is the as-of match...
    assert row["last_v"] is None      # ...and its NULL value is carried


def test_quality_metrics_null_on_degenerate_docs(spark):
    # r10: empty / whitespace-only / NULL documents yield NULL ratios
    # (DuckDB x/0 semantics), never an ANSI divide-by-zero abort
    from etl_procesos_odo_spark.llm.text_analysis import quality_metrics

    df = spark.createDataFrame(
        [(0, "two words"), (1, ""), (2, "   "), (3, None)],
        "doc_id long, text string",
    )
    qm = quality_metrics(F.col("text"))
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", *[v.alias(k) for k, v in qm.items()]
    ).collect()}
    assert out[0]["stopword_ratio"] is not None
    for d in (1, 2):
        assert out[d]["n_tokens"] == 0
        assert out[d]["avg_token_len"] is None
        assert out[d]["stopword_ratio"] is None
    assert out[1]["punct_ratio"] is None          # zero chars
    assert out[3]["avg_token_len"] is None        # NULL text


def test_cosine_null_for_zero_norm_vectors(spark):
    from etl_procesos_odo_spark.llm.similarity import cosine

    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 0.0]), ([1.0, 0.0], [0.5, 0.0])],
        "a array<double>, b array<double>",
    )
    got = [r[0] for r in df.select(cosine(F.col("a"), F.col("b"))).collect()]
    assert got[0] is None and got[1] == 1.0


def test_decimal_sum_string_bridge_matches_duckdb_past_2_53(spark):
    # r10 sf1 census finding: DUCKDB's decimal->double cast double-rounds
    # (unscaled int -> double, then /10^scale) once the unscaled value
    # exceeds 2^53 — CAST(DECIMAL '145359666700.110000' AS DOUBLE) comes
    # back as ...11002, ~2e-5 off. The string bridge (decimal -> exact
    # digit string -> ONE correctly-rounded parse) is magnitude-proof in
    # BOTH engines, so big decimal-exact totals cross to double through
    # it. 145359666700.110000 is the actual sf1 lineitem sum that
    # diverged in the census.
    val = "145359666700.110000"
    py = repr(float(val))  # correctly-rounded reference
    df = spark.createDataFrame([(val,)], "s string").select(
        F.col("s").cast("decimal(25,6)").alias("d")
    )
    bridged = df.select(
        F.col("d").cast("string").cast("double").alias("x")
    ).collect()[0]["x"]
    assert repr(bridged) == py
    duck_bridge = duckdb.sql(
        f"SELECT CAST(CAST(CAST('{val}' AS DECIMAL(25,6)) AS VARCHAR) "
        "AS DOUBLE)"
    ).fetchone()[0]
    assert repr(duck_bridge) == py
    # pin WHY the oracle needs the bridge: DuckDB's direct cast is the
    # one that double-rounds — if DuckDB ever fixes it, this starts
    # failing and the bridge becomes removable
    duck_direct = duckdb.sql(
        f"SELECT CAST(CAST('{val}' AS DECIMAL(25,6)) AS DOUBLE)"
    ).fetchone()[0]
    assert repr(duck_direct) != py


def test_multimodal_transform_null_payload(spark):
    from etl_procesos_odo_spark.llm.multimodal import (
        attach_payload,
        transform_media,
    )

    docs = spark.createDataFrame(
        [(0, "some text"), (1, None)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in transform_media(
            attach_payload(docs, "text", "doc_id"), 16, 16, 3
        ).collect()
    }
    assert out[0]["n_bytes_out"] == 9 and out[0]["n_frames"] is not None
    assert out[1]["n_bytes_out"] is None
    assert out[1]["n_frames"] is None and out[1]["sampled"] is None


def test_dedup_clusters_idempotent_on_duplicate_rows(spark):
    # r10: duplicate primary-key redeliveries must not duplicate the
    # (doc_id, cluster_id) labeling
    from etl_procesos_odo_spark.llm.dedup import (
        dedup_clusters,
        dedup_clusters_bigstar,
    )

    text = " ".join(f"w{i}" for i in range(12))
    rows = [(0, text), (1, text), (1, text), (2, "x y z a b c d e f g h i")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for fn in (dedup_clusters, dedup_clusters_bigstar):
        out = fn(df, "text", "doc_id", k=3, num_hashes=12, bands=4,
                 threshold=0.5)
        rows_out = out.collect()
        assert len(rows_out) == 3, fn.__name__
        lab = {r["doc_id"]: r["cluster_id"] for r in rows_out}
        assert lab[0] == lab[1] == 0  # exact dups cluster, min-id root


def test_datagen_schema_parity_and_determinism(tmp_path):
    # the generated star schema must be arrow-schema-identical to the
    # driver fixtures (so Spark infers the same types), and two runs of
    # the same seed must be byte-identical
    import pyarrow.parquet as pq

    import datagen

    d1 = str(tmp_path / "a")
    d2 = str(tmp_path / "b")
    datagen.generate(d1, 0.001)
    datagen.generate(d2, 0.001)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        ref = [(f.name, f.type)
               for f in pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")]
        gen = [(f.name, f.type) for f in pq.read_schema(f"{d1}/{t}.parquet")]
        assert ref == gen, t
        b1 = open(f"{d1}/{t}.parquet", "rb").read()
        b2 = open(f"{d2}/{t}.parquet", "rb").read()
        assert b1 == b2, f"{t} not deterministic"


def test_datagen_adversarial_injections(tmp_path):
    # the hostile variant must actually contain the hostile shapes the
    # census claims to exercise
    import duckdb as ddb

    import datagen

    d = str(tmp_path / "adv")
    datagen.generate(d, 0.001, adversarial=True)
    con = ddb.connect()
    one = lambda q: con.sql(q).fetchone()[0]  # noqa: E731
    assert one(f"SELECT count(*) FROM '{d}/events.parquet' "
               "WHERE event_type IS NULL") > 0
    assert one(f"SELECT count(*) FROM (SELECT c_custkey FROM "
               f"'{d}/customer.parquet' GROUP BY 1 HAVING count(*) > 1)") > 0
    assert one(f"SELECT count(*) FROM '{d}/documents.parquet' "
               "WHERE text = ''") > 0
    assert one(f"SELECT count(*) FROM '{d}/documents.parquet' "
               "WHERE text IS NULL") > 0
    assert one(f"SELECT count(*) FROM '{d}/embeddings.parquet' WHERE "
               "list_sum(list_transform(embedding, x -> x*x)) = 0") > 0
    assert one(f"SELECT count(*) FROM '{d}/events.parquet' "
               "WHERE ts = TIMESTAMP '1970-01-01 00:00:00'") > 0
    assert one(f"SELECT count(*) FROM (SELECT user_id, ts FROM "
               f"'{d}/events.parquet' WHERE user_id IS NOT NULL "
               "GROUP BY 1, 2 HAVING count(*) > 1)") > 0


def test_repetition_metrics_null_vs_empty_three_way(spark):
    # r10 contained-tier adversarial census: NULL text yields NULL for
    # ALL THREE dup fractions (no repetition signal — must not pass a
    # `dup_frac < x` quality gate as "not repetitive"), empty text
    # yields 0.0, real text a value. The k>=2 gram builders go through
    # greatest(size-k+1, 0), which IGNORES the NULL, so the pin covers
    # every k, not just words.
    from etl_procesos_odo_spark.llm.text_analysis import repetition_metrics

    df = spark.createDataFrame(
        [(0, "a a b"), (1, ""), (2, None)], "doc_id long, text string"
    )
    m = repetition_metrics(F.col("text"))
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", *[v.alias(k) for k, v in m.items()]
    ).collect()}
    assert out[0]["dup_word_frac"] == pytest.approx(1.0 - 2.0 / 3.0)
    for k in ("dup_word_frac", "dup_2gram_frac", "dup_3gram_frac"):
        assert out[1][k] == 0.0, k
        assert out[2][k] is None, k


def test_extract_features_null_payload_and_multibyte_first_char(spark):
    # r10: a NULL payload yields a NULL-metadata row (never a Python
    # worker crash), and "width" derives from the first CHARACTER's
    # codepoint — matching the oracle's ascii(substr(text,1,1)) even
    # when the doc leads with a multibyte char (first-BYTE semantics
    # would give 0xE5=229 for '北' instead of codepoint 21271)
    from etl_procesos_odo_spark.llm.multimodal import (
        attach_payload,
        extract_features,
    )

    docs = spark.createDataFrame(
        [(0, "abc"), (1, None), (2, "北京 text"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in extract_features(
        attach_payload(docs, "text", "doc_id")
    ).collect()}
    assert out[0]["width"] == 16 + ord("a") % 64
    assert out[1]["n_bytes"] is None and out[1]["width"] is None
    assert out[2]["width"] == 16 + ord("北") % 64
    assert out[3]["width"] == 16 and out[3]["n_frames"] == 1


def test_composite_message_key_keeps_empty_segment_for_null(spark):
    # r10: fixed arity — a NULL field becomes an EMPTY segment so
    # 'a||c' stays distinct from a two-field key 'a|c' (bare concat_ws
    # would silently drop the segment)
    from etl_procesos_odo_spark.functions.text_fns import composite_message_key

    df = spark.createDataFrame(
        [("a", None, "c"), ("a", "c", None)], "x string, y string, z string"
    )
    got = [r[0] for r in df.select(
        composite_message_key([F.col("x"), F.col("y"), F.col("z")])
    ).collect()]
    assert got == ["a||c", "a|c|"]


def test_semantic_dedup_zero_norm_vector_and_dup_ids(spark):
    # r10: a zero-norm (all-zero) vector gets cs=NULL via try_divide
    # (never an ANSI divide-by-zero abort) and is always "kept"; with
    # distinct ingestion a duplicate-row redelivery yields ONE verdict
    # row per vec_id
    from etl_procesos_odo_spark.llm.similarity import semantic_dedup

    rows = [
        (0, [1.0, 0.0]), (1, [1.0, 0.001]),
        (2, [0.0, 0.0]),                     # zero-norm
        (0, [1.0, 0.0]),                     # exact dup redelivery
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).distinct()
    out = semantic_dedup(emb, "vec_id", "embedding", n_cells=1, threshold=0.9)
    got = {r["vec_id"]: r for r in out.collect()}
    assert len(got) == 3 and out.count() == 3
    assert got[2]["status"] == "kept" and got[2]["max_cos"] is None
    # 0 and 1 are near-identical: the higher id is pruned toward the lower
    assert got[1]["status"] == "pruned" and got[1]["dup_of"] == 0
    assert got[0]["status"] == "kept"


def test_ewma_hot_key_python_oracle(spark):
    """Hot-key EWMA pin (round 11): the q97 SQL oracle is a recursive
    CTE stepping rn -> rn+1, so its iteration count is max-events-per-
    key — computationally infeasible against a skewed key (the sf1-skew
    census's hot user holds 200k events; measured: the recursion never
    finishes). The OPERATOR is one linear pass per key, so the hot-key
    case is verified here against an independent driver-side numpy
    recurrence instead: one user with 50k events plus two normal users,
    exact float equality (both sides run the identical IEEE +*/ chain
    in the same order)."""
    import numpy as np

    from etl_procesos_odo_spark.operators.windows import ewma_time_decay

    rng = np.random.default_rng(7)
    n_hot, tau = 50_000, 600.0
    # irregular gaps exercise the data-dependent gain; two cold users
    # make sure the hot key shares the frame with normal groups
    t_hot = np.cumsum(rng.integers(1, 900, size=n_hot)).astype("float64")
    rows = [(0, int(i), float(t), float(v)) for i, (t, v) in enumerate(
        zip(t_hot, rng.uniform(0, 100, size=n_hot)))]
    rows += [(1, 100_000, 50.0, 10.0), (1, 100_001, 700.0, 20.0),
             (2, 200_000, 5.0, 3.0)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, tsec double, value double"
    ).select(
        "user_id", "event_id", "value",
        F.timestamp_micros((F.col("tsec") * 1_000_000).cast("long")).alias("ts"),
    )
    out = {
        (r["user_id"], r["event_id"]): r["ewma"]
        for r in ewma_time_decay(df).collect()
    }

    def py_ewma(ts, vs):
        acc, prev, res = None, None, []
        for t, x in zip(ts, vs):
            if acc is None:
                acc = float(x)
            else:
                dt = t - prev
                a = dt / (dt + tau)
                acc = a * float(x) + (1.0 - a) * acc
            prev = t
            res.append(acc)
        return res

    exp_hot = py_ewma(t_hot, [r[3] for r in rows[:n_hot]])
    assert len(out) == n_hot + 3
    # exact equality: same IEEE ops in the same order on both sides
    assert all(out[(0, i)] == exp_hot[i] for i in range(n_hot))
    assert out[(1, 100_001)] == py_ewma(
        [50.0, 700.0], [10.0, 20.0])[1]
    assert out[(2, 200_000)] == 3.0
