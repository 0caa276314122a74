"""Empty/degenerate-input behavior of the core operators: a 100 TB
pipeline hits empty partitions, empty filter results, and single-row
groups constantly — operators must return empty/identity frames with the
right schema, not throw.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_procesos_odo_spark.llm.dedup import (
    dedup_clusters,
    exact_dedup,
    minhash_lsh_pairs,
    simhash60,
)
from etl_procesos_odo_spark.llm.similarity import cosine_topk, ivf_topk
from etl_procesos_odo_spark.operators.aggregates import pareto
from etl_procesos_odo_spark.operators.windows import dedup_first


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_dedup_ops_on_empty_input(spark):
    e = _empty_docs(spark)
    assert exact_dedup(e, "text", "doc_id").count() == 0
    assert minhash_lsh_pairs(e, "text", "doc_id").count() == 0
    assert simhash60(e, "text", "doc_id").count() == 0


def test_cluster_no_pairs_is_identity(spark):
    # all-distinct docs: no edges, every doc is its own singleton cluster
    df = spark.createDataFrame(
        [(i, f"totally unique document number {i} " + " ".join(
            f"tok{i}_{j}" for j in range(10))) for i in range(5)],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["cluster_id"] for r in
           dedup_clusters(df, "text", "doc_id").collect()}
    assert got == {i: i for i in range(5)}


def test_ann_empty_queries(spark):
    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0]) for i in range(20)], ["vec_id", "embedding"]
    )
    none = corpus.filter(F.col("vec_id") < 0)
    assert cosine_topk(corpus, none, k=3).count() == 0
    assert ivf_topk(corpus, none, n_cells=4, k=3).count() == 0


def test_single_doc_degenerate(spark):
    one = spark.createDataFrame(
        [(7, "a b c d e f g h i j")], ["doc_id", "text"]
    )
    assert minhash_lsh_pairs(one, "text", "doc_id").count() == 0  # no pair
    got = dedup_clusters(one, "text", "doc_id").collect()
    assert len(got) == 1 and got[0]["cluster_id"] == 7


def test_dedup_first_single_rows_kept(spark):
    df = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 2)], ["id", "k", "o"]
    )
    assert dedup_first(df, ["k"], [F.col("o")]).count() == 2


def test_pareto_fewer_groups_than_topn(spark):
    df = spark.createDataFrame([("x", 5), ("y", 3)], ["cat", "n"])
    measure = F.sum(F.col("n").cast("decimal(25,6)"))
    out = pareto(df, "cat", measure, top_n=10).collect()
    # no OTROS bucket needed; cumulative pct ends at 100
    assert {r["cat"] for r in out} == {"x", "y"}
    assert abs(max(r["pct_acumulado"] for r in out) - 100.0) < 1e-9


def test_approx_count_distinct_tolerance(spark):
    """A3's scale swap: HLL estimate within 5% of exact on real data."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = docs.select(F.countDistinct("doc_id")).first()[0]
    approx = docs.select(
        F.approx_count_distinct("doc_id", rsd=0.02)
    ).first()[0]
    assert abs(approx - exact) / exact < 0.05


def test_block_dedup_properties(spark):
    """Structural invariants: kept-block multiset is duplicate-free
    globally, every surviving token sequence is a subsequence of the
    original, and counts reconcile."""
    from pyspark.sql import functions as F

    from etl_procesos_odo_spark.llm.dedup import block_dedup
    from etl_procesos_odo_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(80)
    out = block_dedup(docs, "text", "doc_id", block_words=8)
    rows = out.collect()
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    seen_blocks = set()
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        assert 0 <= r["n_kept"] <= r["n_blocks"]
        if r["text_dedup"] is None:
            continue
        toks = r["text_dedup"].split()
        # surviving text is drawn from the original document's tokens
        assert set(toks) <= set(orig[r["doc_id"]].split())
    # global: re-running block extraction over deduped texts yields no
    # block that appears twice anywhere (keep-first is global)
    dd = out.filter(F.col("text_dedup").isNotNull()).select(
        F.col("doc_id"), F.col("text_dedup").alias("text")
    )
    again = block_dedup(dd, "text", "doc_id", block_words=8)
    tot = again.agg(
        F.sum("n_blocks").alias("b"), F.sum("n_kept").alias("k")
    ).collect()[0]
    assert tot["b"] == tot["k"]  # nothing left to dedup


def test_ewma_bounds_and_first_value(spark):
    """EWMA is a convex combination: it stays inside [min, max] of the
    values seen so far, and the first event's ewma equals its value."""
    from pyspark.sql import functions as F

    from etl_procesos_odo_spark.operators.windows import ewma_time_decay
    from etl_procesos_odo_spark.session import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = ewma_time_decay(ev, "user_id", "ts", "event_id", "value")
    j = out.join(ev.select("event_id", "user_id", "ts", "value"),
                 on=["user_id", "event_id"])
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    checked = j.select(
        "ewma",
        F.min("value").over(w).alias("lo"),
        F.max("value").over(w).alias("hi"),
        F.row_number().over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("rn"),
        "value",
    )
    bad = checked.filter(
        (F.col("ewma") < F.col("lo") - 1e-9)
        | (F.col("ewma") > F.col("hi") + 1e-9)
    ).count()
    assert bad == 0
    firsts = checked.filter(F.col("rn") == 1).filter(
        F.abs(F.col("ewma") - F.col("value")) > 0
    ).count()
    assert firsts == 0


def test_ewma_non_long_key_types(spark):
    """The applyInPandas output schema is derived from the input frame, so
    a string key and an int32 tiebreak survive the Arrow boundary with
    their types intact (round-2 advice: the schema was hard-coded long)."""
    from pyspark.sql import functions as F

    from etl_procesos_odo_spark.operators.windows import ewma_time_decay
    from etl_procesos_odo_spark.session import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        F.concat(F.lit("u"), F.col("user_id")).alias("user_key"),
        "ts",
        F.col("event_id").cast("int").alias("seq"),
        "value",
    )
    out = ewma_time_decay(ev, "user_key", "ts", "seq", "value")
    assert dict(out.dtypes) == {"user_key": "string", "seq": "int", "ewma": "double"}
    assert out.filter(F.col("ewma").isNull()).count() == 0
    assert out.count() == ev.count()


def test_verify_all_isolate_runner_smoke(tmp_path):
    """CI-style smoke of the canonical correctness invocation
    (``verify_all.py --isolate``, README): run two registry queries in an
    isolated subprocess batch at sf0.001 and check the artifact records
    ok rows. Guards the crash-mitigation path the round harness depends
    on (round-1 postmortem: a JVM segfault emptied CORRECTNESS_r01)."""
    import json
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "smoke.json"
    proc = subprocess.run(
        [
            sys.executable, os.path.join(root, "verify_all.py"),
            "--isolate", "2", "--sf", "/root/testdata/sf0.001",
            "--out", str(out), "--only",
            "q02_filter_project,q30_dedup_exact",
        ],
        capture_output=True, text=True, timeout=600, cwd=root,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    res = json.loads(out.read_text())
    assert set(res) == {"q02_filter_project", "q30_dedup_exact"}
    assert all(r["ok"] for r in res.values())


def test_round5_operator_input_guards(spark):
    """Edge-input guards on the round-5 general operators: invalid
    parameters raise instead of silently voiding documented guarantees
    (the r4-ADVICE hardening pattern, applied proactively)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from etl_procesos_odo_spark.llm.dedup import band_min_k, pagerank_rounds
    from etl_procesos_odo_spark.operators.aggregates import profile_columns
    from etl_procesos_odo_spark.operators.layout import normalize_to_bits

    banded = spark.createDataFrame(
        [(1, 0, "h")], "_id long, band_idx int, band_hash string"
    )
    with _pytest.raises(ValueError, match="cap"):
        band_min_k(banded, 0)

    empty_edges = spark.createDataFrame([], "src long, dst long")
    out = pagerank_rounds(empty_edges, rounds=1)
    assert out.collect() == [] and set(out.columns) == {"node", "rank"}

    df = spark.createDataFrame([(1,)], "x long")
    with _pytest.raises(ValueError, match="cols"):
        profile_columns(df, [])

    with _pytest.raises(ValueError, match="bits"):
        normalize_to_bits(F.col("x"), 0.0, 1.0, 0)
    with _pytest.raises(ValueError, match="hi > lo"):
        normalize_to_bits(F.col("x"), 1.0, 1.0, 8)


def test_lsh_bands_divisibility_guard(spark):
    """lsh_bands must reject num_hashes not divisible by bands — the
    remainder hashes would silently drop, weakening the banding
    guarantee (candidate recall) without any visible failure."""
    import pytest as _pytest

    from etl_procesos_odo_spark.llm.dedup import lsh_bands

    df = spark.createDataFrame([(1, 10, 20, 30)], "_id long, mh0 long, mh1 long, mh2 long")
    with _pytest.raises(ValueError, match="divide evenly"):
        lsh_bands(df, "_id", num_hashes=3, bands=2)
    # the valid case still works
    out = lsh_bands(df, "_id", num_hashes=3, bands=3)
    assert out.count() == 3


def test_coalesce_islands_crafted(spark):
    """Gaps-and-islands: consecutive runs merge, gaps split, per-group
    independence, singleton islands survive."""
    from etl_procesos_odo_spark.operators.windows import coalesce_islands

    rows = [("a", 1), ("a", 2), ("a", 3), ("a", 7), ("a", 9), ("a", 10),
            ("b", 2), ("b", 4)]
    df = spark.createDataFrame(rows, "g string, s long").repartition(4)
    got = sorted(
        map(tuple, coalesce_islands(df, ["g"], "s").collect())
    )
    assert got == [
        ("a", 1, 3, 3), ("a", 7, 7, 1), ("a", 9, 10, 2),
        ("b", 2, 2, 1), ("b", 4, 4, 1),
    ]


def test_interval_overlap_join_semantics(spark):
    """Binned overlap join: positive-overlap pairs only (touching
    boundaries excluded), each pair exactly once even when it shares
    MANY buckets, exact integer overlap length."""
    from etl_procesos_odo_spark.operators.joins import interval_overlap_join

    W = 10  # tiny bin width so multi-bucket spans exercise the distinct
    left = spark.createDataFrame(
        [("s1", 5, 25),    # overlaps i1 [0,20) by 15 and i2 [20,30) by 5
         ("s2", 30, 40),   # touches i2's end exactly -> no overlap with i2
         ("s3", 95, 105)], # overlaps nothing
        "sid string, start_us long, end_us long",
    )
    right = spark.createDataFrame(
        [("i1", 0, 20), ("i2", 20, 30), ("i3", 40, 60)],
        "iid string, r_start_us long, r_end_us long",
    )
    got = {
        (r["sid"], r["iid"]): r["overlap_us"]
        for r in interval_overlap_join(
            left, right, ["sid"], ["iid"], bin_us=W
        ).collect()
    }
    # s2 [30,40] vs i3 [40,60): touching -> excluded; vs i2 [20,30): 0 -> excluded
    assert got == {("s1", "i1"): 15, ("s1", "i2"): 5}


def test_interval_overlap_join_long_interval_coarsening(spark):
    """max_span_bins bounds the per-interval explode for long intervals
    by coarsening the shared bucket grid; results stay identical to the
    fine-binned plan (coarsening only widens the grid — recall is still
    exact and the overlap predicate discards the extra candidates)."""
    from etl_procesos_odo_spark.operators.joins import (
        _coarsened_bin_us,
        interval_overlap_join,
    )

    W = 10
    # one multi-"week" interval (span 1000 = 100 fine bins) among short ones
    left = spark.createDataFrame(
        [("s1", 5, 1005), ("s2", 30, 40), ("s3", 2000, 2010)],
        "sid string, start_us long, end_us long",
    )
    right = spark.createDataFrame(
        [("i1", 0, 20), ("i2", 990, 1100), ("i3", 2005, 2030)],
        "iid string, r_start_us long, r_end_us long",
    )
    # span 1000 over bin 10 with cap 4 -> factor ceil(1000/40)=25 -> 250
    assert _coarsened_bin_us(
        left, right, ("start_us", "end_us"),
        ("r_start_us", "r_end_us"), W, 4,
    ) == 250
    # all spans already fit -> bin unchanged
    assert _coarsened_bin_us(
        left.filter("sid = 's2'"), right.filter("iid = 'i1'"),
        ("start_us", "end_us"), ("r_start_us", "r_end_us"), W, 4,
    ) == W

    def run(**kw):
        return sorted(
            (r["sid"], r["iid"], r["overlap_us"])
            for r in interval_overlap_join(
                left, right, ["sid"], ["iid"], bin_us=W, **kw
            ).collect()
        )

    fine = run()
    assert fine == [("s1", "i1", 15), ("s1", "i2", 15), ("s3", "i3", 5)]
    assert run(max_span_bins=4) == fine
    assert run(max_span_bins=1) == fine


def test_sorted_neighborhood_adaptive_stripe(spark):
    """A corpus whose keys all share the default 15-char prefix
    degenerates to ONE stripe at a fixed prefix; the adaptive ladder
    extends the prefix until stripes balance, and the pair set is
    unchanged (ordering by (prefix, full, id) == ordering by (full, id)
    at every prefix length)."""
    from etl_procesos_odo_spark.operators.joins import (
        _adaptive_stripe_len,
        sorted_neighborhood_pairs,
    )

    shared = "ACME-CORPORATION"  # 16 chars > default stripe_prefix=15
    rows = [(f"id{i:03d}", f"{shared}-{i % 8}-{i:03d}") for i in range(64)]
    df = spark.createDataFrame(rows, "rid string, name string")

    assert _adaptive_stripe_len(df, "name", (15, 18, 30), 8) == 18
    # all-identical keys: no prefix splits them -> longest candidate
    same = spark.createDataFrame(
        [(f"id{i}", "XX") for i in range(16)], "rid string, name string"
    )
    assert _adaptive_stripe_len(same, "name", (15, 30), 8) == 30

    def pairs(sp):
        out = sorted_neighborhood_pairs(
            df, "name", "rid", window=2, stripe_prefix=sp
        )
        return sorted(map(tuple, out.collect()))

    fixed = pairs(60)  # fully-discriminating prefix as the reference
    assert pairs((15, 18, 30)) == fixed
    assert len(fixed) == 63 + 62  # n-1 gap-1 pairs + n-2 gap-2 pairs
    # and the adaptive choice genuinely restores parallelism: >1 stripe
    from pyspark.sql import functions as F

    n_stripes = (
        df.select(F.substring("name", 1, 18).alias("s"))
        .distinct()
        .count()
    )
    assert n_stripes == 8


def test_incremental_rollup_merge_cases(spark):
    """The full-outer partial merge must handle state-only days,
    delta-only days, and overlap (late-data) days identically to a
    direct recompute over all raw rows."""
    from etl_procesos_odo_spark.queries_enrich import (
        q172_incremental_rollup,  # noqa: F401 — import proves registration
    )
    from pyspark.sql import functions as F

    rows = [
        # day 1: state-only
        (1, "a", "2024-01-01 10:00:00", 1.5),
        # day 17: both state rows and a late row (id % 37 == 0)
        (2, "a", "2024-01-17 09:00:00", 2.25),
        (37, "a", "2024-01-17 23:00:00", 4.0),
        # day 25: delta-only
        (3, "b", "2024-01-25 01:00:00", 8.125),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts_s string, value double"
    ).selectExpr(
        "event_id", "event_type",
        "cast(ts_s as timestamp) as ts", "value",
        "cast(date_trunc('day', cast(ts_s as timestamp)) as date) as day",
    )
    late = (
        "(event_id % 37 = 0 and day between date'2024-01-15' "
        "and date'2024-01-20')"
    )
    initial = ev.filter(f"day <= date'2024-01-20' and not {late}")
    delta = ev.filter(f"day > date'2024-01-20' or {late}")
    assert initial.count() + delta.count() == len(rows)
    assert delta.filter("event_id = 37").count() == 1  # late row in delta

    def partials(df):
        return df.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("decimal(25,6)").alias("vsum"),
            F.min("ts").alias("mn"), F.max("ts").alias("mx"),
        )

    merged = (
        partials(initial).selectExpr(
            "day", "event_type", "cnt as c1", "vsum as s1",
            "mn as mn1", "mx as mx1")
        .join(
            partials(delta).selectExpr(
                "day", "event_type", "cnt as c2", "vsum as s2",
                "mn as mn2", "mx as mx2"),
            ["day", "event_type"], "full_outer")
        .selectExpr(
            "day", "event_type",
            "coalesce(c1, 0) + coalesce(c2, 0) as cnt",
            "cast(coalesce(s1, cast(0 as decimal(25,6))) "
            "+ coalesce(s2, cast(0 as decimal(25,6))) "
            "as decimal(25,6)) as vsum",
            "least(coalesce(mn1, mn2), coalesce(mn2, mn1)) as mn",
            "greatest(coalesce(mx1, mx2), coalesce(mx2, mx1)) as mx")
    )
    direct = partials(ev)
    key = lambda r: (str(r["day"]), r["event_type"])  # noqa: E731
    got = {key(r): (r["cnt"], r["vsum"], r["mn"], r["mx"])
           for r in merged.collect()}
    want = {key(r): (r["cnt"], r["vsum"], r["mn"], r["mx"])
            for r in direct.collect()}
    assert got == want and len(got) == 3


def test_histogram_quantile_bound_and_merge(spark):
    """Sketch estimate is the bin lower bound: est_lo <= exact <
    est_lo + width; and bin tables of disjoint shards merge by count
    addition to the full table's bins."""
    import random

    from pyspark.sql import functions as F

    rnd = random.Random(13)
    vals = [rnd.randrange(0, 4000) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "n long")
    W = 16
    bins = df.selectExpr(f"n div {W} as bin").groupBy("bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    # merge property
    half = len(vals) // 2
    b1 = spark.createDataFrame(
        [(v,) for v in vals[:half]], "n long"
    ).selectExpr(f"n div {W} as bin").groupBy("bin").agg(
        F.count(F.lit(1)).alias("c"))
    b2 = spark.createDataFrame(
        [(v,) for v in vals[half:]], "n long"
    ).selectExpr(f"n div {W} as bin").groupBy("bin").agg(
        F.count(F.lit(1)).alias("c"))
    merged = {r["bin"]: r["c"] for r in b1.unionByName(b2)
              .groupBy("bin").agg(F.sum("c").alias("c")).collect()}
    full = {r["bin"]: r["c"] for r in bins.collect()}
    assert merged == full
    # bound property at several quantiles
    svals = sorted(vals)
    cum, bounds = 0, {}
    for b, c in sorted(full.items()):
        cum += c
        bounds[b] = cum
    for num, den in ((1, 2), (9, 10), (99, 100)):
        r = (num * len(vals) + den - 1) // den
        exact = svals[r - 1]
        est_lo = min(b for b, cu in bounds.items() if cu >= r) * W
        assert est_lo <= exact < est_lo + W


def test_frequent_itemsets_bruteforce(spark):
    """q176's A-priori pipeline must equal a brute-force itertools
    enumeration of frequent pairs/triples at sf0.001 — an oracle
    independent of the SQL side's shared A-priori structure."""
    from collections import Counter
    from itertools import combinations

    from etl_procesos_odo_spark.queries_enrich import q176_frequent_itemsets
    from tests.conftest import SF_DIR

    out = {
        (r["level"], r["itemset"]): r["support"]
        for r in q176_frequent_itemsets(spark, SF_DIR).collect()
    }

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    pt = spark.read.parquet(f"{SF_DIR}/part.parquet")
    rows = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .select("l_orderkey", "p_brand")
        .distinct()
        .collect()
    )
    baskets = {}
    for r in rows:
        baskets.setdefault(r["l_orderkey"], set()).add(r["p_brand"])
    minsup = -(-3 * len(baskets) // 1000)  # ceil(0.3% of baskets)
    c2, c3 = Counter(), Counter()
    for items in baskets.values():
        s = sorted(items)
        c2.update(combinations(s, 2))
        c3.update(combinations(s, 3))
    want = {
        (2, "|".join(k)): v for k, v in c2.items() if v >= minsup
    } | {(3, "|".join(k)): v for k, v in c3.items() if v >= minsup}
    assert out == want


def test_association_rules_bruteforce(spark):
    """q177's rules must equal brute-force counting: confidence and
    lift recomputed as single divisions of exact Python-int counts
    (the same one-rounded-op the engines perform)."""
    from collections import Counter
    from itertools import combinations

    from etl_procesos_odo_spark.queries_enrich import q177_association_rules
    from tests.conftest import SF_DIR

    out = {
        (r["ante"], r["cons"]): (r["support"], r["confidence"], r["lift"])
        for r in q177_association_rules(spark, SF_DIR).collect()
    }

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    pt = spark.read.parquet(f"{SF_DIR}/part.parquet")
    rows = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .select("l_orderkey", "p_brand")
        .distinct()
        .collect()
    )
    baskets = {}
    for r in rows:
        baskets.setdefault(r["l_orderkey"], set()).add(r["p_brand"])
    n = len(baskets)
    minsup = -(-3 * n // 1000)
    c1, c2 = Counter(), Counter()
    for items in baskets.values():
        c1.update(items)
        c2.update(combinations(sorted(items), 2))
    s1 = {k: v for k, v in c1.items() if v >= minsup}
    want = {}
    for (x, y), sup in c2.items():
        if sup < minsup:
            continue
        for a, c in ((x, y), (y, x)):
            if 5 * sup >= s1[a]:
                want[(a, c)] = (sup, sup / s1[a], n * sup / (s1[a] * s1[c]))
    assert out == want


def test_sequential_patterns_bruteforce(spark):
    """q178's order-statistics collapse must equal the direct GSP
    definition — exists events with strictly increasing timestamps
    matching the pattern — enumerated per user at sf0.001."""
    from collections import Counter

    from etl_procesos_odo_spark.queries_enrich import q178_sequential_patterns
    from tests.conftest import SF_DIR

    out = {
        (r["level"], r["pattern"]): r["support"]
        for r in q178_sequential_patterns(spark, SF_DIR).collect()
    }

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", "event_type", "ts"
    )
    users = {}
    for r in ev.collect():
        users.setdefault(r["user_id"], []).append((r["ts"], r["event_type"]))
    c2, c3 = Counter(), Counter()
    for hist in users.values():
        hist.sort(key=lambda e: e[0])
        pairs, triples = set(), set()
        for i, (ts_m, t_m) in enumerate(hist):
            before = {t for ts, t in hist[:i] if ts < ts_m}
            after = {t for ts, t in hist[i + 1 :] if ts > ts_m}
            pairs.update((a, t_m) for a in before)
            triples.update((a, t_m, c) for a in before for c in after)
        c2.update(pairs)
        c3.update(triples)
    minsup = -(-5 * len(users) // 100)
    want = {
        (2, ">".join(k)): v for k, v in c2.items() if v >= minsup
    } | {(3, ">".join(k)): v for k, v in c3.items() if v >= minsup}
    assert out == want


def test_embargo_split_boundaries(spark):
    """q179: the three splits partition the corpus exactly, the
    train/test gap is at least the 24 h embargo, and every embargo
    row sits strictly inside (cutoff, emb_end) recomputed directly."""
    from etl_procesos_odo_spark.queries_enrich import q179_embargo_split
    from tests.conftest import SF_DIR

    rows = {r["split"]: r for r in q179_embargo_split(spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    us = [r[0] for r in ev.selectExpr("unix_micros(ts)").collect()]
    mn, mx = min(us), max(us)
    cutoff = mn + (8 * (mx - mn)) // 10
    emb_end = cutoff + 86_400_000_000

    assert sum(r["n_events"] for r in rows.values()) == len(us)
    assert rows["train"]["max_us"] < cutoff <= rows["test"]["min_us"]
    assert rows["test"]["min_us"] >= emb_end
    assert rows["test"]["min_us"] - rows["train"]["max_us"] >= 86_400_000_000
    if "embargo" in rows:
        assert cutoff <= rows["embargo"]["min_us"]
        assert rows["embargo"]["max_us"] < emb_end
        assert rows["embargo"]["n_events"] == sum(
            cutoff <= u < emb_end for u in us
        )


def test_robust_outliers_bruteforce(spark):
    """q181 vs direct Python order statistics: lower median, lower-MAD,
    and the 3*MAD outlier count, per event_type at sf0.001."""
    from etl_procesos_odo_spark.queries_enrich import q181_robust_outliers
    from tests.conftest import SF_DIR

    out = {
        r["event_type"]: (r["n"], r["med"], r["mad"], r["n_outliers"])
        for r in q181_robust_outliers(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", "value"
    )
    groups = {}
    for r in ev.collect():
        if r["value"] is not None:
            groups.setdefault(r["event_type"], []).append(r["value"])
    want = {}
    for t, xs in groups.items():
        n = len(xs)
        med = sorted(xs)[(n + 1) // 2 - 1]
        devs = [abs(x - med) for x in xs]
        mad = sorted(devs)[(n + 1) // 2 - 1]
        want[t] = (n, med, mad, sum(d > 3 * mad for d in devs))
    assert out == want


def test_selection_median_edges(spark, tmp_path):
    """q182's two-pass selection on crafted groups: all-equal values
    (zero-width bin guard), a group whose median sits on a bin
    boundary, and agreement with sorted lower medians throughout."""
    from etl_procesos_odo_spark.queries_enrich import q182_selection_median

    rows = (
        [("flat", 7.5) for _ in range(9)]
        + [("two", 1.0), ("two", 2.0)]
        + [("one", 42.0)]
        + [("spread", float(i)) for i in range(1, 101)]
        + [("heavy", 0.0)] * 50
        + [("heavy", 1e9)]
    )
    df = spark.createDataFrame(rows, "event_type string, value double")
    df = df.withColumn("ts", df.value.cast("timestamp"))
    path = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(path)

    out = {
        r["event_type"]: (r["n"], r["med"])
        for r in q182_selection_median(spark, str(tmp_path)).collect()
    }
    want = {}
    for t in {r[0] for r in rows}:
        xs = sorted(v for g, v in rows if g == t)
        want[t] = (len(xs), xs[(len(xs) + 1) // 2 - 1])
    assert out == want


def test_quantile_grid_selection_bruteforce(spark, tmp_path):
    """q185 vs sorted-order statistics on crafted groups covering tiny
    n (greatest(1, ...) path), duplicates, and a skewed group, for all
    five grid points."""
    from etl_procesos_odo_spark.queries_enrich import (
        q185_quantile_grid_selection,
    )

    rows = (
        [("tiny", 5.0), ("tiny", 3.0)]
        + [("dups", 1.0)] * 40 + [("dups", 2.0)] * 60
        + [("spread", float(i)) for i in range(1, 1001)]
        + [("skew", 0.0)] * 990 + [("skew", 1e6)] * 10
    )
    df = spark.createDataFrame(rows, "event_type string, value double")
    df = df.withColumn("ts", df.value.cast("timestamp"))
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    out = {
        (r["event_type"], r["q"]): (r["n"], r["val"])
        for r in q185_quantile_grid_selection(spark, str(tmp_path)).collect()
    }
    grid = [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4),
            ("p90", 9, 10), ("p99", 99, 100)]
    want = {}
    for t in {r[0] for r in rows}:
        xs = sorted(v for g, v in rows if g == t)
        n = len(xs)
        for q, num, den in grid:
            k = max(1, -(-num * n // den))
            want[(t, q)] = (n, xs[k - 1])
    assert out == want


def test_ks_drift_bruteforce(spark):
    """q186 vs direct pooled-CDF enumeration (tie-collapsed) at
    sf0.001, plus sanity: ks in [0, 1]."""
    from etl_procesos_odo_spark.queries_enrich import q186_ks_drift
    from tests.conftest import SF_DIR

    out = {
        r["event_type"]: (r["n_train"], r["n_test"], r["ks_num"], r["ks"])
        for r in q186_ks_drift(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").selectExpr(
        "event_type", "value", "unix_micros(ts) as us"
    )
    rows = [r for r in ev.collect() if r["value"] is not None]
    us = [r["us"] for r in ev.collect()]
    mn, mx = min(us), max(us)
    cutoff = mn + (8 * (mx - mn)) // 10
    emb_end = cutoff + 86_400_000_000
    groups = {}
    for r in rows:
        if r["us"] < cutoff:
            groups.setdefault(r["event_type"], ([], []))[0].append(r["value"])
        elif r["us"] >= emb_end:
            groups.setdefault(r["event_type"], ([], []))[1].append(r["value"])
    want = {}
    for t, (a, b) in groups.items():
        n1, n2 = len(a), len(b)
        ks_num = 0
        for x in sorted(set(a) | set(b)):  # CDF gap after each tie block
            c1 = sum(v <= x for v in a)
            c2 = sum(v <= x for v in b)
            ks_num = max(ks_num, abs(c1 * n2 - c2 * n1))
        want[t] = (n1, n2, ks_num, ks_num / (n1 * n2))
    assert out == want
    assert all(0.0 <= v[3] <= 1.0 for v in out.values())


def test_mixture_concentration_known_cases(spark, tmp_path):
    """q187 Gini/HHI on crafted distributions with known answers:
    perfectly equal mass (gini 0, hhi 1/n), fully concentrated (gini
    -> (n-1)/n, hhi ~ 1), plus a hand-checked mixed case."""
    rows = (
        [("eq", f"s{i}", "x" * 100) for i in range(4)]
        + [("conc", "big", "x" * 1000)]
        + [("conc", f"t{i}", "x") for i in range(3)]
        + [("mix", "a", "x" * 10), ("mix", "b", "x" * 30),
           ("mix", "c", "x" * 60)]
    )
    df = spark.createDataFrame(
        [(lang, src, txt, len(txt)) for lang, src, txt in rows],
        "lang string, source string, text string, n_chars long",
    ).withColumn("doc_id", F.monotonically_increasing_id())
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    from etl_procesos_odo_spark.queries_enrich import (
        q187_mixture_concentration,
    )

    out = {
        r["lang"]: (r["n_sources"], r["gini"], r["hhi"], r["top1_share"])
        for r in q187_mixture_concentration(spark, str(tmp_path)).collect()
    }
    assert out["eq"] == (4, 0.0, 0.25, 0.25)
    n, s, t = 4, 1003, 1 * 1 + 2 * 1 + 3 * 1 + 4 * 1000
    assert out["conc"] == (
        4,
        (2 * t - 5 * s) / (4 * s),
        (3 + 1000 ** 2) / s ** 2,
        1000 / s,
    )
    # mix: sorted masses 10,30,60 -> t = 10+60+180 = 250, s = 100
    assert out["mix"] == (
        3,
        (500 - 400) / 300,
        (100 + 900 + 3600) / 10000,
        0.6,
    )


def test_mass_median_length_bruteforce(spark):
    """q188 vs direct enumeration: smallest L with cumulative char
    mass of len<=L docs >= ceil(S/2), per lang at sf0.001."""
    from etl_procesos_odo_spark.queries_enrich import q188_mass_median_length
    from tests.conftest import SF_DIR

    out = {
        r["lang"]: (r["total_chars"], r["mass_median_len"])
        for r in q188_mass_median_length(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "lang", "n_chars"
    )
    groups = {}
    for r in docs.collect():
        groups.setdefault(r["lang"], []).append(r["n_chars"])
    want = {}
    for lang, lens in groups.items():
        s = sum(lens)
        cum, med = 0, None
        for ln in sorted(lens):
            cum += ln
            if cum >= (s + 1) // 2:
                med = ln
                break
        want[lang] = (s, med)
    assert out == want


def test_shard_manifest_tamper_and_layout_invariance(spark, tmp_path):
    """q189: one flipped row flips exactly its shard's checksum;
    repartitioning the input changes nothing; counts reconcile."""
    from etl_procesos_odo_spark.queries_llm import q189_shard_manifest

    base = [(i, f"text number {i}", "en", "src0", 13) for i in range(200)]
    df = spark.createDataFrame(
        base, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    p1 = str(tmp_path / "a")
    df.coalesce(1).write.parquet(f"{p1}/documents.parquet")
    m1 = {r["shard"]: r.asDict() for r in q189_shard_manifest(spark, p1).collect()}
    assert sum(r["n_docs"] for r in m1.values()) == 200

    # same rows, different physical layout -> identical manifest
    p2 = str(tmp_path / "b")
    df.repartition(7).write.parquet(f"{p2}/documents.parquet")
    m2 = {r["shard"]: r.asDict() for r in q189_shard_manifest(spark, p2).collect()}
    assert m1 == m2

    # tamper one row's text -> only its shard's checksum changes
    tampered = [(i, t if i != 57 else t + "!", la, s, n)
                for i, t, la, s, n in base]
    p3 = str(tmp_path / "c")
    spark.createDataFrame(
        tampered, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).coalesce(1).write.parquet(f"{p3}/documents.parquet")
    m3 = {r["shard"]: r.asDict() for r in q189_shard_manifest(spark, p3).collect()}
    diff = [s for s in m1 if m1[s]["checksum"] != m3[s]["checksum"]]
    assert len(diff) == 1
    same = [s for s in m1 if s not in diff]
    assert all(m1[s] == m3[s] for s in same)


def test_mwu_drift_bruteforce(spark):
    """q190 vs direct pairwise counting: 2*U1 = 2*#(a>b) + #(a==b)
    over all (train, test) pairs — the pair-count definition, not the
    rank formulation under test."""
    from etl_procesos_odo_spark.queries_enrich import q190_mwu_drift
    from tests.conftest import SF_DIR

    out = {
        r["event_type"]: (r["n_train"], r["n_test"], r["u1x2"], r["auc"])
        for r in q190_mwu_drift(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").selectExpr(
        "event_type", "value", "unix_micros(ts) as us"
    )
    allrows = ev.collect()
    us = [r["us"] for r in allrows]
    mn, mx = min(us), max(us)
    cutoff = mn + (8 * (mx - mn)) // 10
    emb_end = cutoff + 86_400_000_000
    groups = {}
    for r in allrows:
        if r["value"] is None:
            continue
        if r["us"] < cutoff:
            groups.setdefault(r["event_type"], ([], []))[0].append(r["value"])
        elif r["us"] >= emb_end:
            groups.setdefault(r["event_type"], ([], []))[1].append(r["value"])
    for t, (a, b) in groups.items():
        u1x2 = sum(2 if x > y else (1 if x == y else 0) for x in a for y in b)
        assert out[t] == (
            len(a), len(b), u1x2, u1x2 / (2 * len(a) * len(b))
        ), t


def test_join_audit_predicts_actual_join_size(spark):
    """q191's exact predicted size must equal the actual join row
    count at sf0.001, and the histograms must reconcile to key
    totals."""
    from etl_procesos_odo_spark.queries_relational import q191_join_audit
    from tests.conftest import SF_DIR

    rows = q191_join_audit(spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    actual = orders.join(
        li, orders["o_orderkey"] == li["l_orderkey"]
    ).count()
    assert rows and all(r["join_rows"] == actual for r in rows)
    n_okeys = orders.select("o_orderkey").distinct().count()
    n_lkeys = li.select("l_orderkey").distinct().count()
    assert sum(r["n_keys"] for r in rows if r["side"] == "orders") == n_okeys
    assert sum(r["n_keys"] for r in rows if r["side"] == "lineitem") == n_lkeys


def test_deletion_cascade_executes_clean(spark):
    """q192's audit numbers recomputed by actually executing the
    cascade at sf0.001: per-stage deleted/remaining reconcile and the
    post-delete state truly has zero orphans."""
    from etl_procesos_odo_spark.queries_relational import (
        q192_deletion_cascade,
    )
    from tests.conftest import SF_DIR

    out = {
        r["stage"]: (r["n_deleted"], r["n_remaining"], r["n_orphans_after"])
        for r in q192_deletion_cascade(spark, SF_DIR).collect()
    }
    cust = {r[0] for r in spark.read.parquet(
        f"{SF_DIR}/customer.parquet").select("c_custkey").collect()}
    orders = [(r[0], r[1]) for r in spark.read.parquet(
        f"{SF_DIR}/orders.parquet").select("o_orderkey", "o_custkey").collect()]
    li = [r[0] for r in spark.read.parquet(
        f"{SF_DIR}/lineitem.parquet").select("l_orderkey").collect()]
    del_c = {c for c in cust if c % 97 == 0}
    del_o = {ok for ok, ck in orders if ck in del_c}
    del_l = [k for k in li if k in del_o]
    keep_o = {ok for ok, ck in orders if ck not in del_c}
    keep_l = [k for k in li if k not in del_o]
    orphans = sum(1 for k in keep_l if k not in keep_o)
    assert orphans == 0
    assert out["customer"] == (len(del_c), len(cust) - len(del_c), 0)
    assert out["orders"] == (len(del_o), len(orders) - len(del_o), 0)
    assert out["lineitem"] == (len(del_l), len(li) - len(del_l), 0)
    assert out["customer"][0] > 0  # the sampled erasure list is non-empty


def test_session_gap_calibration_bruteforce(spark):
    """q193 vs direct gap enumeration at sf0.001: per-timeout break
    counts and the sessions = users + breaks identity."""
    from etl_procesos_odo_spark.queries_enrich import (
        q193_session_gap_calibration,
    )
    from tests.conftest import SF_DIR

    out = {
        r["timeout_s"]: (r["n_gaps"], r["n_breaks"], r["n_sessions"])
        for r in q193_session_gap_calibration(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").selectExpr(
        "user_id", "unix_micros(ts) as us", "event_id"
    )
    users = {}
    for r in ev.collect():
        users.setdefault(r["user_id"], []).append((r["us"], r["event_id"]))
    gaps = []
    for hist in users.values():
        hist.sort()
        gaps += [b[0] - a[0] for a, b in zip(hist, hist[1:])]
    for t in (300, 1800, 3600, 14400):
        breaks = sum(g > t * 1_000_000 for g in gaps)
        assert out[t] == (len(gaps), breaks, len(users) + breaks), t


def test_pmi_collocations_bruteforce(spark):
    """q194 vs direct Counter enumeration at sf0.001: same top-20 set,
    counts, and single-division scores under the (score desc, pair)
    tie-break."""
    from collections import Counter

    from etl_procesos_odo_spark.queries_llm import q194_pmi_collocations
    from tests.conftest import SF_DIR

    got = [
        (r["pair"], r["cxy"], r["cx"], r["cy"], r["score"])
        for r in q194_pmi_collocations(spark, SF_DIR).collect()
    ]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cw, cb, nbi = Counter(), Counter(), 0
    for r in docs.select("text").collect():
        ws = [t for t in r["text"].strip().split() if t]
        cw.update(ws)
        cb.update(zip(ws, ws[1:]))
        nbi += max(len(ws) - 1, 0)
    scored = sorted(
        (
            (f"{x} {y}", c, cw[x], cw[y], (nbi * c) / (cw[x] * cw[y]))
            for (x, y), c in cb.items()
            if c >= 5
        ),
        key=lambda t: (-t[4], t[0]),
    )[:20]
    assert sorted(got, key=lambda t: (-t[4], t[0])) == scored


def test_vocab_coverage_curve_bruteforce(spark):
    """q195 vs direct Counter enumeration at sf0.001 for every grid
    point, including the (count desc, type) tie-break at equal
    counts."""
    from collections import Counter

    from etl_procesos_odo_spark.queries_llm import q195_vocab_coverage_curve
    from tests.conftest import SF_DIR

    out = {
        r["k"]: (r["vocab_size"], r["total_tokens"], r["covered_tokens"],
                 r["coverage"])
        for r in q195_vocab_coverage_curve(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cw = Counter()
    for r in docs.select("text").collect():
        cw.update(t for t in r["text"].strip().split() if t)
    ordered = sorted(cw.items(), key=lambda kv: (-kv[1], kv[0]))
    s = sum(cw.values())
    for k in (1, 5, 10, 25):
        cov = sum(c for _, c in ordered[:k])
        assert out[k] == (len(cw), s, cov, cov / s), k


def test_source_purity_bruteforce(spark):
    """q196 vs direct Counter enumeration at sf0.001 including the
    (count desc, lang) argmax tie-break."""
    from collections import Counter

    from etl_procesos_odo_spark.queries_enrich import q196_source_purity
    from tests.conftest import SF_DIR

    out = {
        r["source"]: (r["n_langs"], r["n_docs"], r["dominant_lang"],
                      r["dominant_docs"], r["dominant_share"])
        for r in q196_source_purity(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "source", "lang"
    )
    per = {}
    for r in docs.collect():
        per.setdefault(r["source"], Counter())[r["lang"]] += 1
    want = {}
    for s, cnt in per.items():
        lang, n = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        tot = sum(cnt.values())
        want[s] = (len(cnt), tot, lang, n, n / tot)
    assert out == want


def test_cluster_size_distribution_bruteforce(spark):
    """q197 vs direct Counter-of-Counters at sf0.001, same digest
    normalization."""
    from collections import Counter

    from etl_procesos_odo_spark.queries_llm import (
        q197_cluster_size_distribution,
    )
    from tests.conftest import SF_DIR
    import hashlib
    import re

    out = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs_at_size"],
                            r["duplication_factor"], r["singleton_share"])
        for r in q197_cluster_size_distribution(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dig = Counter()
    for r in docs.select("text").collect():
        norm = re.sub(r"\s+", " ", r["text"]).strip().lower()
        dig[hashlib.md5(norm.encode()).hexdigest()] += 1
    sizes = Counter(dig.values())
    n_clusters = len(dig)
    n_docs = sum(dig.values())
    singles = sizes.get(1, 0)
    want = {
        sz: (n, n * sz, n_docs / n_clusters, singles / n_clusters)
        for sz, n in sizes.items()
    }
    assert out == want


def test_keyness_terms_bruteforce(spark):
    """q198 vs direct Counter enumeration at sf0.001: per-language
    top-5 by the smoothed ratio with the (keyness desc, term)
    tie-break."""
    from collections import Counter

    from etl_procesos_odo_spark.queries_llm import q198_keyness_terms
    from tests.conftest import SF_DIR

    got = {
        (r["lang"], r["rank"]): (r["term"], r["c_in"], r["c_out"],
                                 r["keyness"])
        for r in q198_keyness_terms(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cl, nl, ct, nt = {}, Counter(), Counter(), 0
    for r in docs.select("lang", "text").collect():
        ws = [t for t in r["text"].strip().split() if t]
        cl.setdefault(r["lang"], Counter()).update(ws)
        nl[r["lang"]] += len(ws)
        ct.update(ws)
        nt += len(ws)
    want = {}
    for lang, cnt in cl.items():
        scored = sorted(
            (
                (t, c, ct[t] - c,
                 (c * (nt - nl[lang] + 1)) / ((ct[t] - c + 1) * nl[lang]))
                for t, c in cnt.items() if c >= 5
            ),
            key=lambda x: (-x[3], x[0]),
        )[:5]
        for i, row in enumerate(scored, 1):
            want[(lang, i)] = row
    assert got == want


def test_scd2_build_crafted_history(spark):
    """Crafted change log: no-op observations collapse, episodes chain
    half-open, versions count per key, exactly one open interval per
    key — and the intervals actually answer as-of lookups."""
    import datetime as dt

    from etl_procesos_odo_spark.operators.windows import scd2_build

    T = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
    rows = [
        # user 1: A A B A  -> episodes A, B, A (middle A is a no-op dup)
        (1, T(0), "A", 10),
        (1, T(10), "A", 11),
        (1, T(20), "B", 12),
        (1, T(30), "A", 13),
        # user 2: single observation -> one open episode
        (2, T(5), "X", 20),
        # user 3: tie timestamps, tiebreak by event_id -> C then D
        (3, T(7), "D", 31),
        (3, T(7), "C", 30),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type", "event_id"])
    out = sorted(
        scd2_build(df, "user_id", "ts", "event_type", "event_id").collect(),
        key=lambda r: (r["user_id"], r["version"]),
    )
    us = lambda s: int(T(s).timestamp() * 1_000_000)
    got = [
        (r["user_id"], r["event_type"], r["valid_from_us"],
         r["valid_to_us"], r["version"], r["is_current"])
        for r in out
    ]
    assert got == [
        (1, "A", us(0), us(20), 1, False),
        (1, "B", us(20), us(30), 2, False),
        (1, "A", us(30), None, 3, True),
        (2, "X", us(5), None, 1, True),
        (3, "C", us(7), us(7), 1, False),  # zero-length episode on tie
        (3, "D", us(7), None, 2, True),
    ]
    # one open interval per key; intervals tile without overlap
    by_key = {}
    for g in got:
        by_key.setdefault(g[0], []).append(g)
    for k, eps in by_key.items():
        assert sum(1 for e in eps if e[5]) == 1
        for a, b in zip(eps, eps[1:]):
            assert a[3] == b[2]  # half-open chaining


def test_scd2_single_shuffle_plan(spark):
    """Both SCD2 windows (LAG collapse, LEAD close) must reuse ONE hash
    partitioning on the key — a second Exchange means the sort/partition
    reuse broke."""
    from etl_procesos_odo_spark.operators.windows import scd2_build
    from etl_procesos_odo_spark.session import load_table

    from .conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    p = (
        scd2_build(ev, "user_id", "ts", "event_type", "event_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert p.count("Exchange hashpartitioning") == 1, p


def test_scd2_null_values_form_episodes(spark):
    """NULL is a legal attribute state: A -> NULL -> A must yield THREE
    episodes (the unknown interval preserved), and a NULL first
    observation must survive — the naive `value != prev` collapse drops
    both."""
    import datetime as dt

    from etl_procesos_odo_spark.operators.windows import scd2_build

    T = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
    rows = [
        (1, T(0), "A", 10),
        (1, T(10), None, 11),
        (1, T(20), "A", 12),
        (2, T(0), None, 20),
        (2, T(5), None, 21),  # no-op NULL -> collapses
        (2, T(9), "B", 22),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, "
                                     "event_type string, event_id long")
    out = sorted(
        scd2_build(df, "user_id", "ts", "event_type", "event_id").collect(),
        key=lambda r: (r["user_id"], r["version"]),
    )
    seq = [(r["user_id"], r["event_type"], r["version"], r["is_current"])
           for r in out]
    assert seq == [
        (1, "A", 1, False), (1, None, 2, False), (1, "A", 3, True),
        (2, None, 1, False), (2, "B", 2, True),
    ]


def test_seasonal_backtest_rejects_leaky_horizon(spark):
    from etl_procesos_odo_spark.ml.forecast import seasonal_naive_backtest

    import pytest

    with pytest.raises(ValueError, match="leak"):
        seasonal_naive_backtest(None, "k", "ts", period=7, horizon=14)


def test_bench_cli_rejects_bad_segments():
    import pathlib
    import subprocess
    import sys

    root = pathlib.Path(__file__).resolve().parents[1]
    r = subprocess.run(
        [sys.executable, str(root / "bench.py"), "--segments", "0"],
        capture_output=True, text=True, timeout=30,
    )
    assert r.returncode != 0 and "segments must be >= 1" in r.stderr
