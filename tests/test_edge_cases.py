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
