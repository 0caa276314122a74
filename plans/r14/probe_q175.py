#!/usr/bin/env python
"""Round-14 q175 probe: candidate restructure of ppjoin_pairs —
(a) global row_number rank table -> direct (df, gram) struct sort keys
    (removes the vocabulary-wide single-task window, guide §2.5/§2.4);
(b) PPJoin positional filter on the prefix join (Xiao et al. 2008):
    prune candidate pairs whose position-implied overlap upper bound
    cannot reach the Jaccard threshold, before distinct + verify.

Equivalence argument for (b): both docs' gram arrays are sorted by the
SAME global (df, gram) total order, so for a shared prefix gram at
0-based positions (pi, pj), shared grams split into those strictly
before it in both arrays (<= min(pi, pj)) and those at-or-after it in
both (<= min(na-pi-1, nb-pj-1) + 1). Hence
    shared <= ubound = least(pi, pj) + 1 + least(na-pi-1, nb-pj-1)
for EVERY shared prefix gram, and J >= t_n/t_d  <=>
(t_n + t_d) * shared >= t_n * (na + nb); a pair none of whose matched
prefix rows satisfies (t_n + t_d) * ubound >= t_n * (na + nb) can never
verify. Every row of a true pair passes, so recall is exact.

Usage: python plans/r14/probe_q175.py [equiv|ab] [sf_dir]
  equiv: collect base vs variant at the given sf dir, assert identical.
  ab:    interleaved cold A/B (2 reps per arm) + candidate volumes.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import functions as F  # noqa: E402


def ppjoin_pairs_r13(docs, text_col="text", id_col="doc_id",
                     threshold_num=4, threshold_den=5, k=3):
    """The PRE-r14 implementation, pinned inline (the r13 ab_conf advice:
    a probe whose base arm is 'whatever ships' stops being reproducible
    the moment the candidate wins): string-gram prefix join + distinct +
    string-array verify, no positional/suffix filters."""
    from pyspark.sql import Window

    from etl_procesos_odo_spark.llm.dedup import shingles

    t_n, t_d = threshold_num, threshold_den
    g = docs.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), k).alias("grams")
    ).filter(F.size("grams") > 0)
    g = g.localCheckpoint(eager=True)
    df_tab = (
        g.select(F.explode("grams").alias("gram"))
        .groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    )
    w = Window.orderBy("df", "gram")
    rk = df_tab.select("gram", F.row_number().over(w).alias("rk"))
    ranked = (
        g.select("id", F.explode("grams").alias("gram"))
        .join(rk, "gram")
        .groupBy("id")
        .agg(F.expr(
            "transform(array_sort(collect_list(struct(rk, gram))), "
            "s -> s.gram)").alias("sorted_grams"))
        .selectExpr(
            "id", "size(sorted_grams) as n",
            f"slice(sorted_grams, 1, size(sorted_grams) "
            f"- (({t_n} * size(sorted_grams) + {t_d} - 1) div {t_d}) + 1) "
            "as prefix",
        )
    )
    pa = ranked.select(
        F.col("id").alias("id_a"), F.col("n").alias("na"),
        F.explode("prefix").alias("gram"),
    )
    pb = ranked.select(
        F.col("id").alias("id_b"), F.col("n").alias("nb"),
        F.explode("prefix").alias("gram"),
    )
    cand = (
        pa.join(pb, "gram")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.lit(t_n) * F.col("na") <= F.lit(t_d) * F.col("nb"))
            & (F.lit(t_n) * F.col("nb") <= F.lit(t_d) * F.col("na"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    ga = g.selectExpr("id as id_a", "grams as ga", "size(grams) as n_a")
    gb = g.selectExpr("id as id_b", "grams as gb", "size(grams) as n_b")
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("shared", F.expr("size(array_intersect(ga, gb))"))
        .filter(F.expr(f"{t_d} * shared >= {t_n} * (n_a + n_b - shared)"))
        .selectExpr(
            "id_a", "id_b", "n_a", "n_b",
            "cast(shared as bigint) as shared",
            "cast(shared as double) / cast(n_a + n_b - shared as double)"
            " as jacc",
        )
    )


def ppjoin_pairs_v2(docs, text_col="text", id_col="doc_id",
                    threshold_num=4, threshold_den=5, k=3):
    from etl_procesos_odo_spark.llm.dedup import shingles

    t_n, t_d = threshold_num, threshold_den
    g = docs.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), k).alias("grams")
    ).filter(F.size("grams") > 0)
    g = g.localCheckpoint(eager=True)
    df_tab = (
        g.select(F.explode("grams").alias("gram"))
        .groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    )
    ranked = (
        g.select("id", F.explode("grams").alias("gram"))
        .join(df_tab, "gram")
        .groupBy("id")
        .agg(F.expr(
            "transform(array_sort(collect_list(struct(df, gram))), "
            "s -> s.gram)").alias("sorted_grams"))
        .selectExpr(
            "id", "size(sorted_grams) as n",
            f"slice(sorted_grams, 1, size(sorted_grams) "
            f"- (({t_n} * size(sorted_grams) + {t_d} - 1) div {t_d}) + 1) "
            "as prefix",
        )
    )
    pa = ranked.select(
        F.col("id").alias("id_a"), F.col("n").alias("na"),
        F.posexplode("prefix").alias("pi", "gram"),
    )
    pb = ranked.select(
        F.col("id").alias("id_b"), F.col("n").alias("nb"),
        F.posexplode("prefix").alias("pj", "gram"),
    )
    ub = (
        F.least(F.col("pi"), F.col("pj")) + F.lit(1)
        + F.least(F.col("na") - F.col("pi") - 1, F.col("nb") - F.col("pj") - 1)
    )
    cand = (
        pa.join(pb, "gram")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.lit(t_n) * F.col("na") <= F.lit(t_d) * F.col("nb"))
            & (F.lit(t_n) * F.col("nb") <= F.lit(t_d) * F.col("na"))
            & (F.lit(t_n + t_d) * ub >= F.lit(t_n) * (F.col("na") + F.col("nb")))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    ga = g.selectExpr("id as id_a", "grams as ga", "size(grams) as n_a")
    gb = g.selectExpr("id as id_b", "grams as gb", "size(grams) as n_b")
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("shared", F.expr("size(array_intersect(ga, gb))"))
        .filter(F.expr(f"{t_d} * shared >= {t_n} * (n_a + n_b - shared)"))
        .selectExpr(
            "id_a", "id_b", "n_a", "n_b",
            "cast(shared as bigint) as shared",
            "cast(shared as double) / cast(n_a + n_b - shared as double)"
            " as jacc",
        )
    )


def ppjoin_pairs_v3(docs, text_col="text", id_col="doc_id",
                    threshold_num=4, threshold_den=5, k=3):
    """v3: everything after the df build runs on INT gram ranks —
    (a) per-doc arrays hold the rank ints, not the gram strings (the
        rank is a bijection preserving the (df, gram) prefix order, so
        prefix sets and intersection sizes are unchanged — guide §2.3
        'narrower types': the verify join ships ~4x fewer bytes);
    (b) the prefix equi-join keys on the int rank;
    (c) PPJoin positional filter prunes candidates before distinct;
    (d) verify intersects the int arrays from the checkpointed ranked
        frame (g's string arrays never leave the first explode)."""
    from pyspark.sql import Window

    from etl_procesos_odo_spark.llm.dedup import shingles

    t_n, t_d = threshold_num, threshold_den
    g = docs.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), k).alias("grams")
    ).filter(F.size("grams") > 0)
    g = g.localCheckpoint(eager=True)
    df_tab = (
        g.select(F.explode("grams").alias("gram"))
        .groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    )
    w = Window.orderBy("df", "gram")
    rk = df_tab.select("gram", F.row_number().over(w).alias("rk"))
    ranked = (
        g.select("id", F.explode("grams").alias("gram"))
        .join(rk, "gram")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("rk")).alias("ra"))
        .selectExpr(
            "id", "size(ra) as n", "ra",
            f"slice(ra, 1, size(ra) "
            f"- (({t_n} * size(ra) + {t_d} - 1) div {t_d}) + 1) as prefix",
        )
        .localCheckpoint(eager=True)  # feeds pa, pb, and both verify sides
    )
    pa = ranked.select(
        F.col("id").alias("id_a"), F.col("n").alias("na"),
        F.posexplode("prefix").alias("pi", "rk"),
    )
    pb = ranked.select(
        F.col("id").alias("id_b"), F.col("n").alias("nb"),
        F.posexplode("prefix").alias("pj", "rk"),
    )
    ub = (
        F.least(F.col("pi"), F.col("pj")) + F.lit(1)
        + F.least(F.col("na") - F.col("pi") - 1, F.col("nb") - F.col("pj") - 1)
    )
    cand = (
        pa.join(pb, "rk")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.lit(t_n) * F.col("na") <= F.lit(t_d) * F.col("nb"))
            & (F.lit(t_n) * F.col("nb") <= F.lit(t_d) * F.col("na"))
            & (F.lit(t_n + t_d) * ub >= F.lit(t_n) * (F.col("na") + F.col("nb")))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    ga = ranked.selectExpr("id as id_a", "ra as ga", "n as n_a")
    gb = ranked.selectExpr("id as id_b", "ra as gb", "n as n_b")
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("shared", F.expr("size(array_intersect(ga, gb))"))
        .filter(F.expr(f"{t_d} * shared >= {t_n} * (n_a + n_b - shared)"))
        .selectExpr(
            "id_a", "id_b", "n_a", "n_b",
            "cast(shared as bigint) as shared",
            "cast(shared as double) / cast(n_a + n_b - shared as double)"
            " as jacc",
        )
    )


def ppjoin_pairs_v4(docs, text_col="text", id_col="doc_id",
                    threshold_num=4, threshold_den=5, k=3):
    """v4 = v3 + the count/last-position suffix bound: after grouping
    matched prefix rows per pair, shared <= cnt + min(na-li-1, nb-lj-1)
    where cnt is the EXACT number of common prefix grams and (li, lj) the
    positions of the last (max-rank) one — any shared gram ranked below a
    matched prefix gram must itself be in both prefixes (the prefix is
    the rank-lowest slice), so every uncounted shared gram sits strictly
    after (li, lj) in both arrays. Replaces the distinct with a same-
    shuffle groupBy; prunes pairs the per-row bound cannot."""
    from pyspark.sql import Window

    from etl_procesos_odo_spark.llm.dedup import shingles

    t_n, t_d = threshold_num, threshold_den
    g = docs.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), k).alias("grams")
    ).filter(F.size("grams") > 0)
    g = g.localCheckpoint(eager=True)
    df_tab = (
        g.select(F.explode("grams").alias("gram"))
        .groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    )
    w = Window.orderBy("df", "gram")
    rk = df_tab.select("gram", F.row_number().over(w).alias("rk"))
    ranked = (
        g.select("id", F.explode("grams").alias("gram"))
        .join(rk, "gram")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("rk")).alias("ra"))
        .selectExpr(
            "id", "size(ra) as n", "ra",
            f"slice(ra, 1, size(ra) "
            f"- (({t_n} * size(ra) + {t_d} - 1) div {t_d}) + 1) as prefix",
        )
        .localCheckpoint(eager=True)
    )
    pa = ranked.select(
        F.col("id").alias("id_a"), F.col("n").alias("na"),
        F.posexplode("prefix").alias("pi", "rk"),
    )
    pb = ranked.select(
        F.col("id").alias("id_b"), F.col("n").alias("nb"),
        F.posexplode("prefix").alias("pj", "rk"),
    )
    ub = (
        F.least(F.col("pi"), F.col("pj")) + F.lit(1)
        + F.least(F.col("na") - F.col("pi") - 1, F.col("nb") - F.col("pj") - 1)
    )
    ub2 = F.col("cnt") + F.least(
        F.col("na") - F.col("li") - 1, F.col("nb") - F.col("lj") - 1
    )
    cand = (
        pa.join(pb, "rk")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.lit(t_n) * F.col("na") <= F.lit(t_d) * F.col("nb"))
            & (F.lit(t_n) * F.col("nb") <= F.lit(t_d) * F.col("na"))
            & (F.lit(t_n + t_d) * ub >= F.lit(t_n) * (F.col("na") + F.col("nb")))
        )
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.max("pi").alias("li"), F.max("pj").alias("lj"))
        .filter(F.lit(t_n + t_d) * ub2 >= F.lit(t_n) * (F.col("na") + F.col("nb")))
        .select("id_a", "id_b")
    )
    ga = ranked.selectExpr("id as id_a", "ra as ga", "n as n_a")
    gb = ranked.selectExpr("id as id_b", "ra as gb", "n as n_b")
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("shared", F.expr("size(array_intersect(ga, gb))"))
        .filter(F.expr(f"{t_d} * shared >= {t_n} * (n_a + n_b - shared)"))
        .selectExpr(
            "id_a", "id_b", "n_a", "n_b",
            "cast(shared as bigint) as shared",
            "cast(shared as double) / cast(n_a + n_b - shared as double)"
            " as jacc",
        )
    )


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "equiv"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from etl_procesos_odo_spark.llm.dedup import ppjoin_pairs
    from etl_procesos_odo_spark.session import get_spark

    spark = get_spark("r14-q175-probe")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    if mode == "equiv":
        base = sorted(tuple(r) for r in
                      ppjoin_pairs_r13(docs, "text", "doc_id", 4, 5).collect())
        for tag, fn in (("v2", ppjoin_pairs_v2), ("v3", ppjoin_pairs_v3),
                        ("v4", ppjoin_pairs_v4)):
            v = sorted(tuple(r) for r in
                       fn(docs, "text", "doc_id", 4, 5).collect())
            assert base == v, (
                f"{tag} MISMATCH: base {len(base)} rows vs {len(v)} rows"
            )
            print(json.dumps({"equiv": tag, "rows": len(base),
                              "sf_dir": sf_dir}), flush=True)
    else:
        res = {}
        for rep in range(2):
            for tag, fn in (("base", ppjoin_pairs_r13),
                            ("v3", ppjoin_pairs_v3),
                            ("v4", ppjoin_pairs_v4)):
                spark.sparkContext.setJobDescription(f"q175-{tag}-rep{rep}")
                t0 = time.perf_counter()
                fn(docs, "text", "doc_id", 4, 5).write.mode(
                    "overwrite").format("noop").save()
                res.setdefault(tag, []).append(
                    round(time.perf_counter() - t0, 3))
        print(json.dumps({"ab": res, "sf_dir": sf_dir,
                          "mins": {t: min(v) for t, v in res.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
