"""Round-6 batch 2: PPJoin prefix filtering, 2D skyline, entity
clusters, exact equi-depth histogram."""

from __future__ import annotations

from pyspark.sql import functions as F

from weatherdatapipeline_spark.operators.dedup import (
    jaccard_near_duplicates,
    ppjoin_near_duplicates,
)
from weatherdatapipeline_spark.operators.relational import skyline_2d


def test_ppjoin_equals_uncut_jaccard(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base + " extra tail words here"),            # near-dup of 1
        (3, "completely different content with no overlap at all typed out"),
        (4, base.replace("quick", "rapid")),             # near-dup of 1
        (5, "another unrelated document about spark and distributed joins"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pp = {
        (r.doc_a, r.doc_b): (r.common, r.size_a, r.size_b, r.jaccard)
        for r in ppjoin_near_duplicates(docs, threshold=0.3).collect()
    }
    jac = {
        (r.doc_a, r.doc_b): (r.common, r.size_a, r.size_b, r.jaccard)
        for r in jaccard_near_duplicates(
            docs, threshold=0.3, max_shingle_freq=None
        ).collect()
    }
    assert pp == jac
    assert (1, 2) in pp and (1, 4) in pp  # the planted near-dups found


def test_ppjoin_prefix_is_lossless_at_high_threshold(spark):
    # identical docs must always survive prefix filtering (jaccard = 1)
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = ppjoin_near_duplicates(docs, threshold=0.9).collect()
    assert len(out) == 6  # C(4,2) identical pairs
    assert all(r.jaccard == 1.0 for r in out)


def _sky(spark, pts):
    df = spark.createDataFrame(pts, "pid long, x double, y long")
    rows = skyline_2d(df, "x", "y", band_width=10.0).collect()
    return sorted((r.pid) for r in rows)


def test_skyline_staircase_golden(spark):
    pts = [
        (1, 1.0, 9),   # frontier
        (2, 2.0, 5),   # frontier
        (3, 2.5, 7),   # dominated by 2
        (4, 4.0, 5),   # dominated by 2 (same y, larger x)
        (5, 6.0, 2),   # frontier
        (6, 6.0, 3),   # dominated by 5 (same x, larger y)
    ]
    assert _sky(spark, pts) == [1, 2, 5]


def test_skyline_equal_point_ties_all_survive(spark):
    pts = [(1, 3.0, 4), (2, 3.0, 4), (3, 9.0, 9)]
    assert _sky(spark, pts) == [1, 2]


def test_skyline_crosses_band_boundaries(spark):
    # bands of width 10: dominator at x=5 must prune x=15 in the next band
    pts = [(1, 5.0, 3), (2, 15.0, 3), (3, 15.0, 2), (4, 25.0, 1)]
    assert _sky(spark, pts) == [1, 3, 4]


def test_entity_clusters_transitive(spark):
    from weatherdatapipeline_spark.operators import dedup as D

    # chain: "rose gold a" ~ "rose gold b" ~ "rose gold c" (dist 1 apart)
    rows = [(1, "rose gold a"), (2, "rose gold b"), (3, "rose gold c"),
            (4, "totally other name")]
    p = spark.createDataFrame(rows, "p_partkey long, p_name string")
    base = p.select("p_name").distinct()
    toks = F.split(F.col("p_name"), " ")

    def pass_on(expr):
        n = base.withColumn("block", expr)
        return (
            n.select(F.col("p_name").alias("name_a"), "block")
            .join(n.select(F.col("p_name").alias("name_b"), "block"), "block")
            .filter(F.col("name_a") < F.col("name_b"))
            .select("name_a", "name_b")
        )

    pairs = (
        pass_on(F.element_at(toks, -1)).union(pass_on(F.element_at(toks, 1)))
        .distinct()
        .withColumn("d", F.levenshtein("name_a", "name_b"))
        .filter(F.col("d") <= 3)
        .select("name_a", "name_b")
    )
    cc = D.connected_components(pairs, a_col="name_a", b_col="name_b")
    got = {r.node: r.cluster_id for r in cc.collect()}
    assert got == {
        "rose gold a": "rose gold a",
        "rose gold b": "rose gold a",
        "rose gold c": "rose gold a",
    }


def test_equi_depth_uniform_deciles(spark):
    from weatherdatapipeline_spark.queries import QUERIES

    out = QUERIES["equi_depth_deciles_value"](spark, "/root/testdata/sf0.001")
    rows = sorted(out.collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(10))
    total = sum(r.n for r in rows)
    for r in rows:  # exact percentile boundaries keep buckets near 10%
        assert abs(r.n - total / 10) < total * 0.02
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo
