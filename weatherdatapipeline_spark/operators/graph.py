"""Graph operators over relational edge tables (iterative DataFrame loops).

The connected-components family lives in ``operators/dedup.py`` (min-label
propagation + large-star/small-star) because its consumer is near-dup
clustering; this module holds the general-purpose iterative graph ops.

Scale notes: PageRank here is the standard join-aggregate formulation —
each iteration is one (src-keyed) equi-join of the edge table against the
current rank vector plus one dst-keyed sum. Both shuffles key on the node
id, so a pre-partitioned/bucketed edge table reuses its layout across all
iterations. The rank vector is node-vocabulary-sized (|V| rows, not |E|),
so AQE broadcasts it automatically when |V| is small; nothing here is ever
all-pairs. Lineage is truncated nothing — at 5 fixed iterations the plan
stays shallow; callers running to convergence should localCheckpoint every
~10 rounds like dedup.connected_components does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration weighted PageRank.

    ``edges`` must carry per-src row-normalized weights (sum of ``weight``
    over each src == 1). Returns (node, pr). Dangling nodes (no out-edges)
    keep the teleport term but do not redistribute their mass — the
    standard "lost mass" simplification; callers whose graphs have dangling
    nodes and need a stochastic matrix should add uniform out-edges first.

    The node count is a driver-side scalar — bounded by the node
    vocabulary, the same bounded-``collect`` contract as the centroid and
    percentile operators.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pr", F.lit(0.0))
    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("node"), F.col(weight).alias("_w")
    )
    for _ in range(iters):
        contribs = (
            e.join(ranks.select(F.col("node").alias("_src"), "pr"), "_src")
            .groupBy("node")
            .agg(F.sum(F.col("pr") * F.col("_w")).alias("_s"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0))
            ).alias("pr"),
        )
    return ranks
