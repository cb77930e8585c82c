"""Frequent-pattern mining over relational event logs.

Pairwise association rules (the useful core of Apriori for basket
analysis dashboards): candidate generation is a basket-keyed self-join of
the DISTINCT (basket, item) table, so per-basket fan-out is bounded by the
item vocabulary of that basket (|items|^2), never by basket row count —
the same bounded-equi-join discipline as the shingle joins in dedup. All
reference counts (per-item, basket total) are vocabulary-sized / 1-row
broadcast sides. At 100 TB this is one distinct, one self-join on the
basket key, and one (antecedent, consequent) map-side-combined agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    events: DataFrame,
    basket_col: str = "user_id",
    item_col: str = "event_type",
    min_support: float = 0.01,
) -> DataFrame:
    """Pairwise association rules antecedent -> consequent with
    support = P(a, c), confidence = P(c | a), lift = P(a, c) / (P(a)P(c)).

    Directional: both (a, c) and (c, a) are emitted (confidence differs).
    ``min_support`` filters on the co-occurrence fraction of baskets.
    """
    baskets = events.select(basket_col, item_col).distinct()
    n_baskets = baskets.select(basket_col).distinct().agg(
        F.count(F.lit(1)).cast("double").alias("_n")
    )
    item_n = baskets.groupBy(item_col).agg(
        F.count(F.lit(1)).cast("double").alias("_cnt")
    )
    a = baskets.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("antecedent")
    )
    c = baskets.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("consequent")
    )
    pairs = (
        a.join(c, "_b")
        .filter(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).cast("double").alias("_nab"))
    )
    out = (
        pairs.join(
            F.broadcast(item_n.withColumnRenamed(item_col, "antecedent")
                        .withColumnRenamed("_cnt", "_na")),
            "antecedent",
        )
        .join(
            F.broadcast(item_n.withColumnRenamed(item_col, "consequent")
                        .withColumnRenamed("_cnt", "_nc")),
            "consequent",
        )
        .crossJoin(F.broadcast(n_baskets))
    )
    support = F.col("_nab") / F.col("_n")
    return (
        out.filter(support >= min_support)
        .select(
            "antecedent",
            "consequent",
            F.col("_nab").cast("bigint").alias("n_baskets_both"),
            F.round(support, 6).alias("support"),
            F.round(F.col("_nab") / F.col("_na"), 6).alias("confidence"),
            F.round(
                F.col("_nab") * F.col("_n") / (F.col("_na") * F.col("_nc")), 6
            ).alias("lift"),
        )
    )
