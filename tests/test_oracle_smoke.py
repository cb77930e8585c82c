"""In-pytest oracle smoke: a representative query subset compared against
DuckDB at sf0.001, so plain `pytest` catches oracle drift without the full
tools/check_oracle.py run (which remains the authoritative gate at sf0.01)."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest

from weatherdatapipeline_spark.queries import ORACLES, QUERIES

SMOKE = [
    "q1_pricing_summary",
    "region_revenue",
    "asof_join_click_to_view",
    "window_rolling_stats",
    "latest_event_per_user",
    "calendar_activity",
    "dedup_exact_documents",
    "dedup_jaccard_pairs",
    "similarity_topk",
    "pivot_event_type_counts",
    "eval_persistence_forecast",
    "funnel_view_click_purchase",
    "retention_weekly_cohorts",
    "ohlc_resample_daily",
    "q6_forecast_revenue",
    "kmeans_cluster_assignments",
    "cms_token_frequencies",
    "mmr_diverse_top3",
    # r10 wave 3
    "wilcoxon_signed_rank_weekend",
    "nelson_aalen_churn",
    "mcnemar_click_purchase",
    "runs_test_daily_value",
    "cochran_armitage_hour_trend",
    "markov_stationary_event_types",
    "ccf_leadlag_purchase_error",
    "media_phash_pairs",
    "editdist_part_name_pairs",
    "clustering_coefficient_cosupply",
    "friedman_daily_types",
    "ljung_box_daily_value",
    "hurst_rescaled_range",
    "media_audiofp_pairs",
    "cramer_von_mises_weekend",
    "ranking_eval_purchase",
    "geo_radius_pairs",
    "dbscan_customer_geo",
    "label_propagation_cosupply",
    "geo_knn_customers",
    "hll_trailing7_distinct",
    "pareto_customer_revenue",
    "textrank_keywords",
    "streaming_topk_types_per_window",
    "cohort_ltv_curve",
    "nearest_facility_assignment",
    "km_greenwood_bands",
    "cmh_stratified_association",
    "capture_recapture_users",
    "mh_common_odds_ratio",
    "diebold_mariano_forecasts",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v + 0.0:.12g}"
    return str(v)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SMOKE)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    s_order = sorted(range(len(scols)), key=lambda i: scols[i])
    d_order = sorted(range(len(dcols)), key=lambda i: dcols[i])
    ms = Counter(tuple(norm(r[i]) for i in s_order) for r in srows)
    md = Counter(tuple(norm(r[i]) for i in d_order) for r in drows)
    assert ms == md
