"""Smoke tests for the runnable examples (examples/*.py): each main()
executes end-to-end at the smallest SF and produces a non-empty
curated corpus, so the showcase can't silently rot as operators
evolve (VERDICT r6 item 8)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.conftest import SF_SMALL


def test_training_data_pipeline_example(spark):
    from examples.training_data_pipeline import main

    out = main(SF_SMALL)
    assert out["n_in"] > 0
    # Dedup + quality gates keep a non-empty subset, sampling likewise.
    assert 0 < out["n_kept"] <= out["n_in"]
    assert 0 < out["n_out"] <= out["n_kept"]


def test_semantic_curation_pipeline_example(spark):
    from examples.semantic_curation_pipeline import main

    out = main(SF_SMALL)
    assert out["n_docs"] > 0
    assert 0 < out["n_curated"] <= out["n_docs"]
    assert 0 < out["n_sample"] <= out["n_curated"]


def test_telemetry_observability_pipeline_example(spark):
    from examples.telemetry_observability_pipeline import main

    out = main(SF_SMALL)
    assert out["sessions"] > 0
    assert out["cms_cells"] > 0 and out["cms_cells"] <= 48
    assert out["est_click_view_overlap"] >= 0
    # gaps/outliers/incident hits can legitimately be 0 at tiny SF,
    # but must be non-negative ints
    for k in ("sequence_gaps", "purchases_in_incident_windows", "mad_outliers"):
        assert out[k] >= 0
    # bitmap retention: cohorts fit the 64-day window; d7 retention
    # can't exceed the user population
    assert 0 < out["cohort_cells"] <= 64
    assert out["d7_retained_users"] >= 0
    # SPRT: decisions are a subset of the 5 event types
    assert 0 <= out["sprt_decided_types"] <= 5


def test_business_analytics_pipeline_example(spark):
    from examples.business_analytics_pipeline import main

    out = main(SF_SMALL)
    assert out["q3_top_orders"] > 0
    assert out["q5_nations"] > 0
    assert out["purchase_inbound_edges"] > 0
    assert out["attribution_channels"] > 0
    assert out["ohlc_bars"] > 0
    assert out["balance_rows"] > 0 and out["cap_hits"] > 0
    assert out["ab_n"] > 0
    assert out["benford_digits"] == 9


def test_product_analytics_pipeline_example(spark):
    from examples.product_analytics_pipeline import main

    out = main(SF_SMALL)
    assert out["funnel_steps"] == 3
    assert out["funnel_view_users"] > 0
    assert out["cohort_cells"] > 0
    assert out["top_paths"] > 0
    assert out["rfm_customers"] > 0
    assert out["km_event_times"] > 0
    assert 0.0 <= out["km_final_survival"] <= 1.0
    assert out["ks_ppm"] >= 0
    assert out["profiled_columns"] == 6


def test_web_corpus_pipeline_example(spark):
    from examples.web_corpus_pipeline import main

    out = main("/root/testdata/sf0.001")
    assert out["extracted_docs"] == 500
    assert out["canonical_urls"] > 0
    assert out["training_rows"] > 0
    assert out["balanced_equal"] is True
    assert out["audited_users"] > 0


def test_geo_model_eval_pipeline_example(spark):
    from examples.geo_model_eval_pipeline import main

    out = main(SF_SMALL)
    assert out["n_tiles"] > 0
    assert out["n_alerts"] > 0
    assert out["n_curve_points"] > 0
    assert 0.0 <= out["auc"] <= 1.0
    assert 0 <= out["ece_ppm"] <= 1_000_000
    assert out["n_sample"] == 100
    assert out["n_changepoints"] == 3
    # HT weights are floored max(w, tau): total at least the raw sum
    assert out["ht_total_cents"] > 0


def test_eval_harness_pipeline_example(spark):
    from examples.eval_harness_pipeline import main

    out = main(SF_SMALL)
    assert out["n_contaminated"] > 0
    assert out["n_feature_cells"] > 0
    assert out["n_scored_docs"] == 250
    assert 0.0 <= out["mean_ndcg10"] <= 1.0
    assert 0.0 <= out["mean_mrr"] <= 1.0
    assert out["worst_cluster_sil"] is not None
    assert out["levene_w"] >= 0.0
    assert out["n_released_cells"] == 25


def test_corpus_selection_pipeline_example(spark):
    from examples.corpus_selection_pipeline import main

    out = main(SF_SMALL)
    assert out["n_docs"] == 500
    assert 0 < out["n_blocked"] < out["n_docs"]
    assert out["n_dsir_picked"] == 50
    assert 0 < out["mean_novelty_ppm"] <= 1_000_000
    assert out["zipf_slope_milli"] < 0
    assert out["n_seed_reached"] > 0
    assert 0 <= out["mean_ivf_recall_ppm"] <= 1_000_000
    assert out["n_cv_folds"] == 4
    assert 0 <= out["perm_p_ppm"] <= 1_000_000
    assert out["top_markov_channel"]
