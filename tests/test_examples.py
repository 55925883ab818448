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
