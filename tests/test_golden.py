"""Golden-run regression oracle.

The reference's de-facto regression mechanism is its committed
``results/2025-06-20-1`` artifact set (SURVEY.md §4). This test regenerates
the same deterministic tiny end-to-end run as tests/golden/make_golden.py
and compares row-for-row against the committed fixture — catching silent
numerics or pipeline-semantics drift across refactors and jax upgrades.
"""

import csv
from pathlib import Path

import pytest

GOLDEN = Path(__file__).parent / "golden" / "golden_result.csv"


def test_golden_run_matches(tmp_path):
    from tests.golden.make_golden import build_run

    out = build_run(tmp_path)
    with open(out.csv_path) as f:
        got = list(csv.DictReader(f))
    with open(GOLDEN) as f:
        want = list(csv.DictReader(f))

    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["image_path"].endswith(w["image_path"])
        for key in ("experiment_id", "case", "delegate_type",
                    "true_class", "predicted_class"):
            assert g[key] == w[key], (key, g, w)
        # Scores: tolerance for cross-version fp drift, tight enough to
        # catch real numerics changes.
        assert float(g["similarity_score"]) == pytest.approx(
            float(w["similarity_score"]), abs=1e-4), (g, w)
