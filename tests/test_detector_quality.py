"""Detection-quality regression gates (VERDICT #6).

The proposer fills the reference's YOLOv8s slot; these thresholds pin the
measured IoU@0.5 recall on the synthetic scene families of
``benchmarks/detector_quality.py`` (full-size run: studio 1.00 / 0.97
mean IoU, cluttered 0.97 / 0.85 — round-1 global-quantile box scored
0.34 / 0.45 on cluttered)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.detector_quality import evaluate  # noqa: E402

from retrieval_based_object_detection_tpu.models.detector import (  # noqa: E402,E501
    SaliencyProposer,
)


@pytest.fixture(scope="module")
def proposer():
    return SaliencyProposer()


def test_studio_quality(proposer):
    m = evaluate(proposer, "studio", n=24, seed=1)
    assert m["recall@0.5"] >= 0.95, m
    assert m["mean_iou"] >= 0.90, m
    assert m["detected_frac"] >= 0.95, m


def test_cluttered_quality(proposer):
    m = evaluate(proposer, "cluttered", n=24, seed=1)
    assert m["recall@0.5"] >= 0.85, m
    assert m["mean_iou"] >= 0.70, m
    assert m["detected_frac"] >= 0.90, m
