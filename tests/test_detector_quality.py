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


def test_confidence_discriminates_ambiguity(proposer):
    """Confidence = winner blob's share of total foreground mass, so it
    must DROP toward ~0.5 when a second, equally salient object competes
    (a pure winner-vs-runner-up dominance ratio would floor at 0.5 and
    stay ~1.0 here, making labeling's 0.25 gate dead)."""
    import numpy as np

    from benchmarks.detector_quality import _paint_shape

    rng = np.random.default_rng(3)
    one = np.full((240, 320, 3), 225, np.float32)
    _paint_shape(one, rng, 120, 90, 45, 40, (180, 30, 30))
    two = one.copy()
    _paint_shape(two, rng, 120, 240, 45, 40, (30, 30, 180))
    _, conf = proposer(np.stack([one, two]).astype(np.uint8))
    assert conf[0, 0] > 0.85, conf
    assert conf[1, 0] < 0.65, conf
    assert conf[0, 0] - conf[1, 0] > 0.25, conf


def test_tinydet_trained_quality():
    """The trainable detector (the YOLOv8s slot's learned option) must
    reach high IoU recall on BOTH scene families when fit on synthetic
    labeled data (full run: 1.0/1.0 recall, ~0.78 mean IoU)."""
    from benchmarks.detector_quality import evaluate_tinydet

    m = evaluate_tinydet(epochs=20)
    assert m["studio"]["recall@0.5"] >= 0.85, m
    assert m["cluttered"]["recall@0.5"] >= 0.8, m


def test_two_object_scene_yields_two_boxes(proposer):
    """The YOLO slot's top-K contract: a scene with two objects produces
    two blob boxes (best first), each covering its own object."""
    import numpy as np

    from benchmarks.detector_quality import _paint_shape, iou

    rng = np.random.default_rng(4)
    img = np.full((240, 320, 3), 225, np.float32)
    _paint_shape(img, rng, 120, 85, 45, 40, (180, 30, 30))
    _paint_shape(img, rng, 120, 240, 45, 40, (30, 30, 180))
    boxes, conf = proposer(img[None].astype(np.uint8))
    assert boxes.shape == (1, 4, 4) and conf.shape == (1, 4)
    assert conf[0, 0] >= conf[0, 1] > 0.2
    gts = [np.array([45, 75, 125, 165]), np.array([200, 75, 280, 165])]
    pair = [max(iou(np.asarray(boxes[0, k]), gt) for gt in gts)
            for k in range(2)]
    assert min(pair) > 0.5, (boxes, pair)
    # ...and they hit DIFFERENT objects.
    best = [int(np.argmax([iou(np.asarray(boxes[0, k]), gt) for gt in gts]))
            for k in range(2)]
    assert best[0] != best[1]
