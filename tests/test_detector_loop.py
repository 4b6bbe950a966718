"""TinyDet fit-from-tree driver: learns from saliency-produced labels."""

import numpy as np
import pytest
from PIL import Image

from retrieval_based_object_detection_tpu.models.detector import tinydet
from retrieval_based_object_detection_tpu.pipelines import labeling as L
from retrieval_based_object_detection_tpu.train import detector_loop as DL

CFG = tinydet.TinyDetConfig(image_size=64, channels=(16, 32), head_dim=32,
                            max_det=4)


@pytest.fixture
def labeled_tree(tmp_path, rng):
    d = tmp_path / "original_images" / "cls"
    d.mkdir(parents=True)
    for i in range(8):
        img = np.full((96, 128, 3), 235, np.uint8)
        img[24:72, 32:96] = (200, 40, 40)
        img = np.clip(img + rng.integers(0, 8, img.shape), 0, 255
                      ).astype(np.uint8)
        Image.fromarray(img).save(d / f"i{i}.jpg")
    # Label with the saliency proposer (the bootstrap path).
    res = L.run_labeling(L.LabelConfig(root_dir=str(tmp_path),
                                       img_type="original", batch_size=8))
    assert res.labeled == 8
    return tmp_path


def test_fit_detector_and_detect(labeled_tree):
    params, metrics = DL.fit_detector(
        CFG, DL.DetFitConfig(root_dir=str(labeled_tree), epochs=150,
                             batch_size=8, learning_rate=3e-3))
    assert np.isfinite(metrics["loss"])

    det = DL.TinyDetDetector(params, CFG)
    canvas, scale = L.letterbox(
        np.asarray(Image.open(
            labeled_tree / "original_images" / "cls" / "i0.jpg")), 64)
    boxes, scores = det(canvas[None])
    assert scores[0, 0] > 0.25, scores[0]
    x1, y1, x2, y2 = boxes[0, 0] / scale
    # Object is at (32,24)-(96,72) in the original image.
    assert x1 < 45 and x2 > 80 and y1 < 38 and y2 > 60, boxes[0, 0] / scale


def test_fit_detector_errors(tmp_path):
    (tmp_path / "original_images" / "c").mkdir(parents=True)
    with pytest.raises(ValueError, match="no labeled"):
        DL.fit_detector(CFG, DL.DetFitConfig(root_dir=str(tmp_path)))
