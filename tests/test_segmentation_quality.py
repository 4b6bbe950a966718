"""SAM fitting loop + segmentation quality gate (VERDICT r2 #4/#5).

Full numbers live in benchmarks/segmentation_quality.py (fitted 0.92 /
0.89 mean IoU, IoU@0.5 = 1.0 on held-out studio/cluttered scenes vs a
0.27 random-init floor — DESIGN.md). The test runs a scaled-down fit
and gates that training lifts center-point best-of-3 mask quality far
above the floor — a regression in encoder, decoder, conversion of
prompts, or the loss recipe all show up here.
"""

import numpy as np
import pytest

from benchmarks.segmentation_quality import (
    _bench_config,
    _scenes,
    evaluate_predictor,
    make_masked_scene,
    mask_iou,
)
from retrieval_based_object_detection_tpu.models.sam import model as SM
from retrieval_based_object_detection_tpu.train.sam_loop import (
    SamFitConfig,
    _downsample_masks,
    fit_sam,
)


def test_downsample_masks_area_mean():
    m = np.zeros((1, 8, 8), bool)
    m[0, :4, :4] = True
    out = _downsample_masks(m, 4)
    assert out.shape == (1, 4, 4)
    np.testing.assert_allclose(out[0, :2, :2], 1.0)
    np.testing.assert_allclose(out[0, 2:, :], 0.0)
    half = _downsample_masks(m, 2)[0]
    np.testing.assert_allclose(half, [[1.0, 0.0], [0.0, 0.0]])


def test_masked_scene_contract():
    rng = np.random.default_rng(0)
    img, m = make_masked_scene(rng, "cluttered", 64)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert m.shape == (64, 64) and m.dtype == bool
    # The center-point prompt must land on the object.
    assert m[32, 32]
    assert 0.05 < m.mean() < 0.8
    assert mask_iou(m, m) == 1.0


def test_fit_sam_lifts_mask_iou_above_floor():
    config = _bench_config()
    rng = np.random.default_rng(1)
    tr_imgs, tr_gts = _scenes(rng, "studio", 64, config.img_size)
    fitted, metrics = fit_sam(
        config, np.stack(tr_imgs), np.stack(tr_gts),
        cfg=SamFitConfig(epochs=25, seed=1))
    assert metrics["train_best_iou"] > 0.5

    te_imgs, te_gts = _scenes(np.random.default_rng(99), "studio", 8,
                              config.img_size)
    fit_m = evaluate_predictor(SM.SamPredictor(fitted, config),
                               te_imgs, te_gts)
    floor_m = evaluate_predictor(
        SM.SamPredictor(SM.init_params(config, seed=1), config),
        te_imgs, te_gts)
    assert fit_m["mean_iou"] > 0.5, (fit_m, floor_m)
    assert fit_m["mean_iou"] > floor_m["mean_iou"] + 0.2, (fit_m, floor_m)


def test_fit_sam_cli_and_segment_roundtrip(tmp_path):
    """rbod fit-sam on a dataset_segmented tree (RGBA alpha = mask) ->
    checkpoint dir -> rbod segment loads it back (the self-training
    loop: reviewed segmentations fine-tune the model for the rest)."""
    from PIL import Image

    from retrieval_based_object_detection_tpu.cli.main import main

    rng = np.random.default_rng(3)
    seg = tmp_path / "dataset_segmented" / "original_images" / "clsA"
    seg.mkdir(parents=True)
    for i in range(8):
        img, m = make_masked_scene(rng, "studio", 64)
        rgba = np.dstack([img, (m * 255).astype(np.uint8)])
        Image.fromarray(rgba).save(seg / f"s{i}.png")

    out = tmp_path / "sam_ft"
    assert main(["fit-sam", "--root", str(tmp_path / "dataset_segmented"),
                 "--epochs", "2", "--batch-size", "4",
                 "--out", str(out)]) == 0
    assert (out / "sam_config.json").exists()

    src = tmp_path / "dataset_jpeg" / "original_images" / "clsA"
    src.mkdir(parents=True)
    for i in range(2):
        img, _ = make_masked_scene(rng, "studio", 64)
        Image.fromarray(img).save(src / f"j{i}.jpg")
    dst = tmp_path / "dataset_segmented_out"
    assert main(["segment", "--src", str(tmp_path / "dataset_jpeg"),
                 "--dst", str(dst), "--type", "original",
                 "--sam-checkpoint", str(out)]) == 0
    outs = list((dst / "original_images" / "clsA").glob("*.png"))
    assert len(outs) == 2
    rgba = np.asarray(Image.open(outs[0]).convert("RGBA"))
    assert rgba.shape[-1] == 4
