"""SAM-style segmenter: shapes, predictor interface, pipeline contracts."""

import numpy as np
import pytest
from PIL import Image

from retrieval_based_object_detection_tpu.models.sam import model as SM
from retrieval_based_object_detection_tpu.models.sam import encoder as SE
from retrieval_based_object_detection_tpu.models.sam import decoder as SD
from retrieval_based_object_detection_tpu.pipelines import segment as seg


@pytest.fixture(scope="module")
def sam():
    params = SM.init_params(SM.SAM_TINY, seed=0)
    return SM.SamPredictor(params, SM.SAM_TINY)


def test_encoder_shapes(rng):
    cfg = SM.SAM_TINY.encoder
    params = SE.init_params(cfg, seed=0)
    x = rng.normal(size=(2, cfg.img_size, cfg.img_size, 3)).astype(np.float32)
    emb = SE.forward(params, x, cfg)
    assert emb.shape == (2, cfg.grid, cfg.grid, cfg.out_chans)
    assert np.isfinite(np.asarray(emb)).all()


def test_window_partition_roundtrip(rng):
    import jax.numpy as jnp

    x = jnp.asarray(rng.normal(size=(2, 10, 14, 8)).astype(np.float32))
    wins, hw_pad = SE._window_partition(x, 4)
    back = SE._window_unpartition(wins, 4, hw_pad, (10, 14))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_decoder_shapes(rng):
    cfg = SM.SAM_TINY
    dec = SD.init_params(cfg.decoder, seed=1)
    g = cfg.encoder.grid
    emb = rng.normal(size=(1, g, g, cfg.decoder.embed_dim)).astype(np.float32)
    pts = np.array([[[0.5, 0.5]]], np.float32)
    lbl = np.array([[1]], np.int32)
    masks, iou = SD.decode_masks(dec, emb, pts, lbl, cfg.decoder)
    assert masks.shape == (1, 4, 4 * g, 4 * g)
    assert iou.shape == (1, 4)


def test_predictor_encode_once_predict_many(sam, rng):
    img = rng.integers(0, 255, (96, 120, 3), dtype=np.uint8)
    sam.set_image(img)
    m1, s1 = sam.predict(np.array([[60.0, 48.0]]), np.array([1]))
    m2, s2 = sam.predict(np.array([[10.0, 10.0]]), np.array([1]))
    assert m1.shape == (3, 96, 120) and s1.shape == (3,)
    assert m1.dtype == bool
    # Different prompts can differ without re-encoding.
    assert m1.shape == m2.shape


def test_predictor_single_mask_mode(sam, rng):
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    sam.set_image(img)
    m, s = sam.predict(np.array([[32.0, 32.0]]), np.array([1]),
                       multimask_output=False)
    assert m.shape == (1, 64, 64) and s.shape == (1,)


def test_apply_mask_rgba():
    rgb = np.full((4, 5, 3), 7, np.uint8)
    mask = np.zeros((4, 5), bool)
    mask[1:3, 2:4] = True
    rgba = seg.apply_mask_rgba(rgb, mask)
    assert rgba.shape == (4, 5, 4)
    assert rgba[1, 2, 3] == 255 and rgba[0, 0, 3] == 0
    np.testing.assert_array_equal(rgba[..., :3], rgb)


def test_auto_segment_pipeline(tmp_path, sam, rng):
    src = tmp_path / "dataset_cropped" / "original_images" / "cls"
    src.mkdir(parents=True)
    for i in range(2):
        arr = rng.integers(0, 255, (70, 90, 3), dtype=np.uint8)
        Image.fromarray(arr).save(src / f"c{i}.jpg")
    (src / "broken.jpg").write_bytes(b"nope")

    res = seg.run_auto_segment(seg.SegmentConfig(
        src_root=str(tmp_path / "dataset_cropped"),
        dst_root=str(tmp_path / "dataset_segmented"),
        img_type="original"), sam)
    assert res.n_segmented == 2 and res.n_failed == 1
    out = tmp_path / "dataset_segmented" / "original_images" / "cls"
    names = sorted(p.name for p in out.iterdir())
    assert names == ["c0.png", "c1.png"]  # <stem>.png contract (22a:157)
    rgba = np.asarray(Image.open(out / "c0.png"))
    assert rgba.shape == (70, 90, 4)


def test_manual_session(tmp_path, sam, rng):
    d = tmp_path / "cls"
    d.mkdir()
    for i in range(3):
        arr = rng.integers(0, 255, (50, 60, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"m{i}.jpg")

    s = seg.ManualSegmentSession(sam, d)
    assert len(s.items) == 3
    s.load()
    masks, scores = s.click(30, 25)
    assert masks.shape[0] == 3
    out = s.save(int(np.argmax(scores)))
    assert out.name == "m0_rmbg.png"
    assert np.asarray(Image.open(out)).shape == (50, 60, 4)

    # Unprocessed-only listing skips m0 now (22m:76-84 stem diff).
    s2 = seg.ManualSegmentSession(sam, d, only_unprocessed=True)
    assert [p.name for p in s2.items] == ["m1.jpg", "m2.jpg"]
    s3 = seg.ManualSegmentSession(sam, d, only_unprocessed=False)
    assert len(s3.items) == 3


def test_segment_batch_matches_per_image(rng):
    """Batched encode/decode must reproduce the set_image/predict path
    (same centre-point prompt, same best-of-3 candidates)."""
    from retrieval_based_object_detection_tpu.models.sam import model as SM

    sam = SM.SamPredictor(SM.init_params(SM.SAM_TINY, 0), SM.SAM_TINY)
    imgs = [rng.integers(0, 255, (60, 80, 3), dtype=np.uint8),
            rng.integers(0, 255, (90, 50, 3), dtype=np.uint8)]
    batched = sam.segment_batch(imgs)
    for img, (masks_b, iou_b) in zip(imgs, batched):
        h, w = img.shape[:2]
        sam.set_image(img)
        masks_s, iou_s = sam.predict(np.array([[w / 2, h / 2]]),
                                     np.array([1]), multimask_output=True)
        np.testing.assert_allclose(iou_b, iou_s, atol=1e-5)
        assert (masks_b == masks_s).mean() > 0.999


def test_segment_batch_multi_point_and_labels(rng):
    """Batched prompts honour ALL P points and fg/bg labels, matching the
    per-image predict path."""
    from retrieval_based_object_detection_tpu.models.sam import model as SM

    sam = SM.SamPredictor(SM.init_params(SM.SAM_TINY, 0), SM.SAM_TINY)
    img = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
    pts = np.array([[20.0, 15.0], [60.0, 45.0]])
    lbl = np.array([1, 0])
    (masks_b, iou_b), = sam.segment_batch([img], point_coords=[pts],
                                          point_labels=[lbl])
    sam.set_image(img)
    masks_s, iou_s = sam.predict(pts, lbl, multimask_output=True)
    np.testing.assert_allclose(iou_b, iou_s, atol=1e-5)
    assert (masks_b == masks_s).mean() > 0.999
    # Mismatched P is an explicit error, not silent truncation.
    import pytest

    with pytest.raises(ValueError, match="prompt points"):
        sam.segment_batch([img, img],
                          point_coords=[pts, pts[:1]])
