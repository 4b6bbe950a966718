"""Image ops + crop/augment pipeline stages."""

import numpy as np
import pytest
from PIL import Image

from retrieval_based_object_detection_tpu.ops import image as I
from retrieval_based_object_detection_tpu.pipelines import augment as A
from retrieval_based_object_detection_tpu.pipelines import crop as C


# ------------------------------------------------------------ brightness
def test_brightness_matches_pil(rng):
    arr = rng.integers(0, 255, (40, 30, 4), dtype=np.uint8)
    img = Image.fromarray(arr, "RGBA")
    from PIL import ImageEnhance

    for rate in (1.2, 0.8):
        ref = np.asarray(ImageEnhance.Brightness(img).enhance(rate))
        got = np.asarray(I.brightness(arr.astype(np.float32), rate))
        assert np.abs(got - ref.astype(np.float32)).max() <= 1.0


# ------------------------------------------------------------ rotation
@pytest.mark.parametrize("angle", [30, 90, 180, 330])
def test_rotate_expand_size_matches_pil(angle, rng):
    arr = rng.integers(0, 255, (37, 53, 4), dtype=np.uint8)
    ref = Image.fromarray(arr, "RGBA").rotate(
        angle, expand=True, fillcolor=(0, 0, 0, 0))
    got = np.asarray(I.rotate_expand(arr.astype(np.float32), float(angle)))
    assert (got.shape[1], got.shape[0]) == ref.size
    # Content correlation with PIL (both nearest): overwhelming majority
    # of pixels identical.
    ref_a = np.asarray(ref).astype(np.float32)
    same = (np.abs(got - ref_a).max(axis=-1) < 1).mean()
    assert same > 0.9, same


def test_rotate_90_exact(rng):
    arr = rng.integers(0, 255, (20, 31, 3), dtype=np.uint8).astype(np.float32)
    got = np.asarray(I.rotate_expand(arr, 90.0))
    ref = np.asarray(Image.fromarray(arr.astype(np.uint8)).rotate(
        90, expand=True))
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got.astype(np.uint8), ref)


# ------------------------------------------------------------ noise
def test_gaussian_noise_statistics(rng):
    import jax

    x = np.full((64, 64, 3), 128.0, np.float32)
    out = np.asarray(I.gaussian_noise(x, 0.02, jax.random.key(0)))
    d = out - x
    assert abs(d.mean()) < 0.1
    assert abs(d.std() - 25 * 0.02) < 0.05
    assert out.min() >= 0 and out.max() <= 255


def test_salt_pepper_fraction(rng):
    import jax

    x = np.full((100, 100, 4), 128.0, np.float32)
    out = np.asarray(I.salt_pepper(x, 0.03, jax.random.key(1)))
    changed = (out != x).any(axis=-1)
    frac = changed.mean()
    assert 0.02 < frac < 0.04
    vals = out[changed]
    assert set(np.unique(vals)) <= {0.0, 255.0}


def test_blur_smooths(rng):
    x = rng.integers(0, 255, (32, 32, 3)).astype(np.float32)
    out = np.asarray(I.gaussian_blur(x, 4))
    assert out.std() < x.std()
    assert out.shape == x.shape
    # Constant image unchanged.
    const = np.full((16, 16, 3), 77.0, np.float32)
    np.testing.assert_allclose(np.asarray(I.gaussian_blur(const, 2)), const,
                               atol=1.0)


# ------------------------------------------------------------ crop math
def test_margin_rule():
    # 100x100 box at (100,100)-(200,200) in a 300x250 image, 20% margin.
    out = I.expand_box_with_margin((100, 100, 200, 200), 300, 250, 0.2)
    np.testing.assert_array_equal(out, [80, 80, 220, 220])
    # Clamping at borders.
    out = I.expand_box_with_margin((0, 0, 100, 100), 120, 90, 0.2)
    np.testing.assert_array_equal(out, [0, 0, 120, 90])


def test_yolo_roundtrip():
    box = (0, 0.5, 0.5, 0.4, 0.2)  # cls, xc, yc, w, h in a 200x100 image
    assert C.yolo_to_xyxy(box, 200, 100) == (60, 40, 140, 60)


def test_crop_pipeline(tmp_path, rng):
    src = tmp_path / "dataset_jpeg" / "original_images" / "cls1"
    src.mkdir(parents=True)
    arr = rng.integers(0, 255, (100, 200, 3), dtype=np.uint8)
    Image.fromarray(arr).save(src / "a.jpg")
    (src / "a.txt").write_text("0 0.5 0.5 0.4 0.2\n0 0.25 0.25 0.1 0.1\n")
    Image.fromarray(arr).save(src / "nolabel.jpg")
    Image.fromarray(arr).save(src / "empty.jpg")
    (src / "empty.txt").write_text("\n")

    res = C.run_crop(C.CropConfig(
        src_root=str(tmp_path / "dataset_jpeg"),
        dst_root=str(tmp_path / "dataset_cropped"),
        img_type="original",
    ))
    assert res.n_objects == 2
    assert res.n_no_label == 1
    assert res.n_empty_label == 1
    out_dir = tmp_path / "dataset_cropped" / "original_images" / "cls1"
    names = sorted(p.name for p in out_dir.iterdir())
    assert names == ["a_cropped_obj0.jpg", "a_cropped_obj1.jpg"]
    # obj0: box (60,40)-(140,60) + 20% margin (16,4) -> (44,36)-(156,64)
    crop0 = np.asarray(Image.open(out_dir / "a_cropped_obj0.jpg"))
    assert crop0.shape == (28, 112, 3)


# ------------------------------------------------------------ augment
def test_variant_names_cover_reference_grid():
    cfg = A.AugmentConfig()
    names = A.variant_names("x", ".png", cfg)
    assert len(names) == 6 + 11 + 9  # 26 variants (snp bug fixed)
    # NB: the brightness postfix inherits the reference's float-truncation
    # quirk — int((1.2-1)*100) == 19 — so rate 1.2 yields p19, not p20
    # (filename compatibility with reference artifacts).
    assert "x_brightness_p19.png" in names
    assert "x_brightness_n5.png" in names
    assert "x_rot330.png" in names
    assert "x_gaussiannoise_1.png" in names
    assert "x_blurnoise_3.png" in names
    assert "x_snpnoise_2.png" in names  # produced, unlike the reference


def test_augment_pipeline(tmp_path, rng):
    src = tmp_path / "dataset_segmented" / "original_images" / "cls1"
    src.mkdir(parents=True)
    arr = rng.integers(0, 255, (40, 30, 4), dtype=np.uint8)
    Image.fromarray(arr, "RGBA").save(src / "seg.png")

    cfg = A.AugmentConfig(
        src_root=str(tmp_path / "dataset_segmented"),
        dst_root=str(tmp_path / "dataset_augmented"),
        img_type="original",
    )
    res = A.run_augment(cfg)
    assert res.n_inputs == 1 and res.n_written == 26 and res.n_failed == 0
    out_dir = tmp_path / "dataset_augmented" / "original_images" / "cls1"
    got = sorted(p.name for p in out_dir.iterdir())
    assert got == sorted(A.variant_names("seg", ".png", cfg))
    # Rotations preserve RGBA and expand the canvas.
    rot = np.asarray(Image.open(out_dir / "seg_rot30.png"))
    assert rot.shape[2] == 4
    assert rot.shape[0] > 40 and rot.shape[1] > 30
    # Determinism: same seed -> same bytes.
    res2 = A.run_augment(cfg)
    rot2 = np.asarray(Image.open(out_dir / "seg_rot30.png"))
    np.testing.assert_array_equal(rot, rot2)


def test_crop_filename_index_skips_malformed_line_slot(tmp_path, rng):
    """A malformed label line keeps its slot in the output numbering
    (reference enumerates raw non-blank lines and `continue`s), so the
    files are obj0 and obj2 — never renumbered to obj0/obj1. Downstream
    point ids are MD5-of-path; renumbering would shift identities."""
    src = tmp_path / "dataset_jpeg" / "original_images" / "cls1"
    src.mkdir(parents=True)
    arr = rng.integers(0, 255, (100, 200, 3), dtype=np.uint8)
    Image.fromarray(arr).save(src / "a.jpg")
    (src / "a.txt").write_text(
        "0 0.5 0.5 0.4 0.2\n0 0.1 0.1 0.1\n0 0.25 0.25 0.1 0.1\n")
    # All-malformed file: writes nothing but is NOT an empty-label skip.
    Image.fromarray(arr).save(src / "bad.jpg")
    (src / "bad.txt").write_text("not a label\n")
    res = C.run_crop(C.CropConfig(
        src_root=str(tmp_path / "dataset_jpeg"),
        dst_root=str(tmp_path / "dataset_cropped"),
        img_type="original",
    ))
    assert res.n_objects == 2 and res.n_empty_label == 0
    out_dir = tmp_path / "dataset_cropped" / "original_images" / "cls1"
    names = sorted(p.name for p in out_dir.iterdir())
    assert names == ["a_cropped_obj0.jpg", "a_cropped_obj2.jpg"]


def test_yolo_crop_bounds_margin_uses_float_dims():
    """margin = int(FLOAT bbox_w * ratio): w=14.9 px truncates to a
    15-px corner span, whose 20% margin would round to 3; the reference
    takes int(14.9*0.2)=2 from the float width."""
    box = (0, 0.5, 0.5, 0.149, 0.149)  # 14.9 px in a 100x100 image
    x1, y1, x2, y2 = C.yolo_crop_bounds(box, 100, 100, 0.2)
    assert (x1, y1, x2, y2) == (42 - 2, 42 - 2, 57 + 2, 57 + 2)
