"""Review session (12) + manual restore (13) + ingest (01) semantics."""

import numpy as np
import pytest
from PIL import Image

from retrieval_based_object_detection_tpu.pipelines import ingest as ing
from retrieval_based_object_detection_tpu.pipelines import review as R


@pytest.fixture
def labeled_tree(tmp_path, monkeypatch, rng):
    monkeypatch.chdir(tmp_path)  # progress file is cwd-relative
    root = tmp_path / "dataset_jpeg"
    for cls in ("a", "b"):
        d = root / "original_images" / cls
        d.mkdir(parents=True)
        for i in range(2):
            arr = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"x{i}.jpg")
            (d / f"x{i}.txt").write_text(
                "0 0.500000 0.500000 0.500000 0.500000\n"
                "0 0.250000 0.250000 0.200000 0.200000\n")
    return root


def make_cfg(root):
    return R.ReviewConfig(root_dir=str(root), img_type="original")


def test_session_iterates_labeled_only(labeled_tree, tmp_path):
    # Unlabeled image must not appear in the session.
    d = labeled_tree / "original_images" / "a"
    Image.fromarray(np.zeros((10, 10, 3), np.uint8)).save(d / "nolabel.jpg")
    s = R.ReviewSession(make_cfg(labeled_tree))
    assert len(s.items) == 4
    assert all(p.with_suffix(".txt").exists() for p in s.items)


def test_select_box_rewrites_single_line(labeled_tree):
    s = R.ReviewSession(make_cfg(labeled_tree))
    first = s.current
    assert len(s.boxes()) == 2
    assert s.select_box(1)
    lines = (first.with_suffix(".txt")).read_text().strip().splitlines()
    assert len(lines) == 1
    # Second box of an 80x60 image: xc 0.25 yc 0.25 w 0.2 h 0.2 ->
    # pixel (12,9)-(28,21) -> renormalised back to the same values.
    vals = [float(v) for v in lines[0].split()[1:]]
    assert abs(vals[0] - 0.25) < 0.01 and abs(vals[2] - 0.2) < 0.01
    assert s.pos == 1  # advanced


def test_render_draws_boxes(labeled_tree):
    s = R.ReviewSession(make_cfg(labeled_tree))
    img = s.render()
    assert img.shape == (60, 80, 3)
    # Red box pixels present.
    assert (img[:, :, 0] > 200).sum() > ((img[:, :, 1] > 200).sum())


def test_progress_resume_and_completion(labeled_tree, tmp_path):
    s = R.ReviewSession(make_cfg(labeled_tree))
    s.next()
    s.next()
    progress = tmp_path / R.PROGRESS_FILE
    assert progress.exists()
    saved = progress.read_text()

    # New session resumes at the saved item.
    s2 = R.ReviewSession(make_cfg(labeled_tree))
    assert str(s2.current) == saved
    assert s2.pos == 2

    # Completing the pass deletes the progress file (12:322-323).
    while not s2.done:
        s2.next()
    assert not progress.exists()


def test_move_to_manual_and_restore(labeled_tree, tmp_path):
    s = R.ReviewSession(make_cfg(labeled_tree))
    cfg = s.cfg
    victim = s.current
    moved = s.move_to_manual()
    assert moved.exists()
    assert moved.parent.parent.name == "dataset_manual"
    assert not victim.exists()
    assert not victim.with_suffix(".txt").exists()  # label deleted
    assert len(s.items) == 3

    # Restore: image without label stays (13:49-51).
    res = R.restore_manual_labeled(
        manual_dir=cfg.manual_dir, dst_root=str(labeled_tree),
        img_type="original")
    assert res.n_restored == 0 and res.n_skipped_no_label == 1

    # Give it a label -> restored next run.
    moved.with_suffix(".txt").write_text("0 0.5 0.5 0.5 0.5\n")
    res = R.restore_manual_labeled(
        manual_dir=cfg.manual_dir, dst_root=str(labeled_tree),
        img_type="original")
    assert res.n_restored == 1
    assert victim.exists() and victim.with_suffix(".txt").exists()


def test_redetect_with_saliency(labeled_tree):
    from retrieval_based_object_detection_tpu.models.detector import (
        SaliencyProposer,
    )

    d = labeled_tree / "original_images" / "a"
    img = np.full((120, 160, 3), 235, np.uint8)
    img[30:90, 40:120] = (200, 30, 30)
    Image.fromarray(img).save(d / "zz_product.jpg")
    (d / "zz_product.txt").write_text("0 0.9 0.9 0.1 0.1\n")  # a bad label

    s = R.ReviewSession(make_cfg(labeled_tree), detector=SaliencyProposer())
    while s.current.name != "zz_product.jpg":
        s.next()
    candidates = s.redetect()
    assert candidates, "detector should propose at least one box"
    x1, y1, x2, y2 = candidates[0]
    assert abs(x1 - 40) < 15 and abs(x2 - 120) < 15
    s.replace_label(candidates[0])
    vals = [float(v) for v in
            s.current.with_suffix(".txt").read_text().split()[1:]]
    assert abs(vals[0] - 0.5) < 0.1  # recentred on the product


# ------------------------------------------------------------ ingest (01)
def test_ingest(tmp_path, rng):
    src = tmp_path / "dataset_heic" / "original_images" / "cls"
    src.mkdir(parents=True)
    for name in ("one.png", "two.png", "dup (1).png"):
        arr = rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)
        Image.fromarray(arr).save(src / name)
    (src / "broken.jpg").write_bytes(b"not an image")

    cfg = ing.IngestConfig(src_root=str(tmp_path / "dataset_heic"),
                           dst_root=str(tmp_path / "dataset_jpeg"),
                           img_type="original")
    res = ing.run_ingest(cfg)
    assert res.n_converted == 2
    assert res.n_skipped_duplicate == 1
    assert res.n_failed == 1
    out = tmp_path / "dataset_jpeg" / "original_images" / "cls"
    assert sorted(p.name for p in out.iterdir()) == ["one.jpeg", "two.jpeg"]

    # Idempotent: second run skips existing outputs (01:143-145).
    res2 = ing.run_ingest(cfg)
    assert res2.n_converted == 0 and res2.n_skipped_existing == 2


def test_duplicate_pattern():
    assert ing.is_duplicate_name("IMG_0001 (2).HEIC")
    assert ing.is_duplicate_name("a(13).jpg")
    assert not ing.is_duplicate_name("IMG_0001.HEIC")
    assert not ing.is_duplicate_name("shot_(final).png")
