"""Minimum end-to-end slice: images → embed → gallery → delegates →
experiment grid → result CSV/npy/metrics, with the reference's output
layout (results/2025-06-20-1 is the format oracle)."""

import csv
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from retrieval_based_object_detection_tpu.gallery.store import Gallery
from retrieval_based_object_detection_tpu.models.clip.model import (
    CLIPVisionConfig,
    init_params,
)
from retrieval_based_object_detection_tpu.pipelines import analysis
from retrieval_based_object_detection_tpu.pipelines import delegates as dp
from retrieval_based_object_detection_tpu.pipelines import embed as ep
from retrieval_based_object_detection_tpu.pipelines import experiments as xp

TINY = CLIPVisionConfig(image_size=64, patch_size=16, width=64, layers=2,
                        heads=1, embed_dim=32)
CLASSES = ["classA", "classB"]


def _write_images(root: Path, img_type: str, cls: str, n: int, color,
                  suffix=".png", seed=0):
    d = root / f"{img_type}_images" / cls
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        arr = np.zeros((80, 70, 3), np.uint8)
        arr[..., :] = color
        arr += rng.integers(0, 40, arr.shape, dtype=np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}{suffix}")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    base = tmp_path_factory.mktemp("data")
    colors = {"classA": (200, 30, 30), "classB": (30, 30, 200)}
    for stage in ("dataset_cropped", "dataset_segmented"):
        for cls in CLASSES:
            _write_images(base / stage, "original", cls, 4, colors[cls],
                          seed=hash((stage, cls)) % 1000)
            _write_images(base / stage, "natural", cls, 3, colors[cls],
                          seed=hash((stage, cls, "n")) % 1000)
    return base


@pytest.fixture(scope="module")
def populated(dataset):
    gallery = Gallery("e2e", dim=TINY.embed_dim)
    params = init_params(TINY, seed=1)
    encoder = ep.make_encoder(params, TINY)
    counts = {}
    for stage in ("dataset_cropped", "dataset_segmented"):
        for img_type in ("original", "natural"):
            res = ep.embed_tree(gallery, encoder, ep.EmbedConfig(
                root_dir=str(dataset / stage), img_type=img_type,
                image_size=TINY.image_size, batch_size=8,
            ))
            counts[(stage, img_type)] = res
    return gallery, counts


def test_embed_counts_and_payloads(populated):
    gallery, counts = populated
    # 2 stages x (2 classes x (4 original + 3 natural)) = 28 points
    assert len(gallery) == 28
    assert counts[("dataset_cropped", "original")].total == 8
    assert counts[("dataset_segmented", "natural")].total == 6
    from retrieval_based_object_detection_tpu.gallery.schema import Filter
    assert gallery.count(Filter(must={"is_segmented": True})) == 14
    assert gallery.count(Filter(must={"data_type": "natural_images"})) == 12
    assert gallery.count(Filter(must={"is_delegate": True})) == 0


def test_delegate_build(populated):
    gallery, _ = populated
    res = dp.build_delegates(gallery)
    # 2 classes x 2 present cases (pre_a, pre_b) x 2 data_types x 4 types;
    # pre_c skipped because nothing is augmented (mirrors 32:133-135).
    assert res.n_delegates_written == 32
    assert res.member_counts[("classA", "pre_a", "original_images")] == 4
    assert res.member_counts[("classA", "pre_a", "natural_images")] == 3
    assert res.member_counts[("classA", "pre_c", "original_images")] == 0
    from retrieval_based_object_detection_tpu.gallery.schema import Filter
    assert gallery.count(Filter(must={"is_delegate": True})) == 32
    # Idempotent: re-running must not duplicate (deterministic IDs).
    dp.build_delegates(gallery)
    assert gallery.count(Filter(must={"is_delegate": True})) == 32


@pytest.fixture(scope="module")
def experiment_out(populated, dataset, tmp_path_factory):
    gallery, _ = populated
    dp.build_delegates(gallery)
    results_dir = tmp_path_factory.mktemp("results")
    cfg = xp.ExperimentConfig(
        root_dir=str(dataset / "dataset_segmented"),
        results_dir=str(results_dir),
    )
    return xp.run_experiments(gallery, cfg), results_dir


def test_result_rows(experiment_out):
    out, _ = experiment_out
    # 6 natural test images x 2 cases with delegates x 4 dtypes = 48 rows
    assert len(out.rows) == 48
    # Reference ordering: case -> class -> image -> dtype.
    assert out.rows[0].case == "pre_a"
    assert out.rows[0].delegate_type == "average"
    assert out.rows[1].delegate_type == "centroid"
    assert out.rows[4].delegate_type == "average"
    # same_class mode: predicted == true by construction (33:117-121).
    assert all(r.predicted_class == r.true_class for r in out.rows)
    assert all(-1.0 <= r.similarity_score <= 1.0 + 1e-6 for r in out.rows)
    # per-class natural usage counters (33:104-111): incremented once per
    # case the image has a vector in, INCLUDING pre_c where the delegate
    # lookup later comes up empty — 3 imgs x 3 cases = 9.
    assert out.class_image_count == {"classA": 9, "classB": 9}


def test_csv_and_npy_layout(experiment_out):
    out, results_dir = experiment_out
    assert out.csv_path is not None and out.csv_path.exists()
    # Layout: results/<date>-<n>/result_<date>-<n>.csv
    assert out.csv_path.parent.parent == results_dir
    stem = out.csv_path.parent.name
    assert out.csv_path.name == f"result_{stem}.csv"
    with open(out.csv_path) as f:
        reader = csv.reader(f)
        header = next(reader)
        n_rows = sum(1 for _ in reader)
    # Exact column set/order of the committed reference run.
    assert header == ["experiment_id", "case", "delegate_type", "image_path",
                      "true_class", "predicted_class", "similarity_score"]
    assert n_rows == 48
    score_dir = out.csv_path.parent / "score_distribution"
    names = sorted(p.name for p in score_dir.glob("*.npy"))
    assert names == [
        "pre_a_average_scores.npy", "pre_a_centroid_scores.npy",
        "pre_a_medoid_scores.npy", "pre_a_weighted_scores.npy",
        "pre_b_average_scores.npy", "pre_b_centroid_scores.npy",
        "pre_b_medoid_scores.npy", "pre_b_weighted_scores.npy",
    ]
    arr = np.load(score_dir / "pre_a_average_scores.npy")
    assert arr.shape == (6,)


def test_collision_free_result_dirs(tmp_path):
    d1, c1 = xp.allocate_result_dir(tmp_path, today="2026-01-01")
    c1.touch()
    d2, c2 = xp.allocate_result_dir(tmp_path, today="2026-01-01")
    assert d1.name == "2026-01-01-1" and d2.name == "2026-01-01-2"


def test_analysis_artifacts(experiment_out):
    out, _ = experiment_out
    res = analysis.analyze(out.csv_path)
    parent = out.csv_path.parent
    assert (parent / "similarity_score_summary.csv").exists()
    # 8 metric CSVs (2 cases x 4 dtypes), same naming as the reference run.
    metric_files = sorted(p.name for p in (parent / "metrics").glob("*.csv"))
    assert metric_files == [
        f"metrics_{c}_{d}.csv" for c in ("pre_a", "pre_b")
        for d in ("average", "centroid", "medoid", "weighted")
    ]
    # Perfect accuracy in same_class mode.
    m = res["metrics"][("pre_a", "average")]
    assert float(m.loc["accuracy", "precision"]) == 1.0
    # summary has 8 groups with mean/std columns, 4-decimal formatting.
    import pandas as pd
    sdf = pd.read_csv(res["summary_path"])
    assert list(sdf.columns) == ["case", "delegate_type", "mean", "std"]
    assert len(sdf) == 8
    # Plots: cm_*, boxplot, histograms.
    img = sorted(p.name for p in (parent / "img").glob("*.png"))
    assert "similarity_score_distribution.png" in img
    assert "cm_pre_a_average.png" in img
    assert "pre_b_weighted_scores_hist.png" in img
    assert len([n for n in img if n.startswith("cm_")]) == 8
    assert len([n for n in img if n.endswith("_hist.png")]) == 8


def test_nearest_mode(populated, dataset, tmp_path):
    gallery, _ = populated
    dp.build_delegates(gallery)
    cfg = xp.ExperimentConfig(
        root_dir=str(dataset / "dataset_segmented"),
        results_dir=str(tmp_path),
        match_mode="nearest",
    )
    out = xp.run_experiments(gallery, cfg, write_outputs=False)
    assert len(out.rows) == 48
    assert all(r.predicted_class in CLASSES for r in out.rows)
    # nearest-mode score must be >= the same-class score by definition
    # (argmax over all class delegates vs the own-class delegate).
    same = xp.run_experiments(gallery, dataclasses_replace(cfg),
                              write_outputs=False)
    same_score = {(r.case, r.delegate_type, r.image_path):
                  r.similarity_score for r in same.rows}
    assert len(same.rows) == len(out.rows)
    checked = 0
    for r in out.rows:
        key = (r.case, r.delegate_type, r.image_path)
        assert r.similarity_score >= same_score[key] - 1e-6, key
        # And when nearest picks the true class, scores must agree.
        if r.predicted_class == r.true_class:
            assert abs(r.similarity_score - same_score[key]) < 1e-6
            checked += 1
    assert checked > 0


def dataclasses_replace(cfg):
    import dataclasses
    return dataclasses.replace(cfg, match_mode="same_class")


def test_analysis_with_imperfect_nearest_predictions(tmp_path):
    """The 41 stage under REAL errors (every prior exercise had
    predicted == true): accuracy < 1 lands in the metrics CSVs, and a
    prediction naming a class absent from the test set still appears in
    the confusion matrix instead of being silently dropped by sklearn's
    labels= filter."""
    import csv as _csv

    import pandas as pd

    rows = []
    preds = [("cola", "cola"), ("cola", "fanta"), ("fanta", "fanta"),
             ("fanta", "sprite")]  # 'sprite' never a true class
    for i, (true, pred) in enumerate(preds):
        rows.append({
            "experiment_id": "pre_a_average", "case": "pre_a",
            "delegate_type": "average", "image_path": f"/t/{i}.png",
            "true_class": true, "predicted_class": pred,
            "similarity_score": 0.9 - 0.01 * i})
    out = tmp_path / "2026-01-01-1"
    out.mkdir(parents=True)
    csv_path = out / "result_2026-01-01-1.csv"
    with open(csv_path, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    (out / "score_distribution").mkdir()
    np.save(out / "score_distribution" / "pre_a_average_scores.npy",
            np.asarray([r["similarity_score"] for r in rows]))

    res = analysis.analyze(csv_path)
    m = res["metrics"][("pre_a", "average")]
    acc = float(m.loc["accuracy", "precision"])
    assert abs(acc - 0.5) < 1e-6, acc  # 2 of 4 correct
    assert "sprite" in m.index  # predicted-only class present
    mdf = pd.read_csv(out / "metrics" / "metrics_pre_a_average.csv",
                      index_col=0)
    assert abs(float(mdf.loc["accuracy", "precision"]) - 0.5) < 1e-6
    cm_png = out / "img" / "cm_pre_a_average.png"
    assert cm_png.exists()
