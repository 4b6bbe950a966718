"""Edge-path coverage: nearest-mode classification, mixed delete,
post-compaction integrity, imperfect-prediction analysis, profiler hook."""

import numpy as np
import pytest
from PIL import Image

from retrieval_based_object_detection_tpu.gallery import Filter, Payload
from retrieval_based_object_detection_tpu.gallery.store import Gallery


def well_separated_vectors(rng, n_classes=3, per_class=10, dim=32):
    """Class clusters with near-orthogonal centers."""
    centers = np.linalg.qr(rng.normal(size=(dim, dim)))[0][:n_classes]
    vecs, classes = [], []
    for ci in range(n_classes):
        v = centers[ci][None] + 0.05 * rng.normal(size=(per_class, dim))
        vecs.append(v)
        classes += [f"class{ci}"] * per_class
    return np.concatenate(vecs).astype(np.float32), classes


def test_nearest_mode_classifies_correctly(tmp_path, rng):
    """With separable clusters, nearest-delegate == true class."""
    from retrieval_based_object_detection_tpu.pipelines import (
        delegates as dp,
        experiments as xp,
    )

    dim = 32
    vecs, classes = well_separated_vectors(rng, dim=dim)
    g = Gallery("t", dim=dim)

    # Natural test images live in a fake segmented tree.
    root = tmp_path / "dataset_segmented"
    ids, payloads, img_paths = [], [], []
    for i, (v, c) in enumerate(zip(vecs, classes)):
        d = root / "natural_images" / c
        d.mkdir(parents=True, exist_ok=True)
        p = d / f"v{i}.png"
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(p)
        ids.append(f"id{i}")
        img_paths.append(str(p))
        payloads.append(Payload(data_type="natural_images", class_name=c,
                                img_path=str(p), is_segmented=True))
    g.upsert(ids, vecs, payloads)
    dp.build_delegates(g)

    out = xp.run_experiments(g, xp.ExperimentConfig(
        root_dir=str(root), match_mode="nearest"), write_outputs=False)
    assert out.rows
    for r in out.rows:
        assert r.predicted_class == r.true_class, r
    # same_class mode gives identical scores here (correct predictions).
    out2 = xp.run_experiments(g, xp.ExperimentConfig(
        root_dir=str(root), match_mode="same_class"), write_outputs=False)
    s1 = {(r.image_path, r.experiment_id): r.similarity_score
          for r in out.rows}
    for r in out2.rows:
        assert abs(s1[(r.image_path, r.experiment_id)]
                   - r.similarity_score) < 1e-6


def test_analysis_with_imperfect_predictions(tmp_path):
    """Confusion matrix + report handle off-diagonal predictions."""
    import csv

    from retrieval_based_object_detection_tpu.pipelines import analysis

    rows = []
    for i in range(10):
        pred = "b" if i < 3 else "a"  # 3 misclassifications
        rows.append({"experiment_id": "pre_a_average", "case": "pre_a",
                     "delegate_type": "average", "image_path": f"/x{i}.png",
                     "true_class": "a", "predicted_class": pred,
                     "similarity_score": 0.9})
    for i in range(10):
        rows.append({"experiment_id": "pre_a_average", "case": "pre_a",
                     "delegate_type": "average", "image_path": f"/y{i}.png",
                     "true_class": "b", "predicted_class": "b",
                     "similarity_score": 0.8})
    out = tmp_path / "result_x.csv"
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    res = analysis.analyze(out, make_plots=False)
    m = res["metrics"][("pre_a", "average")]
    assert abs(float(m.loc["accuracy", "precision"]) - 0.85) < 1e-6
    assert float(m.loc["a", "recall"]) == 0.7


def test_delete_by_ids_and_filter_together(rng):
    g = Gallery("t", dim=8)
    vecs = rng.normal(size=(10, 8)).astype(np.float32)
    g.upsert([f"p{i}" for i in range(10)], vecs,
             [Payload(data_type="x", class_name="a" if i < 5 else "b",
                      img_path=f"/{i}.png") for i in range(10)])
    removed = g.delete(ids=["p7"], flt=Filter(must={"class_name": "a"}))
    assert removed == 6
    assert len(g) == 4
    # Column codes survive compaction: filters still work.
    assert g.count(Filter(must={"class_name": "b"})) == 4
    assert g.get_by_path("/8.png").id == "p8"
    # Search returns only survivors.
    hits = g.search(vecs[8], k=10)[0]
    assert {h.id for h in hits} == {"p5", "p6", "p8", "p9"}


def test_search_bf16_mode(rng):
    g = Gallery("t", dim=64)
    vecs = rng.normal(size=(100, 64)).astype(np.float32)
    g.upsert([f"p{i}" for i in range(100)], vecs,
             [Payload(data_type="x", class_name="c")] * 100)
    exact = g.search(vecs[3], k=5, method="exact")[0]
    fast = g.search(vecs[3], k=5, method="bf16")[0]
    assert exact[0].id == fast[0].id == "p3"


def test_profile_trace_noop_and_real(tmp_path):
    from retrieval_based_object_detection_tpu.utils.logging import (
        profile_trace,
    )

    with profile_trace(None):  # no-op path
        pass
    import jax.numpy as jnp

    with profile_trace(tmp_path / "trace"):
        float(jnp.sum(jnp.ones((8, 8))))
    assert any((tmp_path / "trace").rglob("*")), "no trace artifacts"


def test_upsert_changes_class_updates_codes(rng):
    """Re-upserting a point with a different class must re-filter correctly."""
    g = Gallery("t", dim=4)
    v = rng.normal(size=(1, 4)).astype(np.float32)
    g.upsert(["x"], v, [Payload(data_type="d", class_name="old")])
    g.upsert(["x"], v, [Payload(data_type="d", class_name="new")])
    assert g.count(Filter(must={"class_name": "old"})) == 0
    assert g.count(Filter(must={"class_name": "new"})) == 1
