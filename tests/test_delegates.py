"""Delegate math: golden tests against the reference NumPy formulas.

The four aggregation strategies are pure functions
(32_create_delegate_vector.py:9-26); these tests re-state the formulas in
NumPy and check the jitted device versions match, including under padding
masks.
"""

import numpy as np
import pytest

from retrieval_based_object_detection_tpu.ops import delegates as D


# ---- reference formulas, restated in NumPy (32_create_delegate_vector.py:9-26)
def np_average(v):
    return np.mean(v, axis=0)


def np_centroid(v):
    avg = np_average(v)
    return v[np.argmin(np.linalg.norm(v - avg, axis=1))]


def np_weighted(v, alpha=2.0):
    mean_vec = np_average(v)
    w = np.exp(-alpha * np.linalg.norm(v - mean_vec, axis=1))
    w /= w.sum()
    return np.sum(v * w[:, None], axis=0)


def np_medoid(v):
    d = np.linalg.norm(v[:, None] - v, axis=2)
    return v[np.argmin(d.sum(axis=1))]


@pytest.fixture
def vectors(rng):
    return rng.normal(size=(37, 64)).astype(np.float32)


def test_average(vectors):
    np.testing.assert_allclose(
        np.asarray(D.compute_average(vectors)), np_average(vectors), rtol=1e-5
    )


def test_centroid(vectors):
    np.testing.assert_allclose(
        np.asarray(D.compute_centroid(vectors)), np_centroid(vectors), rtol=1e-5
    )


def test_weighted(vectors):
    np.testing.assert_allclose(
        np.asarray(D.compute_weighted_average(vectors)), np_weighted(vectors),
        rtol=1e-4,
    )


def test_medoid(vectors):
    np.testing.assert_allclose(
        np.asarray(D.compute_medoid(vectors)), np_medoid(vectors), rtol=1e-5
    )


def test_all_delegates_consistent(vectors):
    out = D.compute_all_delegates(vectors)
    np.testing.assert_allclose(np.asarray(out["average"]), np_average(vectors), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["centroid"]), np_centroid(vectors), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["weighted"]), np_weighted(vectors), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["medoid"]), np_medoid(vectors), rtol=1e-5)


def test_padding_mask_equivalence(rng):
    """Padded+masked result == unpadded result (static-shape jit contract)."""
    v = rng.normal(size=(20, 32)).astype(np.float32)
    pad = np.zeros((12, 32), dtype=np.float32)
    vp = np.concatenate([v, pad])
    mask = np.concatenate([np.ones(20, bool), np.zeros(12, bool)])
    out = D.compute_all_delegates(vp, mask)
    np.testing.assert_allclose(np.asarray(out["average"]), np_average(v), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["centroid"]), np_centroid(v), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["weighted"]), np_weighted(v), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["medoid"]), np_medoid(v), rtol=1e-5)


def test_pairwise_l2_matches_numpy(rng):
    v = rng.normal(size=(15, 8)).astype(np.float32)
    d_ref = np.linalg.norm(v[:, None] - v, axis=2)
    np.testing.assert_allclose(np.asarray(D.pairwise_l2(v)), d_ref, atol=1e-4)


def test_single_member_class(rng):
    """A class with one member: every strategy returns that member."""
    v = rng.normal(size=(1, 16)).astype(np.float32)
    out = D.compute_all_delegates(v)
    for k in D.DELEGATE_TYPES:
        np.testing.assert_allclose(np.asarray(out[k]), v[0], rtol=1e-5)


def test_partial_delegates_match_full(rng):
    import retrieval_based_object_detection_tpu.ops.delegates as D2

    v = rng.normal(size=(50, 16)).astype(np.float32)
    full = D2.compute_all_delegates(v)
    part = D2.compute_partial_delegates(v)
    for k in ("average", "centroid", "weighted"):
        np.testing.assert_allclose(np.asarray(part[k]), np.asarray(full[k]),
                                   rtol=1e-5)


def test_large_class_path_in_pipeline(rng, monkeypatch):
    """Classes above the threshold route medoid through the blocked kernel
    and still produce all four delegates."""
    from retrieval_based_object_detection_tpu.gallery.schema import Filter, Payload
    from retrieval_based_object_detection_tpu.gallery.store import Gallery
    from retrieval_based_object_detection_tpu.pipelines import delegates as dp

    monkeypatch.setattr(dp, "LARGE_CLASS_THRESHOLD", 20)
    g = Gallery("t", dim=16)
    vecs = rng.normal(size=(40, 16)).astype(np.float32)
    g.upsert([f"p{i}" for i in range(40)], vecs,
             [Payload(data_type="original_images", class_name="big",
                      img_path=f"/{i}.png") for i in range(40)])
    res = dp.build_delegates(g)
    assert res.n_delegates_written == 4
    rec = g.scroll(Filter(must={"is_delegate": True,
                                "delegate_type": "medoid"}),
                   with_vectors=True, limit=1)[0][0]
    ref = np.asarray(D.compute_medoid(vecs))
    np.testing.assert_allclose(rec.vector, ref, rtol=1e-5)
