"""Capacity-mode searcher: chunked build correctness, parity with the
store's int4 tier (within bf16 rescore drift), filters, edge shapes."""

import numpy as np
import pytest

from retrieval_based_object_detection_tpu.gallery import Filter, Payload
from retrieval_based_object_detection_tpu.gallery.capacity import (
    CapacitySearcher,
)
from retrieval_based_object_detection_tpu.gallery.store import Gallery

DIM = 64


def _vectors(rng, n):
    return rng.normal(size=(n, DIM)).astype(np.float32)


def test_capacity_matches_exact_topk(rng):
    n = 1500
    vecs = _vectors(rng, n)
    s = CapacitySearcher(vecs, np.ones(n, bool), chunk=512)
    q = vecs[42] + rng.normal(size=DIM).astype(np.float32) * 0.01
    scores, idx = s.search(q, k=5)
    # Exact reference on host.
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    exact = np.argsort(-vn @ qn)[:5]
    assert idx[0, 0] == exact[0] == 42
    assert set(idx[0]) == set(exact)
    np.testing.assert_allclose(scores[0], np.sort(vn @ qn)[::-1][:5],
                               atol=2e-2)


def test_chunked_build_equals_single_chunk(rng):
    """Rows must land at the same offsets whatever the chunk size."""
    n = 700  # not a multiple of any chunk
    vecs = _vectors(rng, n)
    a = CapacitySearcher(vecs, np.ones(n, bool), chunk=256)
    b = CapacitySearcher(vecs, np.ones(n, bool), chunk=1 << 18)
    np.testing.assert_array_equal(np.asarray(a.dev_packed)[:n],
                                  np.asarray(b.dev_packed)[:n])
    np.testing.assert_allclose(np.asarray(a.dev_scales)[:n],
                               np.asarray(b.dev_scales)[:n], rtol=1e-6)
    q = _vectors(rng, 3)
    sa, ia = a.search(q, k=7)
    sb, ib = b.search(q, k=7)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(sa, sb, atol=1e-6)


def test_padding_rows_never_win(rng):
    n = 300  # padded to 512; padding rows are zero (score 0 > -inf only)
    vecs = _vectors(rng, n)
    s = CapacitySearcher(vecs, np.ones(n, bool), chunk=512)
    q = _vectors(rng, 2)
    _, idx = s.search(q, k=10)
    assert (idx < n).all()


def test_from_gallery_with_filter(rng):
    g = Gallery("t", dim=DIM)
    vecs = _vectors(rng, 200)
    g.upsert([f"id{i}" for i in range(200)], vecs,
             [Payload(data_type="original_images",
                      class_name="a" if i < 100 else "b",
                      img_path=f"/{i}.png") for i in range(200)])
    s = CapacitySearcher.from_gallery(
        g, flt=Filter(must={"class_name": "b"}), chunk=256)
    q = vecs[10]  # class "a" — its own row is masked out
    _, idx = s.search(q, k=5)
    assert (idx >= 100).all()


def test_extra_mask(rng):
    n = 400
    vecs = _vectors(rng, n)
    s = CapacitySearcher(vecs, np.ones(n, bool), chunk=256)
    q = vecs[7]
    _, idx = s.search(q, k=1)
    assert idx[0, 0] == 7
    extra = np.ones(n, bool)
    extra[7] = False
    _, idx2 = s.search(q, k=1, extra_mask=extra)
    assert idx2[0, 0] != 7


def test_rejects_odd_dim_and_noncosine(rng):
    with pytest.raises(ValueError, match="even dim"):
        CapacitySearcher(rng.normal(size=(10, 33)).astype(np.float32),
                         np.ones(10, bool))
    g = Gallery("d", dim=DIM, distance="dot")
    with pytest.raises(ValueError, match="cosine"):
        CapacitySearcher.from_gallery(g)


def test_ids_of(rng):
    g = Gallery("t", dim=DIM)
    vecs = _vectors(rng, 50)
    g.upsert([f"pt{i}" for i in range(50)], vecs,
             [Payload(data_type="original_images", class_name="c",
                      img_path=f"/{i}.png") for i in range(50)])
    s = CapacitySearcher.from_gallery(g, chunk=256)
    _, idx = s.search(vecs[7], k=1)
    assert s.ids_of(idx) == [["pt7"]]
    raw = CapacitySearcher(vecs, np.ones(50, bool), chunk=256)
    import pytest

    with pytest.raises(ValueError, match="ids"):
        raw.ids_of(idx)
