"""Pallas tiled top-k kernel vs the XLA reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from retrieval_based_object_detection_tpu.gallery import search as S
from retrieval_based_object_detection_tpu.ops import topk as PT


def _normalize(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_pallas_topk_matches_xla(rng):
    n, d, q, k = 4096, 64, 4, 10
    gallery = _normalize(rng.normal(size=(n, d)).astype(np.float32))
    queries = _normalize(rng.normal(size=(q, d)).astype(np.float32))
    mask = rng.random(n) < 0.7

    ref_s, ref_i = S.masked_cosine_topk(
        jnp.asarray(queries), jnp.asarray(gallery), jnp.asarray(mask),
        k=k, gallery_normalized=True)
    got_s, got_i = PT.cosine_topk_auto(queries, gallery, mask, k=k)

    np.testing.assert_allclose(got_s, np.asarray(ref_s), atol=1e-5)
    np.testing.assert_array_equal(got_i, np.asarray(ref_i))


def test_pallas_topk_with_row_padding(rng):
    """Non-multiple-of-tile galleries are padded and masked correctly."""
    n, d, k = 3000, 32, 5
    gallery = _normalize(rng.normal(size=(n, d)).astype(np.float32))
    queries = _normalize(rng.normal(size=(3, d)).astype(np.float32))
    mask = np.ones(n, bool)
    got_s, got_i = PT.cosine_topk_auto(queries, gallery, mask, k=k)
    assert got_i.max() < n
    ref_s, ref_i = S.masked_cosine_topk(
        jnp.asarray(queries), jnp.asarray(gallery), jnp.asarray(mask),
        k=k, gallery_normalized=True)
    np.testing.assert_array_equal(got_i, np.asarray(ref_i))


def test_pallas_topk_all_masked(rng):
    gallery = _normalize(rng.normal(size=(2048, 16)).astype(np.float32))
    queries = _normalize(rng.normal(size=(2, 16)).astype(np.float32))
    got_s, _ = PT.cosine_topk_auto(queries, gallery,
                                   np.zeros(2048, bool), k=3)
    assert (got_s <= PT.NEG / 2).all()
