"""Pallas flash attention vs the einsum oracle (interpret mode on CPU)."""

import numpy as np

from retrieval_based_object_detection_tpu.ops import attention as A


def test_flash_matches_reference(rng):
    B, H, T, D = 2, 2, 512, 64
    q = rng.normal(size=(B, H, T, D)).astype(np.float32)
    k = rng.normal(size=(B, H, T, D)).astype(np.float32)
    v = rng.normal(size=(B, H, T, D)).astype(np.float32)
    ref = np.asarray(A.reference_attention(q, k, v))
    got = np.asarray(A.flash_attention(q, k, v, block_q=128, block_k=128,
                                       interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_flash_single_block(rng):
    B, H, T, D = 1, 1, 128, 32
    q = rng.normal(size=(B, H, T, D)).astype(np.float32)
    k = rng.normal(size=(B, H, T, D)).astype(np.float32)
    v = rng.normal(size=(B, H, T, D)).astype(np.float32)
    ref = np.asarray(A.reference_attention(q, k, v))
    got = np.asarray(A.flash_attention(q, k, v, block_q=128, block_k=128,
                                       interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_flash_extreme_logits_stable(rng):
    """Large-magnitude logits: online softmax must stay finite."""
    B, H, T, D = 1, 1, 256, 16
    q = 30.0 * rng.normal(size=(B, H, T, D)).astype(np.float32)
    k = 30.0 * rng.normal(size=(B, H, T, D)).astype(np.float32)
    v = rng.normal(size=(B, H, T, D)).astype(np.float32)
    got = np.asarray(A.flash_attention(q, k, v, block_q=128, block_k=128,
                                       interpret=True))
    assert np.isfinite(got).all()
    ref = np.asarray(A.reference_attention(q, k, v))
    np.testing.assert_allclose(got, ref, atol=1e-4)
