"""Pallas blocked medoid kernel vs NumPy / the dense jnp path."""

import numpy as np

from retrieval_based_object_detection_tpu.ops import medoid as PM
from retrieval_based_object_detection_tpu.ops.delegates import compute_medoid


def test_distance_sums_match_numpy(rng):
    v = rng.normal(size=(1024, 32)).astype(np.float32)
    # Self-distance cancellation noise on the diagonal is ~1e-3 absolute.
    got = np.asarray(PM.pairwise_distance_sums(
        v, np.ones(1024, bool), block=256, interpret=True))
    ref = np.linalg.norm(v[:, None] - v, axis=2).sum(axis=1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=5e-2)


def test_medoid_large_matches_dense(rng):
    v = rng.normal(size=(700, 24)).astype(np.float32)
    got = PM.medoid_large(v, block=256)
    ref = np.asarray(compute_medoid(v))
    np.testing.assert_array_equal(got, ref)


def test_medoid_with_padding_mask(rng):
    """Padded rows must affect neither the sums nor the argmin."""
    v = rng.normal(size=(100, 16)).astype(np.float32)
    got = PM.medoid_large(v, block=256)  # pads 100 -> 256
    ref = np.asarray(compute_medoid(v))
    np.testing.assert_array_equal(got, ref)
