"""Delegate (representative) vector aggregation strategies, on device.

Implements the four strategies of 32_create_delegate_vector.py:9-26 as pure,
jit-compiled JAX functions with identical math:

  average   — element-wise mean over members
  centroid  — the member closest (L2) to the mean
  weighted  — softmax(exp(-alpha * ||v - mean||)) weighted mean, alpha=2.0
  medoid    — the member with minimal total pairwise L2 distance

All four accept a padded [N, D] member matrix plus a validity mask so class
sizes stay static under jit; ``compute_all_delegates`` evaluates the whole
strategy grid in one traced program (one HBM pass over the members). The
O(N²) medoid distance matrix is computed blockwise via the Gram-matrix trick
(‖a−b‖² = ‖a‖² + ‖b‖² − 2a·b) so the MXU does the heavy lifting; a Pallas
variant for very large classes lives in ``ops.medoid``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

DELEGATE_TYPES = ("average", "centroid", "weighted", "medoid")
_BIG = jnp.float32(1e30)


def _masked(vectors: jax.Array, mask: jax.Array | None) -> tuple[jax.Array, jax.Array, jax.Array]:
    vectors = vectors.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones(vectors.shape[0], dtype=bool)
    count = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    return vectors, mask, count


@jax.jit
def compute_average(vectors: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Masked mean (32_create_delegate_vector.py:9-10)."""
    vectors, mask, count = _masked(vectors, mask)
    return jnp.sum(jnp.where(mask[:, None], vectors, 0.0), axis=0) / count


@jax.jit
def compute_centroid(vectors: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Member closest to the mean (32_create_delegate_vector.py:12-15)."""
    vectors, mask, _ = _masked(vectors, mask)
    avg = compute_average(vectors, mask)
    d = jnp.linalg.norm(vectors - avg[None, :], axis=1)
    d = jnp.where(mask, d, _BIG)
    return vectors[jnp.argmin(d)]


@partial(jax.jit, static_argnames=("alpha",))
def compute_weighted_average(
    vectors: jax.Array, mask: jax.Array | None = None, alpha: float = 2.0
) -> jax.Array:
    """exp(−α‖v−μ‖)-weighted mean (32_create_delegate_vector.py:17-21)."""
    vectors, mask, _ = _masked(vectors, mask)
    mean_vec = compute_average(vectors, mask)
    w = jnp.exp(-alpha * jnp.linalg.norm(vectors - mean_vec[None, :], axis=1))
    w = jnp.where(mask, w, 0.0)
    w = w / jnp.maximum(jnp.sum(w), 1e-12)  # all-masked input → zeros, not NaN
    return jnp.sum(vectors * w[:, None], axis=0)


def pairwise_l2(vectors: jax.Array) -> jax.Array:
    """Full [N, N] L2 distance matrix via the Gram trick (MXU matmul)."""
    sq = jnp.sum(vectors * vectors, axis=1)
    gram = jnp.dot(vectors, vectors.T, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    d2 = sq[:, None] + sq[None, :] - 2.0 * gram
    # The Gram trick leaves small positive residuals on the diagonal
    # (catastrophic cancellation); self-distance is exactly zero.
    n = vectors.shape[0]
    d2 = jnp.where(jnp.eye(n, dtype=bool), 0.0, d2)
    return jnp.sqrt(jnp.maximum(d2, 0.0))


@jax.jit
def compute_medoid(vectors: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Member with minimal total pairwise distance (32:23-26)."""
    vectors, mask, _ = _masked(vectors, mask)
    d = pairwise_l2(vectors)
    d = jnp.where(mask[None, :], d, 0.0)  # exclude padded columns from totals
    totals = jnp.sum(d, axis=1)
    totals = jnp.where(mask, totals, _BIG)  # exclude padded rows from argmin
    return vectors[jnp.argmin(totals)]


@partial(jax.jit, static_argnames=("alpha",))
def compute_partial_delegates(
    vectors: jax.Array, mask: jax.Array | None = None, alpha: float = 2.0
) -> dict[str, jax.Array]:
    """average/centroid/weighted only — the O(n) strategies, for classes
    too large to materialise the medoid's pairwise matrix (the blocked
    kernel in ops.medoid covers medoid there)."""
    vectors, mask, count = _masked(vectors, mask)
    avg = jnp.sum(jnp.where(mask[:, None], vectors, 0.0), axis=0) / count
    dist_to_mean = jnp.linalg.norm(vectors - avg[None, :], axis=1)
    centroid = vectors[jnp.argmin(jnp.where(mask, dist_to_mean, _BIG))]
    w = jnp.exp(-alpha * dist_to_mean)
    w = jnp.where(mask, w, 0.0)
    weighted = jnp.sum(
        vectors * (w / jnp.maximum(jnp.sum(w), 1e-12))[:, None], axis=0)
    return {"average": avg, "centroid": centroid, "weighted": weighted}


@partial(jax.jit, static_argnames=("alpha",))
def compute_all_delegates(
    vectors: jax.Array, mask: jax.Array | None = None, alpha: float = 2.0
) -> dict[str, jax.Array]:
    """All four strategies in one traced program (shared mean / Gram)."""
    vectors, mask, count = _masked(vectors, mask)
    avg = jnp.sum(jnp.where(mask[:, None], vectors, 0.0), axis=0) / count

    dist_to_mean = jnp.linalg.norm(vectors - avg[None, :], axis=1)
    centroid = vectors[jnp.argmin(jnp.where(mask, dist_to_mean, _BIG))]

    w = jnp.exp(-alpha * dist_to_mean)
    w = jnp.where(mask, w, 0.0)
    weighted = jnp.sum(
        vectors * (w / jnp.maximum(jnp.sum(w), 1e-12))[:, None], axis=0)

    d = pairwise_l2(vectors)
    d = jnp.where(mask[None, :], d, 0.0)
    totals = jnp.where(mask, jnp.sum(d, axis=1), _BIG)
    medoid = vectors[jnp.argmin(totals)]

    return {
        "average": avg,
        "centroid": centroid,
        "weighted": weighted,
        "medoid": medoid,
    }
