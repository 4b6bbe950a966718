"""Pallas blocked medoid kernel: total pairwise L2 distance per member.

The medoid strategy needs the row sums of the full N×N distance matrix
(32_create_delegate_vector.py:23-26, an O(n²·d) NumPy broadcast that
explodes past ~10⁴ members — SURVEY.md §7 hard part 5). This kernel tiles
the matrix: each grid step loads one row-block and one column-block,
forms distances via the Gram trick on the MXU, and accumulates row sums
in the (revisited) output block — the N×N matrix never exists in HBM, so
memory is O(N·D + block²).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _medoid_kernel(rows_ref, cols_ref, col_mask_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    a = rows_ref[:]          # [bm, D]
    b = cols_ref[:]          # [bn, D]
    col_mask = col_mask_ref[:]   # [bn, 1]
    bm, bn = a.shape[0], b.shape[0]
    sq_a = jnp.sum(a * a, axis=1, keepdims=True)        # [bm, 1]
    sq_b = jnp.sum(b * b, axis=1, keepdims=True)        # [bn, 1]
    gram = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d2 = jnp.maximum(sq_a + sq_b.T - 2.0 * gram, 0.0)
    # Self-distances are exactly zero; the Gram trick leaves ~1e-6
    # residuals that sqrt inflates (same fix as delegates.pairwise_l2).
    row_ids = i * bm + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
    col_ids = j * bn + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
    d2 = jnp.where(row_ids == col_ids, 0.0, d2)
    d = jnp.sqrt(d2)
    d = d * (col_mask[:, 0][None, :])  # exclude padded/invalid columns
    out_ref[:] = out_ref[:] + jnp.sum(d, axis=1, keepdims=True)


@partial(jax.jit, static_argnames=("block", "interpret"))
def pairwise_distance_sums(
    vectors: jax.Array,  # [N, D] f32, N % block == 0
    mask: jax.Array,     # [N] bool
    block: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """→ [N] total L2 distance of each row to all unmasked rows."""
    N, D = vectors.shape
    assert N % block == 0, (N, block)
    n_blocks = N // block
    mask_f = mask.astype(jnp.float32)[:, None]

    sums = pl.pallas_call(
        _medoid_kernel,
        grid=(n_blocks, n_blocks),
        in_specs=[
            pl.BlockSpec((block, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            # Column mask only: row exclusion happens host-side
            # (sums[~mask] = inf in medoid_large) — a row-mask input
            # here would be a dead [block, 1] VMEM DMA on every one of
            # the n_blocks^2 grid steps.
            pl.BlockSpec((block, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(vectors, vectors, mask_f)
    return sums[:, 0]


def medoid_large(vectors: np.ndarray, block: int = 1024) -> np.ndarray:
    """Medoid of a large member set via the blocked kernel (host wrapper:
    pads to the block size, interpret mode off-TPU)."""
    n, d = vectors.shape
    padded = max(block, -(-n // block) * block)
    buf = np.zeros((padded, d), np.float32)
    buf[:n] = vectors
    mask = np.zeros(padded, bool)
    mask[:n] = True
    interpret = jax.default_backend() != "tpu"
    sums = np.array(pairwise_distance_sums(
        jnp.asarray(buf), jnp.asarray(mask), block=block,
        interpret=interpret))  # np.array: owned, writable copy
    sums[~mask] = np.inf
    return vectors[int(np.argmin(sums[:n]))]
