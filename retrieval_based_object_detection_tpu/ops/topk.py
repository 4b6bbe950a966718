"""Pallas fused gallery-scan kernel: tiled masked cosine top-k.

The XLA path (gallery/search.py) materialises the full [Q, N] score matrix
in HBM before ``lax.top_k``. This kernel streams gallery tiles through
VMEM, scores each tile on the MXU, and maintains a running top-k in VMEM
scratch — the score matrix never touches HBM, so per-query traffic is just
the gallery rows themselves.

Algorithm per grid step (one tile of T rows):
  scores[Q, T] = q @ tile.T  (+ -inf where masked)
  tile-local top-k via k iterations of (row-max, mask-out)  [VPU]
  merge with the running [Q, k] best via k iterations over the 2k pool

The grid must execute sequentially (scratch carries state): declared with
``dimension_semantics=("arbitrary",)``.

Precision note: the in-kernel dot runs at the MXU's default (bf16-mantissa)
precision, so scores can differ from the HIGHEST-precision XLA path by
~3e-4 and near-tie indices may swap — this kernel is the fast-scan tier;
use gallery/search.py's exact path when bit-ordering matters.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _iter_topk(scores: jax.Array, base_idx: jax.Array, k: int
               ) -> tuple[jax.Array, jax.Array]:
    """Top-k of [Q, T] via k (max, argmax, mask-out) passes; returns
    ([Q, k] scores, [Q, k] indices offset by base_idx)."""
    Q, T = scores.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (Q, T), 1)
    out_s = []
    out_i = []
    s = scores
    for _ in range(k):
        best = jnp.max(s, axis=1)                       # [Q]
        pos = jnp.argmax(s, axis=1).astype(jnp.int32)   # [Q]
        out_s.append(best)
        out_i.append(pos + base_idx)
        s = jnp.where(cols == pos[:, None], NEG, s)
    return jnp.stack(out_s, axis=1), jnp.stack(out_i, axis=1)


def _topk_kernel(q_ref, tile_ref, mask_ref, out_s_ref, out_i_ref,
                 best_s, best_i, *, k: int, tile_rows: int):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        best_s[:] = jnp.full_like(best_s, NEG)
        best_i[:] = jnp.zeros_like(best_i)

    q = q_ref[:]                     # [Q, D]
    tile = tile_ref[:]               # [T, D]
    mask = mask_ref[:]               # [T, 1] float (1 valid / 0 masked)
    scores = jax.lax.dot_general(
        q, tile, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = jnp.where(mask[:, 0][None, :] > 0.5, scores, NEG)
    tile_s, tile_i = _iter_topk(scores, step * tile_rows, k)

    pool_s = jnp.concatenate([best_s[:], tile_s], axis=1)   # [Q, 2k]
    pool_i = jnp.concatenate([best_i[:], tile_i], axis=1)
    # Merge without gathers (Mosaic has no general gather): one-hot select
    # the argmax column from pool_i each iteration.
    Q2 = pool_s.shape[0]
    cols2 = jax.lax.broadcasted_iota(jnp.int32, pool_s.shape, 1)
    s = pool_s
    new_s_list, new_i_list = [], []
    for _ in range(k):
        best = jnp.max(s, axis=1)
        pos = jnp.argmax(s, axis=1).astype(jnp.int32)
        onehot = cols2 == pos[:, None]
        new_s_list.append(best)
        new_i_list.append(jnp.sum(jnp.where(onehot, pool_i, 0), axis=1))
        s = jnp.where(onehot, NEG, s)
    best_s[:] = jnp.stack(new_s_list, axis=1)
    best_i[:] = jnp.stack(new_i_list, axis=1)

    @pl.when(step == n_steps - 1)
    def _():
        out_s_ref[:] = best_s[:]
        out_i_ref[:] = best_i[:]


@partial(jax.jit, static_argnames=("k", "tile_rows", "interpret"))
def pallas_cosine_topk(
    queries: jax.Array,   # [Q, D] L2-normalised f32
    gallery: jax.Array,   # [N, D] L2-normalised f32, N % tile_rows == 0
    mask: jax.Array,      # [N] bool
    k: int = 10,
    tile_rows: int = 1024,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    Q, D = queries.shape
    N = gallery.shape[0]
    assert N % tile_rows == 0, (N, tile_rows)
    n_tiles = N // tile_rows
    mask_f = mask.astype(jnp.float32)[:, None]

    kernel = partial(_topk_kernel, k=k, tile_rows=tile_rows)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((Q, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Q, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Q, k), jnp.float32),
            jax.ShapeDtypeStruct((Q, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Q, k), jnp.float32),
            pltpu.VMEM((Q, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # The unrolled iterative top-k keeps several [Q, T] temporaries
            # live; the default 16M scoped-vmem cap is too tight.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(queries, gallery, mask_f)
    return out_s, out_i


def cosine_topk_auto(queries: np.ndarray, gallery: np.ndarray,
                     mask: np.ndarray, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
    """Host-friendly wrapper: pads rows to the tile size and dispatches the
    Pallas kernel (interpret mode off-TPU)."""
    import jax

    tile = 1024
    n = gallery.shape[0]
    padded = -(-n // tile) * tile
    g = np.zeros((padded, gallery.shape[1]), np.float32)
    g[:n] = gallery
    m = np.zeros(padded, bool)
    m[:n] = mask
    interpret = jax.default_backend() != "tpu"
    s, i = pallas_cosine_topk(jnp.asarray(queries), jnp.asarray(g),
                              jnp.asarray(m), k=k, interpret=interpret)
    return np.asarray(s), np.asarray(i)
