"""Pallas int8 gallery-scan kernel — the million-row serving scan.

Why this exists: the 1M x 512 gallery scan is HBM-bandwidth-bound and
the gallery can be stored int8 (exact-with-rescore), but XLA's int8
``dot_general`` AND Mosaic's in-kernel int8 dot both hang libtpu codegen
at this scale. This kernel never hands int8 to the MXU: it streams
row-major int8 blocks through VMEM, converts to bf16 on the VPU, and
runs the dot in bf16 with f32 accumulation. The arithmetic is EXACT
int8 arithmetic despite the detour:

  * every int8 value is exactly representable in bf16,
  * the MXU forms each bf16*bf16 product in full precision before f32
    accumulation (8-bit x 8-bit mantissas -> 16-bit product < f32's 24),
  * the worst-case dot 127*127*512 = 8.26e6 < 2^24, so f32 accumulation
    is exact integer arithmetic.
Scores are bit-identical to ``gallery.search.int8_cosine_topk``'s int32
scores (tested), and the f32 rescore of the top candidates recovers
exact cosine top-k.

Measured (1M x 512, 16-query batch, v5e, DEVICE time — fixed ~30 ms
per-dispatch tunnel round trip measured and subtracted, kernel forced
loop-variant so XLA cannot hoist it; see DESIGN.md "measurement
protocol"):

  * int8 scan (this kernel):        0.84 ms  (~610 GB/s)
  * bf16 scan (same kernel, 2x B):  1.53 ms  (~650 GB/s)
  * FULL serving pipeline (scan + in-kernel filter penalty +
    approx_max_k(128) + exact f32 rescore): **0.79 ms** — the <1 ms
    @1M north star, met single-chip
  * XLA bf16 matmul + approx_max_k: 1.42 ms (1.8x slower)

Layout does NOT matter (row-major [N, D] == transposed == tiled within
noise) — Mosaic pipelines all of them at the DMA rate; the win is the
int8 byte volume. The filter mask rides IN-kernel as an additive
penalty row: a separate ``where`` over the [Q, N] scores costs two
extra HBM passes because XLA does not fuse producers into the
approx_max_k PartialReduce custom call.

Role: ``gallery.search.int8_scan_topk`` wraps this with candidate
selection and rescore; ``Gallery.search(method="int8")`` auto-routes
here on TPU at >=131072 rows, straight off the store's incremental
[N, D] int8 mirror.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 8192  # gallery rows per grid step (4 MB int8 blocks;
#                   measured @1M x 512 Q=16: 0.645 ms scan vs 0.681 at
#                   4096 — bigger tiles amortise the per-tile ramp)


def _scan_kernel(q_ref, rows_ref, pen_ref, out_ref):
    # q_ref: [Q, D] bf16 (int8-valued); rows_ref: [T, D] int8;
    # pen_ref: [1, T] f32 (0 valid / -inf masked); out_ref: [Q, T] f32.
    rows = rows_ref[:].astype(jnp.bfloat16)
    out_ref[:] = jax.lax.dot_general(
        q_ref[:], rows, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + pen_ref[:]


@partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def int8_scan_scores(
    q_i8: jax.Array,        # [Q, D] int8 quantised queries
    gallery_i8: jax.Array,  # [N, D] int8, row-major (the store's mirror)
    penalty: jax.Array,     # [N] f32 additive row mask (0 or -inf)
    tile_rows: int = 0,     # 0 = auto (largest of 4096.. dividing N)
    interpret: bool = False,
) -> jax.Array:
    """[Q, N] f32 exact integer scores = q_i8 . gallery_i8 + penalty."""
    Q, D = q_i8.shape
    N = gallery_i8.shape[0]
    if tile_rows == 0:
        # Largest tile that divides N AND fits scoped VMEM (16M default):
        # int8 block + bf16 conversion temp + [Q, T] f32 output block.
        # At Q=16 this picks 8192 (measured 0.645 ms scan @1M vs 0.681
        # at 4096); large query batches force smaller tiles.
        budget = 14 << 20
        tile_rows = next(
            (t for t in (8192, 4096, 2048, 1024, 512)
             if N % t == 0 and t * (3 * D + 4 * Q) <= budget),
            256)
    assert N % tile_rows == 0, (N, tile_rows)
    return pl.pallas_call(
        _scan_kernel,
        grid=(N // tile_rows,),
        in_specs=[
            pl.BlockSpec((Q, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_rows), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Q, tile_rows), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),  # tiles are independent
        ),
        interpret=interpret,
    )(q_i8.astype(jnp.bfloat16), gallery_i8, penalty.reshape(1, -1))
