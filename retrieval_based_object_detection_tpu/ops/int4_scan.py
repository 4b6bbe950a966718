"""Pallas int4-packed gallery-scan kernel — half the HBM bytes of int8.

The serving scan is HBM-bandwidth-bound (DESIGN.md "Gallery scan"): at
1M x 512 the int8 tier moves 512 MB of gallery per query batch. This
tier packs two 4-bit dims per byte, so the same scan reads 256 MB —
the kernel is the int8 scan's sibling (`ops/int8_scan.py`) with an
in-register nibble unpack.

Quantisation scheme (per-row scale, compensated in-kernel):

  * rows are L2-normalised, then q = round(row / s) in [-8, 7] with
    s = max|row| / 7 — per-row scales keep 4-bit resolution on real
    embedding distributions (a fixed global scale wastes the range on
    the one largest coordinate anywhere in the gallery).
  * integer scores q8_query . q4_row are computed exactly (see below),
    then multiplied by s_row IN-kernel — ranking is proportional to the
    quantised dot, unbiased across rows. Simulated top-10 candidate
    recall vs exact f32 at 1M x 512 random unit vectors (the near-tie
    worst case): 100% at rescore >= 128.
  * the f32 rescore of the top candidates (gallery/search.int4_scan_topk)
    then recovers exact cosine top-k, same contract as the int8 tier.

Packing layout: dim d and dim d + D/2 share byte d (low / high nibble),
so the unpacked planes are contiguous halves of the query — no
interleave, no gathers (Mosaic has no general gather; DESIGN.md
"Mosaic/Pallas lessons"). The unpack itself is float arithmetic
(floor/mul — plain VPU ops) rather than int8 shifts:

    b     = 16*hi + ulo,  ulo = lo mod 16   (two's-complement byte)
    fhi   = floor(b / 16)            in [-8, 7]
    ulo   = b - 16*fhi               in [0, 15]
    lo    = ulo - 16*[ulo >= 8]      in [-8, 7]

Exactness of the integer dot through the bf16 MXU: every operand is an
exact small integer in bf16 (|q8| <= 127 < 256, |q4| <= 8), MXU products
are formed in full precision, and the f32 accumulation is exact because
127 * 8 * 512 = 520k < 2^24.

Role: `gallery.search.int4_scan_topk` wraps this with candidate
selection + exact f32 rescore; `Gallery.search(method="int4")` routes
here off the store's packed mirror.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 2048  # rows per grid step (512 KB packed blocks)


def _scan_kernel(q_lo_ref, q_hi_ref, packed_ref, scale_ref, pen_ref,
                 out_ref):
    # q_lo/q_hi: [Q, D/2] bf16 (int8-valued query halves);
    # packed: [T, D/2] int8 (two int4 per byte); scale: [1, T] f32;
    # pen: [1, T] f32 (0 valid / -inf masked); out: [Q, T] f32.
    # Unpack in f32 (v5e's VPU has no bf16 ALU ops — floor/cmp on bf16
    # fail Mosaic); values are small integers so every step is exact.
    fb = packed_ref[:].astype(jnp.float32)      # |b| <= 128
    fhi = jnp.floor(fb * 0.0625)                # floor(b/16) in [-8, 7]
    ulo = fb - 16.0 * fhi                       # b mod 16, in [0, 15]
    # Sign-extend the low nibble without a compare: floor(ulo/8) is 1
    # exactly when ulo >= 8.
    flo = ulo - 16.0 * jnp.floor(ulo * 0.125)
    dots = jax.lax.dot_general(
        q_lo_ref[:], flo.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dots += jax.lax.dot_general(
        q_hi_ref[:], fhi.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[:] = dots * scale_ref[:] + pen_ref[:]


@partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def int4_scan_scores(
    q_i8: jax.Array,      # [Q, D] int8 quantised queries (fixed scale 127)
    packed: jax.Array,    # [N, D/2] int8, two int4 dims per byte
    scales: jax.Array,    # [N] f32 per-row quantisation scales
    penalty: jax.Array,   # [N] f32 additive row mask (0 or -inf)
    tile_rows: int = 0,   # 0 = auto (largest of 2048.. dividing N)
    interpret: bool = False,
) -> jax.Array:
    """[Q, N] f32 scale-compensated scores ~ cosine * (127 / s_q)."""
    Q, D = q_i8.shape
    N, D2 = packed.shape
    assert D == 2 * D2, (D, D2)
    if tile_rows == 0:
        tile_rows = next(t for t in (2048, 1024, 512, 256)
                         if N % t == 0)
    assert N % tile_rows == 0, (N, tile_rows)
    q = q_i8.astype(jnp.bfloat16)
    return pl.pallas_call(
        _scan_kernel,
        grid=(N // tile_rows,),
        in_specs=[
            pl.BlockSpec((Q, D2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, D2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, D2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_rows), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_rows), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Q, tile_rows), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(q[:, :D2], q[:, D2:], packed, scales.reshape(1, -1),
      penalty.reshape(1, -1))
