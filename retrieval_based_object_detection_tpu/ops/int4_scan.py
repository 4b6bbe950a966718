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
    quantised dot, unbiased across rows.
  * the f32 rescore of the top candidates (gallery/search.int4_scan_topk)
    recovers exact cosine scores, and exact top-k whenever the true
    top-k survives into the candidate set. Unlike the int8 tier (100%
    measured), 4-bit resolution makes that APPROXIMATE at the margin:
    hardware-measured top-10 agreement vs exact f32 at 1M x 512, 256
    queries = 99.2% (rescore=128) / 99.3% (256), plateauing ~99.4% by
    rescore=1024 — the missing items are resolution casualties, not
    rescore-depth ones (MSE-optimal clipping scales don't move it;
    measured both random near-tie and clustered distributions). The
    exact-auto default therefore stays int8; int4 is the opt-in
    latency/capacity tier.

Packing layout: dim d and dim d + D/2 share byte d (low / high nibble),
so the unpacked planes are contiguous halves of the query — no
interleave, no gathers (Mosaic has no general gather; DESIGN.md
"Mosaic/Pallas lessons"). The low nibble is stored BIASED:

    b = 16*hi + (lo + 8),   hi, lo in [-8, 7],  b in [-128, 127]

which moves almost the whole unpack onto the MXU. The kernel's only
VPU unpack work is the high nibble, fhi = floor(b / 16) (exact because
lo + 8 in [0, 15]); the low-nibble dot is *algebra*, not extraction:

    q_lo . (lo + 8) = q_lo . b - 16 * (q_lo . fhi)
    S = q_lo.lo + q_hi.hi
      = (q_lo . b) - 16*(q_lo . fhi) + (q_hi . fhi) - 8 * sum(q_lo)

i.e. one matmul against the raw bytes, one against fhi with [q_lo; q_hi]
stacked (2Q rows — the MXU runs far under row capacity at serving batch
sizes, so the third matmul is nearly free), and a per-query constant
bias subtracted before the per-row scale. This replaced a 7-op/byte
floor-chain unpack (v1: mod-16 + branch-free sign extension) that made
the kernel VPU-bound — measured v1 0.789 ms @1M vs int8's 0.861, far
short of the 1.77x byte-traffic ratio.

Exactness of the integer dot through the bf16 MXU: every operand is an
exact small integer in bf16 (|q8| <= 127 and |b| <= 128, both < 2^8
ulp-exact range; |fhi| <= 8), MXU products are formed in full
precision, and every f32 accumulation/combination stays exact because
the worst-case magnitude 127*128*256 + 16*127*8*256 + 127*8*256 + 8*127*256
= 8.7M < 2^24.

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

TILE_ROWS = 8192  # rows per grid step (2 MB packed blocks; measured
#                   @1M x 512: 0.421 ms scan vs 0.522 at 2048 — bigger
#                   tiles amortise the per-tile unpack/matmul ramp;
#                   16384 exceeds the 16M scoped-VMEM default)


def _scan_kernel(q_ref, packed_ref, scale_ref, pen_ref, bias_ref,
                 out_ref):
    # q: [2Q, D/2] bf16 ([q_lo; q_hi] stacked, int8-valued);
    # packed: [T, D/2] int8 (b = 16*hi + lo + 8); scale: [1, T] f32;
    # pen: [1, T] f32 (0 valid / -inf masked); bias: [Q, 1] f32
    # (8 * sum(q_lo)); out: [Q, T] f32.
    # Only the high nibble is unpacked, in f32 (v5e's VPU has no bf16
    # ALU ops — floor/cmp on bf16 fail Mosaic); the low nibble rides
    # the raw-byte matmul (module docstring algebra). All integers are
    # small enough that every step is exact.
    q = out_ref.shape[0]
    fb = packed_ref[:].astype(jnp.float32)           # |b| <= 128
    fhi = jnp.floor(fb * 0.0625).astype(jnp.bfloat16)  # hi in [-8, 7]
    d1 = jax.lax.dot_general(                        # q_lo . b
        q_ref[:q], fb.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    d2 = jax.lax.dot_general(                        # [q_lo; q_hi] . hi
        q_ref[:], fhi,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ints = d1 - 16.0 * d2[:q] + d2[q:] - bias_ref[:]
    out_ref[:] = ints * scale_ref[:] + pen_ref[:]


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
        # Largest tile that divides N AND fits scoped VMEM (16M default):
        # double-buffered packed block + f32 output block + the resident
        # query stack, with headroom for the fhi temporary. At Q=16 this
        # picks 8192 (measured 0.421 ms scan @1M vs 0.522 at 2048); at
        # Q=256 the [Q, T] output block forces 2048.
        budget = 12 << 20
        tile_rows = next(
            (t for t in (8192, 4096, 2048, 1024, 512)
             if N % t == 0
             and 2 * (t * D2 + 4 * Q * t) + 3 * t * D2 <= budget),
            256)
    assert N % tile_rows == 0, (N, tile_rows)
    q = q_i8.astype(jnp.bfloat16)
    q_stack = jnp.concatenate([q[:, :D2], q[:, D2:]], axis=0)  # [2Q, D2]
    bias = 8.0 * jnp.sum(q_i8[:, :D2].astype(jnp.float32), axis=1,
                         keepdims=True)                        # [Q, 1]
    return pl.pallas_call(
        _scan_kernel,
        grid=(N // tile_rows,),
        in_specs=[
            pl.BlockSpec((2 * Q, D2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, D2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_rows), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_rows), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Q, tile_rows), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(q_stack, packed, scales.reshape(1, -1), penalty.reshape(1, -1),
      bias)
