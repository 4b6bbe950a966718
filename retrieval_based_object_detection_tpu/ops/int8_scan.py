"""Pallas tiled gallery-scan kernel — the million-row serving scan.

Why this exists: the 1M x 512 gallery scan is HBM-bound and XLA's
bf16-matmul + approx_max_k path leaves ~45% of the chip's usable read
bandwidth on the table (measured 2.97 ms per 16-query batch on v5e vs
the 1.65 ms bf16 DMA floor). This kernel streams the gallery through
VMEM in MXU-ready tiles and reaches that floor: **1.60 ms** for the same
scan — 1.86x. Layout study (all measured at 1M x 512, v5e, documented in
DESIGN.md):

  * [N, D] row-major blocks       -> in-VMEM transpose per tile: 2.20 ms
  * [D, N] transposed             -> strided DMA (512 segments/tile,
                                     339 GB/s regardless of dtype): 1.53 ms
  * [n_tiles*D, tile_n] TILED     -> contiguous multi-MB DMA, MXU-direct
    (this kernel)                    tiles: 1.60 ms bf16 == the DMA floor

int8 tier: the gallery can be stored int8 (quarter HBM residency -> 4x
bigger galleries per chip). The kernel never hands int8 to the MXU —
XLA *and* Mosaic int8 dots hang libtpu codegen at this scale — instead
it converts tiles to bf16 in VMEM and relies on exact small-integer
arithmetic: every int8 is exact in bf16, each bf16*bf16 product is
formed in full precision, and the worst-case dot 127*127*512 = 8.26e6
< 2^24 accumulates exactly in f32. Scores are therefore bit-identical
to int32 integer scores (tested). NOTE: integer-dtype DMA runs at half
byte-rate on the current toolchain (measured 327 vs 651 GB/s), so int8
matches — not beats — bf16 wall-clock; it wins on memory, and wins
wall-clock 2x the day the DMA path is fixed.

Role: ``gallery.search.int8_scan_topk`` wraps this with masking,
approx_max_k candidate selection and exact f32 rescore;
``Gallery.search(method="int8")`` auto-routes here on TPU at scale.
Single-chip <1 ms at 1M rows is physically closed on v5e (the bf16 read
alone is 1GB / 819GB/s = 1.22 ms); the ICI-sharded gallery
(``gallery/sharded.py``) is the <1 ms path, reading 1/shards of the
rows per chip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 4096  # measured optimum (2048: +7%, 8192: +2%, 16384: OOM/HTTP500)


def _scan_kernel(q_ref, tile_ref, pen_ref, out_ref):
    # q_ref: [Q, D] bf16; tile_ref: [D, TILE_N] (bf16 or int8);
    # pen_ref: [1, TILE_N] f32 (0 valid / -inf masked);
    # out_ref: [Q, TILE_N] f32. One contiguous gallery tile per grid step.
    tile = tile_ref[:]
    if tile.dtype != jnp.bfloat16:
        tile = tile.astype(jnp.bfloat16)
    out_ref[:] = jax.lax.dot(
        q_ref[:], tile, preferred_element_type=jnp.float32) + pen_ref[:]


@partial(jax.jit, static_argnames=("tile_n", "interpret"))
def tiled_scan_scores(
    q: jax.Array,              # [Q, D] bf16 (int8-valued for the int8 tier)
    gallery_tiled: jax.Array,  # [n_tiles*D, tile_n] int8 or bf16
    penalty: jax.Array,        # [N] f32 additive row mask (0 or -inf)
    tile_n: int = TILE_N,
    interpret: bool = False,
) -> jax.Array:
    """[Q, N] f32 scores; column j of tile i is gallery row i*tile_n + j.

    The filter mask arrives as an additive penalty applied IN-kernel: a
    separate ``where`` over the [Q, N] score matrix costs two extra HBM
    passes (~0.5 ms at 1M rows) because XLA does not fuse producers into
    the approx_max_k PartialReduce custom call (measured)."""
    Q, D = q.shape
    n_tiles = gallery_tiled.shape[0] // D
    assert gallery_tiled.shape[0] == n_tiles * D
    return pl.pallas_call(
        _scan_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((Q, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tile_n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Q, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, n_tiles * tile_n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),  # tiles are independent
        ),
        interpret=interpret,
    )(q.astype(jnp.bfloat16), gallery_tiled, penalty.reshape(1, -1))


@partial(jax.jit, static_argnames=("tile_n",))
def pack_rows_tiled(rows: jax.Array, tile_n: int = TILE_N) -> jax.Array:
    """[N, D] -> [n_tiles*D, tile_n] tiled-transposed layout (device-side;
    N must divide tile_n). Each (D, tile_n) tile is contiguous, so the
    scan kernel's DMA issues multi-MB linear reads instead of 512 strided
    segments."""
    N, D = rows.shape
    assert N % tile_n == 0, (N, tile_n)
    n_tiles = N // tile_n
    return rows.reshape(n_tiles, tile_n, D).transpose(0, 2, 1).reshape(
        n_tiles * D, tile_n)
