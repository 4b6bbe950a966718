"""Probe 5: isolate the int8 scan bottleneck with a 2D tiled layout.

Gallery stored [n_tiles*D, tile_n] (block (D, tile_n) at row i*D is
contiguous). Measures:
  h. read-only int8 (DMA rate, no convert, no MXU)
  i. int8 load + bf16 convert + dot (the real kernel)
  b. bf16 load + dot (2x bytes, no convert)
Decision table:
  h fast, i slow  -> VPU convert-bound -> store bf16-valued ints (b path)
  h slow          -> int8 DMA element-rate-bound -> same conclusion
  i ~ h ~ 0.7ms   -> ship int8
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, K = 1 << 20, 512, 10
INNER, ITERS = 20, 7
VMEM = pltpu.CompilerParams(dimension_semantics=("parallel",),
                            vmem_limit_bytes=100 * 1024 * 1024)


def timed(fn, *args, inner=INNER, iters=ITERS):
    @partial(jax.jit, static_argnames=("n",))
    def many(n, *a):
        def body(i, acc):
            return acc + jnp.sum(fn(*a, jnp.float32(i)))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    assert np.isfinite(float(many(inner, *args)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(many(inner, *args))
        ts.append((time.perf_counter() - t0) * 1000 / inner)
    return float(np.percentile(ts, 50))


def _mm_kernel(q_ref, tile_ref, out_ref):
    tile = tile_ref[:]
    if tile.dtype != jnp.bfloat16:
        tile = tile.astype(jnp.bfloat16)
    out_ref[:] = jax.lax.dot(q_ref[:], tile,
                             preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("tile_n",))
def scan2d(q_bf, g2d, tile_n):
    n_tiles = g2d.shape[0] // D
    return pl.pallas_call(
        _mm_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((16, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tile_n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, n_tiles * tile_n), jnp.float32),
        compiler_params=VMEM,
    )(q_bf, g2d)


def _read_kernel(tile_ref, out_ref):
    out_ref[:] = tile_ref[0:16, :]


@partial(jax.jit, static_argnames=("tile_n",))
def read2d(g2d, tile_n):
    n_tiles = g2d.shape[0] // D
    return pl.pallas_call(
        _read_kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((D, tile_n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, n_tiles * tile_n), g2d.dtype),
        compiler_params=VMEM,
    )(g2d)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    tile_n = 4096
    n_tiles = N // tile_n

    @jax.jit
    def make(key):
        g = jax.random.normal(key, (N, D), jnp.float32)
        g = g / jnp.linalg.norm(g, axis=1, keepdims=True)
        gi8 = jnp.clip(jnp.round(g * 127.0), -127, 127).astype(jnp.int8)
        t = gi8.reshape(n_tiles, tile_n, D).transpose(0, 2, 1)
        g2d_i8 = t.reshape(n_tiles * D, tile_n)
        return g2d_i8, g2d_i8.astype(jnp.bfloat16)

    g2d_i8, g2d_bf = make(jax.random.key(1))
    g2d_i8 = jax.block_until_ready(jnp.copy(g2d_i8))
    g2d_bf = jax.block_until_ready(jnp.copy(g2d_bf))
    qf = jax.random.normal(jax.random.key(2), (16, D), jnp.float32)
    qf = qf / jnp.linalg.norm(qf, axis=1, keepdims=True)
    q_i8bf = jnp.clip(jnp.round(qf * 127.0), -127, 127).astype(jnp.bfloat16)

    def fh(g, jitter):
        return read2d(g, tile_n)[:, :8].astype(jnp.float32) + jitter
    p = timed(fh, g2d_i8)
    print(f"h read-only int8 contiguous: {p:7.3f} ms "
          f"({(N*D)/(p/1000)/1e9:.0f} GB/s)", flush=True)

    def fi(q, g, jitter):
        return scan2d(q, g, tile_n)[:, :8] + jitter
    p = timed(fi, q_i8bf, g2d_i8)
    print(f"i int8 convert+dot:          {p:7.3f} ms", flush=True)

    p = timed(fi, q_i8bf, g2d_bf)
    print(f"b bf16 dot (2x bytes):       {p:7.3f} ms", flush=True)

    def fbr(g, jitter):
        return read2d(g, tile_n)[:, :8].astype(jnp.float32) + jitter
    p = timed(fbr, g2d_bf)
    print(f"r read-only bf16 contiguous: {p:7.3f} ms "
          f"({(N*D*2)/(p/1000)/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
