"""Probe 4: tiled-contiguous transposed int8 layout [n_tiles, D, tile_n].

Probe 3 showed the [D, N] layout is strided-DMA bound (each block row is
one tiny segment of a 1M-element pitch; 339 GB/s regardless of dtype).
Making each (D, tile_n) tile CONTIGUOUS in HBM gives the DMA engine
multi-MB linear reads; expectation is the true bandwidth floor
(512 MB / ~800 GB/s ~ 0.65 ms) + overlapped MXU time.
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
    tile = tile_ref[0]
    if tile.dtype != jnp.bfloat16:
        tile = tile.astype(jnp.bfloat16)
    out_ref[:] = jax.lax.dot(q_ref[:], tile,
                             preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("tile_n", "q_rows"))
def scan_tiled(q_bf, gallery_tiled, tile_n, q_rows=16):
    n_tiles = gallery_tiled.shape[0]
    return pl.pallas_call(
        _mm_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((q_rows, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, tile_n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_rows, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q_rows, n_tiles * tile_n),
                                       jnp.float32),
        compiler_params=VMEM,
    )(q_bf, gallery_tiled)


def _read_kernel(tile_ref, out_ref):
    out_ref[:] = tile_ref[0, 0:16, :]


@partial(jax.jit, static_argnames=("tile_n",))
def read_only(gallery_tiled, tile_n):
    n_tiles = gallery_tiled.shape[0]
    return pl.pallas_call(
        _read_kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, D, tile_n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, n_tiles * tile_n), jnp.int8),
        compiler_params=VMEM,
    )(gallery_tiled)


def main():
    print(f"backend={jax.default_backend()}", flush=True)

    for tile_n in (2048, 4096, 8192):
        n_tiles = N // tile_n

        @partial(jax.jit, static_argnames=())
        def make(key, _t=tile_n, _nt=n_tiles):
            g = jax.random.normal(key, (N, D), jnp.float32)
            g = g / jnp.linalg.norm(g, axis=1, keepdims=True)
            gi8 = jnp.clip(jnp.round(g * 127.0), -127, 127).astype(jnp.int8)
            # [N, D] -> [n_tiles, tile_n, D] -> [n_tiles, D, tile_n]
            tiled = gi8.reshape(_nt, _t, D).transpose(0, 2, 1)
            return tiled, g

        tiled, g_f32 = make(jax.random.key(1))
        tiled = jax.block_until_ready(jnp.copy(tiled))
        qf = jax.random.normal(jax.random.key(2), (16, D), jnp.float32)
        qf = qf / jnp.linalg.norm(qf, axis=1, keepdims=True)
        q_i8bf = jnp.clip(jnp.round(qf * 127.0), -127, 127
                          ).astype(jnp.bfloat16)

        def fm(qq, g, jitter, _t=tile_n):
            return scan_tiled(qq, g, _t)[:, :8] + jitter
        p = timed(fm, q_i8bf, tiled)
        print(f"matmul    tiled tile_n={tile_n}: {p:7.3f} ms", flush=True)

        def full(qq, qf16, g, gf, jitter, _t=tile_n):
            s = scan_tiled(qq, g, _t) + jitter * 0.0
            cs, ci = jax.lax.approx_max_k(s, k=128)
            rows = jnp.take(gf, ci, axis=0)
            exact = jnp.einsum("qd,qrd->qr", qf16, rows,
                               preferred_element_type=jnp.float32)
            return jax.lax.top_k(exact, K)[0]

        p = timed(full, q_i8bf, qf, tiled, g_f32)
        print(f"FULL      tiled tile_n={tile_n}: {p:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
