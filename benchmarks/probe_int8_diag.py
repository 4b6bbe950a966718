"""Probe 3: what limits the transposed int8 scan at 1.53 ms?

  1. bf16 gallery same kernel (2x bytes)     -> if ~2x time: DMA-bound
  2. Q=128 vs Q=16 vs Q=8                    -> if flat: not MXU-bound
  3. pure-read kernel (no matmul)            -> max achievable read BW
  4. full pipeline (approx_max_k + rescore)  -> end-to-end latency
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


@partial(jax.jit, static_argnames=("tile_n", "q_rows"))
def scan_t(q_bf, gallery_t, tile_n, q_rows):
    return pl.pallas_call(
        _mm_kernel,
        grid=(N // tile_n,),
        in_specs=[
            pl.BlockSpec((q_rows, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_rows, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q_rows, N), jnp.float32),
        compiler_params=VMEM,
    )(q_bf, gallery_t)


def _read_kernel(tile_ref, out_ref):
    out_ref[:] = tile_ref[0:16, :]


@partial(jax.jit, static_argnames=("tile_n",))
def read_only(gallery_t, tile_n):
    return pl.pallas_call(
        _read_kernel,
        grid=(N // tile_n,),
        in_specs=[pl.BlockSpec((D, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, N), jnp.int8),
        compiler_params=VMEM,
    )(gallery_t)


def main():
    print(f"backend={jax.default_backend()}", flush=True)

    @jax.jit
    def make(key):
        g = jax.random.normal(key, (N, D), jnp.float32)
        g = g / jnp.linalg.norm(g, axis=1, keepdims=True)
        return (jnp.clip(jnp.round(g * 127.0), -127, 127).astype(jnp.int8).T,
                g.astype(jnp.bfloat16).T, g)

    g_i8t, g_bf16t, g_f32 = make(jax.random.key(1))
    g_i8t = jax.block_until_ready(jnp.copy(g_i8t))
    g_bf16t = jax.block_until_ready(jnp.copy(g_bf16t))
    qf = jax.random.normal(jax.random.key(2), (128, D), jnp.float32)
    qf = qf / jnp.linalg.norm(qf, axis=1, keepdims=True)
    q_i8bf = jnp.clip(jnp.round(qf * 127.0), -127, 127).astype(jnp.bfloat16)

    # 3. pure read
    for tile_n in (4096, 8192):
        def fr(g, jitter, _t=tile_n):
            return read_only(g, _t)[:, :8].astype(jnp.float32) + jitter
        p = timed(fr, g_i8t)
        bw = (N * D) / (p / 1000) / 1e9
        print(f"3 read-only int8 tile={_fmt(tile_n)}: {p:7.3f} ms "
              f"({bw:.0f} GB/s)", flush=True)

    # 2. Q sweep
    for q_rows in (8, 16, 32, 128):
        def fq(qq, g, jitter, _q=q_rows):
            return scan_t(qq, g, 4096, _q)[:, :8] + jitter
        p = timed(fq, q_i8bf[:q_rows], g_i8t)
        print(f"2 int8 matmul Q={q_rows}: {p:7.3f} ms", flush=True)

    # 1. bf16 gallery (2x bytes)
    def f1(qq, g, jitter):
        return scan_t(qq, g, 4096, 16)[:, :8] + jitter
    p = timed(f1, qf[:16].astype(jnp.bfloat16), g_bf16t)
    print(f"1 bf16 matmul Q=16 (2x bytes): {p:7.3f} ms", flush=True)

    # 4. full pipeline
    def full(qq, qf16, g, gf, jitter):
        s = scan_t(qq, g, 4096, 16) + jitter * 0.0
        cs, ci = jax.lax.approx_max_k(s, k=128)
        rows = jnp.take(gf, ci, axis=0)
        exact = jnp.einsum("qd,qrd->qr", qf16, rows,
                           preferred_element_type=jnp.float32)
        return jax.lax.top_k(exact, K)[0]

    p = timed(full, q_i8bf[:16], qf[:16], g_i8t, g_f32)
    print(f"4 FULL pipeline Q=16: {p:7.3f} ms", flush=True)


def _fmt(x):
    return str(x)


if __name__ == "__main__":
    main()
