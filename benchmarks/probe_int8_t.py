"""Probe 2: transposed-layout int8 scan kernels at 1M x 512.

Hypothesis: probe 1's 2.2 ms (233 GB/s effective) is transpose-bound —
dot_general(q [Q,D], tile [TN,D]) contracts dim 1 of both, forcing Mosaic
to transpose each tile in VMEM. Storing the gallery as [D, N] lets the
MXU consume tiles directly: dot(q [Q,D], tile [D,TN]).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, Q, K = 1 << 20, 512, 16, 10
INNER, ITERS = 20, 7


def timed(fn, *args, inner=INNER, iters=ITERS):
    @partial(jax.jit, static_argnames=("n",))
    def many(n, *a):
        def body(i, acc):
            return acc + jnp.sum(fn(*a, jnp.float32(i)))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    t0 = time.perf_counter()
    assert np.isfinite(float(many(inner, *args)))
    print(f"    [compile+warmup {time.perf_counter()-t0:.1f}s]", flush=True)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(many(inner, *args))
        ts.append((time.perf_counter() - t0) * 1000 / inner)
    return float(np.percentile(ts, 50))


def make_kernel_t(in_dtype, out_dtype):
    def kern(q_ref, tile_ref, out_ref):
        tile = tile_ref[:]
        if tile.dtype != jnp.bfloat16:
            tile = tile.astype(jnp.bfloat16)
        out_ref[:] = jax.lax.dot(
            q_ref[:], tile, preferred_element_type=jnp.float32,
        ).astype(out_dtype)
    return kern


@partial(jax.jit, static_argnames=("tile_n", "in_dtype", "out_dtype"))
def scan_t(q_bf, gallery_t, tile_n, in_dtype, out_dtype):
    # gallery_t: [D, N]; out: [Q, N]
    return pl.pallas_call(
        make_kernel_t(in_dtype, out_dtype),
        grid=(N // tile_n,),
        in_specs=[
            pl.BlockSpec((Q, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Q, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(q_bf, gallery_t)


def main():
    print(f"backend={jax.default_backend()}", flush=True)

    @jax.jit
    def make(key):
        g = jax.random.normal(key, (N, D), jnp.float32)
        g = g / jnp.linalg.norm(g, axis=1, keepdims=True)
        gi8t = jnp.clip(jnp.round(g * 127.0), -127, 127).astype(jnp.int8).T
        return jnp.asarray(gi8t), g.astype(jnp.bfloat16).T

    g_i8t, g_bf16t = make(jax.random.key(1))
    g_i8t = jax.block_until_ready(jnp.copy(g_i8t))
    g_bf16t = jax.block_until_ready(jnp.copy(g_bf16t))
    q = jax.random.normal(jax.random.key(2), (Q, D), jnp.float32)
    qn = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    q_i8bf = jnp.clip(jnp.round(qn * 127.0), -127, 127).astype(jnp.bfloat16)

    for tile_n in (2048, 4096, 8192, 16384):
        def f(qq, gg, jitter, _t=tile_n):
            s = scan_t(qq, gg, _t, "int8", jnp.float32)
            return s[:, :8] + jitter
        try:
            p = timed(f, q_i8bf, g_i8t)
            print(f"T  int8[D,N] tile_n={tile_n}: {p:7.3f} ms", flush=True)
        except Exception as e:
            print(f"T  tile_n={tile_n} FAILED: {str(e)[:160]}", flush=True)

    # bf16-out to halve score-write traffic
    def fb(qq, gg, jitter):
        s = scan_t(qq, gg, 8192, "int8", jnp.bfloat16)
        return s[:, :8].astype(jnp.float32) + jitter
    p = timed(fb, q_i8bf, g_i8t)
    print(f"T  int8[D,N] tile_n=8192 out=bf16: {p:7.3f} ms", flush=True)

    # bandwidth reference: same kernel, bf16 gallery (2x bytes)
    def fr(qq, gg, jitter):
        s = scan_t(qq, gg, 8192, "bf16", jnp.float32)
        return s[:, :8] + jitter
    p = timed(fr, qn.astype(jnp.bfloat16), g_bf16t)
    print(f"T  bf16[D,N] tile_n=8192 (reference): {p:7.3f} ms", flush=True)

    # full pipeline with transposed int8 + approx_max_k + rescore
    g_f32 = jax.block_until_ready(
        jax.jit(lambda a: a.astype(jnp.float32).T)(g_bf16t))

    def full(qq, qf, gg, gf, jitter):
        s = scan_t(qq, gg, 8192, "int8", jnp.float32) + jitter * 0.0
        cs, ci = jax.lax.approx_max_k(s, k=128)
        rows = jnp.take(gf, ci, axis=0)
        exact = jnp.einsum("qd,qrd->qr", qf, rows,
                           preferred_element_type=jnp.float32)
        return jax.lax.top_k(exact, K)[0]

    p = timed(full, q_i8bf, qn, g_i8t, g_f32)
    print(f"T  FULL int8[D,N] +approx128+rescore: {p:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
