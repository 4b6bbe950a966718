"""TPU probe: int8 Pallas scan variants at 1M x 512, 16-query batch.

Measures (p50 ms per 16-query batch, axon timing protocol: fori_loop of
`inner` dispatches + scalar host fetch):
  A. kernel alone (scores only), tile_rows in {1024, 2048, 4096}
  B. kernel + mask + approx_max_k(R) candidates + f32 rescore -> top-10
  C. baseline bf16 matmul + approx_max_k(10) for comparison
Run: python benchmarks/probe_int8.py   (JAX_PLATFORMS=axon default)
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_based_object_detection_tpu.ops.int8_scan import int8_scan_scores

N, D, Q, K = 1_000_000 + 48_576, 512, 16, 10  # pad N to 2^20 = 1048576
N = 1 << 20
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


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)

    @jax.jit
    def make(key):
        g = jax.random.normal(key, (N, D), jnp.float32)
        g = g / jnp.linalg.norm(g, axis=1, keepdims=True)
        gi8 = jnp.clip(jnp.round(g * 127.0), -127, 127).astype(jnp.int8)
        return g.astype(jnp.bfloat16), gi8

    g_bf16, g_i8 = make(jax.random.key(1))
    g_f32 = None  # rescore from bf16 mirror to save HBM
    q = jax.random.normal(jax.random.key(2), (Q, D), jnp.float32)
    qn = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    q_i8 = jnp.clip(jnp.round(qn * 127.0), -127, 127).astype(jnp.int8)
    mask = jnp.ones((N,), bool)

    # --- C. baseline bf16
    def bf16_pipeline(qf, g, m, jitter):
        qb = (qf + jitter * 1e-6).astype(jnp.bfloat16)
        s = jnp.dot(qb, g.T, preferred_element_type=jnp.float32)
        s = jnp.where(m[None, :], s, -1e30)
        return jax.lax.approx_max_k(s, k=K)[0]

    p = timed(bf16_pipeline, qn, g_bf16, mask)
    print(f"C  bf16 matmul + approx_max_k(10):        {p:7.3f} ms", flush=True)

    # --- A. kernel alone
    for tr in (1024, 2048, 4096, 8192):
        def scan_only(qi, g, jitter, _tr=tr):
            s = int8_scan_scores(qi, g, tile_rows=_tr)
            return s[:, :8] + jitter

        try:
            p = timed(scan_only, q_i8, g_i8)
            print(f"A  int8 scan kernel tile={tr}:             {p:7.3f} ms",
                  flush=True)
        except Exception as e:
            print(f"A  tile={tr} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    # --- B. full pipeline: scan + approx candidates + bf16->f32 rescore
    for R in (128, 256):
        def full(qi, qf, g8, gb, m, jitter, _R=R):
            s = int8_scan_scores(qi, g8, tile_rows=2048)
            s = jnp.where(m[None, :], s, -1e30) + jitter * 0.0
            cs, ci = jax.lax.approx_max_k(s, k=_R)
            rows = jnp.take(gb, ci, axis=0).astype(jnp.float32)  # [Q,R,D]
            exact = jnp.einsum("qd,qrd->qr", qf, rows,
                               preferred_element_type=jnp.float32)
            exact = jnp.where(cs > -1e29, exact, -1e30)
            bs, pos = jax.lax.top_k(exact, K)
            return bs

        p = timed(full, q_i8, qn, g_i8, g_bf16, mask)
        print(f"B  full int8 pipeline R={R}:              {p:7.3f} ms",
              flush=True)

    # --- B2: skip the mask entirely (serving no-filter fast path)
    def full_nomask(qi, qf, g8, gb, jitter):
        s = int8_scan_scores(qi, g8, tile_rows=2048) + jitter * 0.0
        cs, ci = jax.lax.approx_max_k(s, k=128)
        rows = jnp.take(gb, ci, axis=0).astype(jnp.float32)
        exact = jnp.einsum("qd,qrd->qr", qf, rows,
                           preferred_element_type=jnp.float32)
        return jax.lax.top_k(exact, K)[0]

    p = timed(full_nomask, q_i8, qn, g_i8, g_bf16)
    print(f"B2 full int8, no mask, R=128:             {p:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
