"""Benchmark: CLIP ViT-B/32 embedding throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md north star): 10,000 crops/sec/chip.

Run on the real TPU (JAX_PLATFORMS=axon in env). Secondary numbers
(gallery query latency) are printed to stderr for humans; the JSON line on
stdout is the driver contract.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np

BASELINE_CROPS_PER_SEC = 10_000.0


def measure_dispatch_rt(iters: int = 5) -> float:
    """Fixed per-dispatch host round trip (seconds). Through the axon
    remote tunnel this is ~33 ms — constant whatever runs inside the
    dispatch (measured: a trivial fori_loop body costs the same at
    inner=1 and inner=640). Subtracting it is what makes per-iteration
    numbers device-time, not tunnel-time; round 1's protocol (inner=20)
    silently attributed ~1.7 ms of tunnel to every iteration."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def trivial(x):
        return jnp.sum(x) * 0 + 1.0

    x = jnp.zeros((16, 512), jnp.float32)
    float(trivial(x))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(trivial(x))
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50))


def bench_embed(batch_size: int = 192, iters: int = 60,
                warmup: int = 3, rt_s: float = 0.0) -> float:
    # batch 192 is the measured single-chip sweet spot (sweeps at 160/224/
    # 256/320 all lose a few % — VMEM pressure beyond ~200 images).
    import jax
    import jax.numpy as jnp

    from retrieval_based_object_detection_tpu.models.clip import model as M

    config = M.VIT_B_32
    params = M.init_params(config, seed=0)
    params = jax.tree.map(lambda a: jax.device_put(a), params)

    @jax.jit
    def encode(p, x):
        return M.encode_image(p, x, config, compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.normal(size=(batch_size, 224, 224, 3)).astype(np.float32))

    # NB: under the axon remote backend, block_until_ready() can return
    # before remote execution finishes — the only reliable barrier is a
    # host fetch. Run all iterations inside one jitted fori_loop (one
    # dispatch, one scalar fetch); the per-iteration input perturbation
    # keeps XLA from hoisting the loop-invariant encode out of the loop.
    @partial(jax.jit, static_argnames=("n",))
    def encode_many(p, x, n):
        def body(i, acc):
            return acc + jnp.sum(encode(p, x + i * 1e-6))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    # Warmup MUST use the same static n as the timed call — a different n
    # recompiles and the compile lands inside the measurement.
    assert np.isfinite(float(encode_many(params, images, iters)))

    t0 = time.perf_counter()
    acc = float(encode_many(params, images, iters))
    dt = time.perf_counter() - t0 - rt_s  # device time only (see
    assert np.isfinite(acc)               # measure_dispatch_rt)
    return batch_size * iters / dt


def bench_gallery_query(n_vectors: int = 1 << 20, dim: int = 512,
                        k: int = 10, q_batch: int = 16,
                        inner: int = 160, iters: int = 7,
                        rt_s: float = 0.0) -> tuple[float, float, float]:
    """On-device p50 latency (ms) of a top-k query batch over an HBM
    gallery (the store's quantised serving tiers)
    → (int8_ms, int4_ms, xla_bf16_ms).

    ``inner`` batches run per dispatch and the measured fixed dispatch
    round trip (``rt_s``) is subtracted, so the number is DEVICE time
    per query batch — at inner=20 without the subtraction, ~1.7 ms of
    tunnel latency masqueraded as kernel time (the round-1 protocol).
    """
    import jax
    import jax.numpy as jnp

    from retrieval_based_object_detection_tpu.gallery import search as S

    # Generate the gallery ON device — a 2GB host->device transfer through
    # the remote tunnel would dominate setup time. Serving layout: the
    # store's int8 tier — row-major int8 Pallas scan (exact integer
    # scores through the bf16 MXU) + approx_max_k candidates + exact f32
    # rescore (see DESIGN.md "Gallery scan").
    @jax.jit
    def make_gallery(key):
        g = jax.random.normal(key, (n_vectors, dim), jnp.float32)
        g = g / jnp.linalg.norm(g, axis=1, keepdims=True)
        return g, S.quantize_rows_int8(g), S.pack_rows_int4(g)

    gallery_f32, gallery_i8, (g_packed, g_scales) = make_gallery(
        jax.random.key(1))
    mask = jnp.ones(n_vectors, bool)
    queries = jax.random.normal(jax.random.key(2), (q_batch, dim),
                                jnp.float32)

    @partial(jax.jit, static_argnames=("n",))
    def query_many(q, gt, gf, m, n):
        def body(i, acc):
            s, _ = S.int8_scan_topk(q + i * 1e-6, gt, gf, m, k=k,
                                    rescore=256)
            return acc + jnp.sum(s)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(query_many(queries, gallery_i8, gallery_f32, mask, inner))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(query_many(queries, gallery_i8, gallery_f32, mask, inner))
        times.append((time.perf_counter() - t0 - rt_s) * 1000.0 / inner)
    p50 = float(np.percentile(times, 50))

    # int4 packed tier (half the int8 scan's HBM bytes; the MXU-offloaded
    # nibble unpack makes it the fastest serving tier — DESIGN.md).
    @partial(jax.jit, static_argnames=("n",))
    def query_many_i4(q, p, s, gf, m, n):
        def body(i, acc):
            sc, _ = S.int4_scan_topk(q + i * 1e-6, p, s, gf, m, k=k,
                                     rescore=256)
            return acc + jnp.sum(sc)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(query_many_i4(queries, g_packed, g_scales, gallery_f32, mask,
                        inner))
    times_i4 = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(query_many_i4(queries, g_packed, g_scales, gallery_f32,
                            mask, inner))
        times_i4.append((time.perf_counter() - t0 - rt_s) * 1000.0 / inner)
    p50_i4 = float(np.percentile(times_i4, 50))

    # Self-calibration: the shared chip's absolute speed drifts between
    # sessions (~1.5x observed), so also time the round-1 XLA path
    # (bf16 matmul + where + approx_max_k) in the same session and
    # report the ratio.
    gallery_bf16 = jax.jit(lambda a: a.astype(jnp.bfloat16))(gallery_f32)

    @partial(jax.jit, static_argnames=("n",))
    def query_many_xla(q, g, m, n):
        def body(i, acc):
            qn = S.l2_normalize(q + i * 1e-6)
            scores = jnp.dot(qn.astype(jnp.bfloat16), g.T,
                             preferred_element_type=jnp.float32)
            scores = jnp.where(m[None, :], scores, -1e30)
            return acc + jnp.sum(jax.lax.approx_max_k(scores, k=k)[0])
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(query_many_xla(queries, gallery_bf16, mask, inner))
    times_xla = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(query_many_xla(queries, gallery_bf16, mask, inner))
        times_xla.append((time.perf_counter() - t0 - rt_s) * 1000.0 / inner)
    p50_xla = float(np.percentile(times_xla, 50))
    return p50, p50_i4, p50_xla


def main() -> None:
    rt_s = measure_dispatch_rt()
    print(f"[protocol] fixed per-dispatch round trip = {rt_s * 1000:.2f} ms "
          f"(subtracted; device time reported)", file=sys.stderr)
    crops_per_sec = bench_embed(rt_s=rt_s)
    result = {
        "metric": "clip_vit_b32_embed_throughput",
        "value": round(crops_per_sec, 1),
        "unit": "crops/sec/chip",
        "vs_baseline": round(crops_per_sec / BASELINE_CROPS_PER_SEC, 3),
    }
    try:
        p50, p50_i4, p50_xla = bench_gallery_query(rt_s=rt_s)
        # The <1 ms north star is defined on the EXACT serving tier
        # (int8 scan + exact f32 rescore, 100% measured top-k agreement);
        # int4 is the opt-in approximate tier and must not carry the
        # verdict if int8 regresses (ADVICE r2).
        verdict = "MET" if p50 < 1.0 else "unmet"
        print(f"[secondary] top-10 @1M gallery p50: int8 exact tier = "
              f"{p50:.3f} ms per 16-query batch — <1 ms north star "
              f"{verdict}; int4 approximate tier = {p50_i4:.3f} ms; "
              f"same-session XLA bf16 path = {p50_xla:.3f} ms "
              f"({p50_xla / p50:.2f}x vs int8)",
              file=sys.stderr)
    except Exception as e:  # secondary metric must never break the contract
        print(f"[secondary] gallery bench failed: {e}", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
