"""TPU probe: Gallery.search API-level latency at 1M rows (VERDICT #2).

NOTE: API wall times here include the ~30 ms axon-tunnel round trips by
design (that IS the API cost on this transport); the device-only serving
latency is bench.py's RT-corrected secondary metric.

Builds a 1M-row store with device-generated vectors injected into the
mirror (a 2 GB host upload through the axon tunnel would take minutes
and is irrelevant to query-path latency), then measures:
  * g.search(method="int8") wall-clock (full API: mask cache, dispatch,
    host fetch, Record construction)
  * the same with a filter (cached mask path)
  * raw int8_scan_topk device loop for reference
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_based_object_detection_tpu.gallery import search as search_lib
from retrieval_based_object_detection_tpu.gallery.schema import Filter, Payload
from retrieval_based_object_detection_tpu.gallery.store import Gallery

N, D, Q, K = 1 << 20, 512, 16, 10


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    g = Gallery("bench", dim=D, capacity=N)

    # Host metadata (real), device vectors (generated on-chip).
    ids = [f"p{i}" for i in range(N)]
    g._ids = ids
    g._id_to_row = {pid: i for i, pid in enumerate(ids)}
    pls = [Payload(data_type="original_images",
                   class_name=f"c{i % 37}", img_path=f"/img/{i}.jpg")
           for i in range(N)]
    g._payloads.set_rows(np.arange(N), pls)
    print(f"host metadata built in {time.perf_counter()-t0:.1f}s",
          flush=True)

    @jax.jit
    def make(key):
        v = jax.random.normal(key, (N, D), jnp.float32)
        return v / jnp.linalg.norm(v, axis=1, keepdims=True)

    g._padded = N
    g._dev_f32 = make(jax.random.key(1))
    g._synced = N
    g._dirty_lo = g._dirty_hi = 0
    # host vectors stay zeros: with_vectors=False never reads them.

    rng = np.random.default_rng(0)
    q = rng.normal(size=(Q, D)).astype(np.float32)

    for method in ("int8", "bf16"):
        # warmup (compile)
        t0 = time.perf_counter()
        g.search(q, k=K, method=method)
        print(f"{method} first call (compile): "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        ts = []
        for i in range(30):
            t0 = time.perf_counter()
            g.search(q + i * 1e-6, k=K, method=method)
            ts.append((time.perf_counter() - t0) * 1000)
        print(f"API  {method} no-filter p50 = {np.percentile(ts, 50):.3f} "
              f"ms  p10 = {np.percentile(ts, 10):.3f}", flush=True)

    flt = Filter(must={"class_name": "c5"})
    g.search(q, k=K, flt=flt, method="int8")
    ts = []
    for i in range(30):
        t0 = time.perf_counter()
        g.search(q + i * 1e-6, k=K, flt=flt, method="int8")
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"API  int8 cached-filter p50 = {np.percentile(ts, 50):.3f} ms",
          flush=True)

    # Reference: pure device loop (the bench.py protocol)
    from functools import partial

    scan = g._dev_int8
    f32 = g._dev_f32
    mask = g._device_mask(None)
    qd = jnp.asarray(q)

    @partial(jax.jit, static_argnames=("n",))
    def many(n, qq, sc, gf, m):
        def body(i, acc):
            s, _ = search_lib.int8_scan_topk(qq + i * 1e-6, sc, gf, m, k=K,
                                             rescore=128)
            return acc + jnp.sum(s)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(many(20, qd, scan, f32, mask))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(many(20, qd, scan, f32, mask))
        ts.append((time.perf_counter() - t0) * 1000 / 20)
    print(f"DEV  int8 device-loop p50 = {np.percentile(ts, 50):.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
