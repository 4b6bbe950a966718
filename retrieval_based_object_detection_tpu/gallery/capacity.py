"""Single-chip capacity-mode serving view: int4 planes + bf16 rescore.

The Gallery's standard device mirrors top out where the f32 rescore
mirror stops fitting HBM: 1M × 512 costs 2 GB, but 10M × 512 would need
20 GB of f32 alone on a 16 GB v5e. This view makes the measured
10M-rows-on-one-chip configuration (DESIGN.md "capacity mode": 6.25 ms
per 16-query batch at 10.5M × 512 in 12.5 GB) reachable through a
store-level API instead of raw kernels:

  * int4 packed planes + per-row scales    — N·D/2 + 4N bytes (the scan)
  * bf16 rescore mirror                     — 2·N·D bytes (~1e-2 drift)
  * bool row mask (build-time filter)       — N bytes

built CHUNK-WISE from the host rows (one [chunk, D] f32 staging upload
at a time, cast/packed on device into donated buffers), so peak device
memory never exceeds the residency above plus one chunk — a bulk f32
upload would defeat the point.

Semantics match ``Gallery.search(method="int4")``: hit scores are
bf16-rescored cosine, the top-k set is ~99.3% of exact at 1M (the
4-bit resolution floor, hardware-measured; ``ops/int4_scan.py``). For
exactness use the Gallery's int8/f32 tiers at the scale they fit.

Role: the Qdrant-replacement story (SURVEY.md §2 native-audit #1) at
the gallery sizes where Qdrant itself would shard across hosts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_based_object_detection_tpu.gallery import search as search_lib

_CHUNK = 1 << 18  # staging rows per upload (512 MB f32 at D=512)


@partial(jax.jit, donate_argnums=(0, 1, 2))
def _fill_chunk(bf16, packed, scales, staged, start):
    """Normalise one staged f32 chunk on device and patch the three
    capacity buffers in place (donated → dynamic_update_slice, no copy)."""
    rows = staged / jnp.maximum(
        jnp.linalg.norm(staged, axis=1, keepdims=True), 1e-12)
    p, s = search_lib.pack_rows_int4(rows)
    bf16 = jax.lax.dynamic_update_slice(bf16, rows.astype(jnp.bfloat16),
                                        (start, 0))
    packed = jax.lax.dynamic_update_slice(packed, p, (start, 0))
    scales = jax.lax.dynamic_update_slice(scales, s, (start,))
    return bf16, packed, scales


class CapacitySearcher:
    """Immutable int4+bf16 serving view over gallery rows (see module
    docstring). The sibling of ``ShardedGallerySearcher`` for the
    single-chip many-rows regime."""

    def __init__(self, vectors: np.ndarray, mask: np.ndarray,
                 chunk: int = _CHUNK,
                 ids: list[str] | None = None):
        n, d = vectors.shape
        if d % 2:
            raise ValueError("capacity mode packs two dims per byte — "
                             "even dim required")
        self.n_rows = n
        # Lane-aligned chunk; padded to a chunk multiple so the chunked
        # fill tiles the buffers exactly (dynamic_update_slice clamps
        # out-of-range starts, which would silently misplace rows).
        chunk = max(256, (min(chunk, _CHUNK) // 256) * 256)
        self._padded = -(-n // chunk) * chunk
        bf16 = jnp.zeros((self._padded, d), jnp.bfloat16)
        packed = jnp.zeros((self._padded, d // 2), jnp.int8)
        scales = jnp.zeros(self._padded, jnp.float32)
        staged = np.zeros((chunk, d), np.float32)
        for start in range(0, self._padded, chunk):
            hi = min(start + chunk, n)
            staged[:] = 0.0
            if hi > start:
                staged[: hi - start] = vectors[start:hi]
            bf16, packed, scales = _fill_chunk(
                bf16, packed, scales, jnp.asarray(staged),
                jnp.int32(start))
        self.dev_bf16, self.dev_packed, self.dev_scales = (bf16, packed,
                                                           scales)
        mbuf = np.zeros(self._padded, bool)
        mbuf[:n] = mask
        self.dev_mask = jnp.asarray(mbuf)
        self.ids = ids  # optional row -> point-id mapping (from_gallery)

    @classmethod
    def from_gallery(cls, gallery, flt=None, chunk: int = _CHUNK
                     ) -> "CapacitySearcher":
        if gallery.distance != "cosine":
            raise ValueError("capacity mode quantises unit-norm rows — "
                             "cosine collections only")
        gallery.compact()  # dense live-row view (no-op if no tombstones)
        n = len(gallery)
        mask = (np.ones(n, bool) if flt is None
                else gallery._payloads.mask(flt))
        return cls(gallery._vectors[:n], mask, chunk=chunk,
                   ids=list(gallery._ids))

    def ids_of(self, idx: np.ndarray) -> list:
        """Translate ``search`` row indices to point ids (requires a
        view built via ``from_gallery`` or with ``ids=``). Shape is
        preserved as nested lists."""
        if self.ids is None:
            raise ValueError("this view was built from raw vectors — "
                             "construct with ids= or from_gallery for "
                             "id translation")
        return [[self.ids[int(i)] for i in row] for row in
                np.atleast_2d(idx)]

    def search(self, queries: np.ndarray, k: int = 10,
               rescore: int = 256,
               extra_mask: np.ndarray | None = None,
               ) -> tuple[np.ndarray, np.ndarray]:
        """(scores [Q, k], row indices [Q, k]); rows that fall outside
        the build mask / ``extra_mask`` score -inf. Callers translate
        indices to ids via the source gallery's row order."""
        from retrieval_based_object_detection_tpu.utils import platform

        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None]
        mask = self.dev_mask
        if extra_mask is not None:
            buf = np.zeros(self._padded, bool)
            buf[: self.n_rows] = extra_mask[: self.n_rows]
            mask = jnp.logical_and(mask, jnp.asarray(buf))
        if platform.is_tpu():
            scores, idx = search_lib.int4_scan_topk(
                jnp.asarray(queries), self.dev_packed, self.dev_scales,
                self.dev_bf16, mask, k=min(k, self.n_rows),
                rescore=rescore)
        else:
            scores, idx = search_lib.int4_cosine_topk(
                jnp.asarray(queries), self.dev_packed, self.dev_scales,
                self.dev_bf16, mask, k=min(k, self.n_rows),
                rescore=rescore)
        return np.asarray(scores), np.asarray(idx)
