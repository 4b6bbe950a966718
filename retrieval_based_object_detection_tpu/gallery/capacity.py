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


# Incremental write path (fixed [TILE, D] shapes → one compile each, not
# one per write size). Tiles re-use _fill_chunk, whose donated
# dynamic_update_slice patches in place at any staged shape.
_TILE = 4096


@partial(jax.jit, donate_argnums=(0, 1, 2))
def _patch_planes_chunk(bf16, packed, scales, s_b, s_p, s_s, start):
    """Patch one pre-quantised chunk into the three capacity buffers —
    the sidecar-restore twin of ``_fill_chunk`` (no normalise/pack: the
    planes were computed host-side at save time, gallery/planes.py)."""
    bf16 = jax.lax.dynamic_update_slice(bf16, s_b, (start, 0))
    packed = jax.lax.dynamic_update_slice(packed, s_p, (start, 0))
    scales = jax.lax.dynamic_update_slice(scales, s_s, (start,))
    return bf16, packed, scales


@partial(jax.jit, static_argnames=("tile",))
def _read_tile(bf16, start, tile=_TILE):
    return jax.lax.dynamic_slice(
        bf16, (start, 0), (tile, bf16.shape[1])).astype(jnp.float32)


@partial(jax.jit, donate_argnums=(0,))
def _patch_mask_tile(mask, staged, start):
    return jax.lax.dynamic_update_slice(mask, staged, (start,))


class CapacitySearcher:
    """Writable int4+bf16 serving view over gallery rows (see module
    docstring). The sibling of ``ShardedGallerySearcher`` for the
    single-chip many-rows regime.

    Writes are INCREMENTAL (VERDICT r2 weak #3: the flagship-scale view
    was read-only — any upsert meant a full chunked rebuild of 12.5 GB
    of device buffers): ``upsert_rows``/``upsert`` patch only the
    affected fixed-size tiles (full tiles push straight from the new
    rows; partial edge tiles read back the 4 MB bf16 tile, overlay, and
    re-push — re-quantising the int4 plane of those rows from their
    bf16-rounded values, far below int4's own resolution). ``delete``
    tombstones via the row mask without touching the planes."""

    def __init__(self, vectors: np.ndarray, mask: np.ndarray,
                 chunk: int = _CHUNK,
                 ids: list[str] | None = None,
                 headroom: int = 0):
        n, d = vectors.shape
        if d % 2:
            raise ValueError("capacity mode packs two dims per byte — "
                             "even dim required")
        self.n_rows = n
        self.dim = d
        # Lane-aligned chunk; padded to a chunk multiple so the chunked
        # fill tiles the buffers exactly (dynamic_update_slice clamps
        # out-of-range starts, which would silently misplace rows).
        # ``headroom`` extra rows reserve append capacity for the write
        # path (growing the planes later costs a full device copy).
        chunk = max(256, (min(chunk, _CHUNK) // 256) * 256)
        self._padded = -(-(n + max(0, headroom)) // chunk) * chunk
        bf16 = jnp.zeros((self._padded, d), jnp.bfloat16)
        packed = jnp.zeros((self._padded, d // 2), jnp.int8)
        scales = jnp.zeros(self._padded, jnp.float32)
        staged = np.zeros((chunk, d), np.float32)
        for start in range(0, self._padded, chunk):
            hi = min(start + chunk, n)
            staged[:] = 0.0
            if hi > start:
                staged[: hi - start] = vectors[start:hi]
            # staged is REUSED (zeroed + refilled) next iteration while
            # this fill may still be pending — the transfer must copy
            # (search_lib.staged; CPU jnp.asarray aliases host memory).
            bf16, packed, scales = _fill_chunk(
                bf16, packed, scales, search_lib.staged(staged),
                jnp.int32(start))
        self.dev_bf16, self.dev_packed, self.dev_scales = (bf16, packed,
                                                           scales)
        # Host shadow of the row mask (N bytes — trivial even at 10M):
        # mask writes mutate the shadow then re-push only affected tiles.
        self._host_mask = np.zeros(self._padded, bool)
        self._host_mask[:n] = mask
        # _set_mask_range mutates _host_mask in place later — copy-guard.
        self.dev_mask = search_lib.staged(self._host_mask)
        self.ids = ids  # optional row -> point-id mapping (from_gallery)
        self._id_to_row: dict[str, int] | None = None

    @classmethod
    def from_device_planes(cls, bf16, packed, scales, mask,
                           n_rows: int, ids: list[str] | None = None
                           ) -> "CapacitySearcher":
        """Wrap ALREADY-BUILT device planes (e.g. generated on device by
        a benchmark, or restored) without a host-side fill pass.

        The plane row count must be a multiple of 256 (the minimum patch
        tile): ``_tile``/``upsert_rows`` assume the tiles divide the
        padded rows exactly, and ``dynamic_update_slice`` CLAMPS an
        out-of-range start — an edge-tile write on a non-divisible view
        would silently land on the wrong rows (ADVICE r3, confirmed on a
        300-row view)."""
        if int(bf16.shape[0]) % 256:
            raise ValueError(
                f"plane row count {int(bf16.shape[0])} is not a multiple "
                "of 256 — pad the planes (the incremental write path "
                "patches fixed tiles that must divide the row count)")
        obj = cls.__new__(cls)
        obj.n_rows = n_rows
        obj.dim = int(bf16.shape[1])
        obj._padded = int(bf16.shape[0])
        obj.dev_bf16, obj.dev_packed, obj.dev_scales = bf16, packed, scales
        # Pad a rows-length mask to the plane row count (the kernels and
        # the tile patcher both index by padded rows).
        host_mask = np.zeros(obj._padded, dtype=bool)
        m = np.asarray(mask, dtype=bool)
        host_mask[: len(m)] = m[: obj._padded]
        obj._host_mask = host_mask
        obj.dev_mask = search_lib.staged(host_mask)  # mutated by writes
        obj.ids = ids
        obj._id_to_row = None
        return obj

    @classmethod
    def from_host_planes(cls, bf16_rows: np.ndarray,
                         packed_rows: np.ndarray,
                         scales_rows: np.ndarray,
                         mask: np.ndarray, n_rows: int,
                         ids: list[str] | None = None,
                         headroom: int = 0,
                         chunk: int = _CHUNK) -> "CapacitySearcher":
        """Build the view from ALREADY-QUANTISED host planes (a
        ``gallery/planes.py`` sidecar) — the restart fast path: 2.5·N·D
        bytes uploaded, zero device quantisation. Inputs may be
        read-only memmaps; the chunked fill stages fixed-shape buffers
        so peak host RAM stays one chunk. Layout/padding matches the
        f32 constructor (chunk-multiple rows, zero tail)."""
        d = int(bf16_rows.shape[1])
        if packed_rows.shape != (n_rows, d // 2) or \
                scales_rows.shape[0] != n_rows or \
                bf16_rows.shape[0] != n_rows:
            raise ValueError("plane shapes disagree with n_rows/dim")
        chunk = max(256, (min(chunk, _CHUNK) // 256) * 256)
        padded = -(-(n_rows + max(0, headroom)) // chunk) * chunk
        bf16 = jnp.zeros((padded, d), jnp.bfloat16)
        packed = jnp.zeros((padded, d // 2), jnp.int8)
        scales = jnp.zeros(padded, jnp.float32)
        bdt = bf16_rows.dtype  # ml_dtypes.bfloat16
        st_b = np.zeros((chunk, d), bdt)
        st_p = np.zeros((chunk, d // 2), np.int8)
        st_s = np.zeros(chunk, np.float32)
        for start in range(0, padded, chunk):
            hi = min(start + chunk, n_rows)
            st_b.fill(0)
            st_p.fill(0)
            st_s.fill(0.0)
            if hi > start:
                m = hi - start
                st_b[:m] = bf16_rows[start:hi]
                st_p[:m] = packed_rows[start:hi]
                st_s[:m] = scales_rows[start:hi]
            # Staging buffers are REUSED next iteration while this
            # patch may still be pending — copy-guard the transfers
            # (search_lib.staged; CPU jnp.asarray aliases host memory).
            bf16, packed, scales = _patch_planes_chunk(
                bf16, packed, scales, search_lib.staged(st_b),
                search_lib.staged(st_p), search_lib.staged(st_s),
                jnp.int32(start))
        return cls.from_device_planes(bf16, packed, scales, mask,
                                      n_rows, ids=ids)

    @classmethod
    def from_gallery(cls, gallery, flt=None, chunk: int = _CHUNK,
                     headroom: int = 0) -> "CapacitySearcher":
        if gallery.distance != "cosine":
            raise ValueError("capacity mode quantises unit-norm rows — "
                             "cosine collections only")
        gallery.compact()  # dense live-row view (no-op if no tombstones)
        n = len(gallery)
        mask = (np.ones(n, bool) if flt is None
                else gallery._payloads.mask(flt))
        return cls(gallery._vectors[:n], mask, chunk=chunk,
                   ids=list(gallery._ids), headroom=headroom)

    def ids_of(self, idx: np.ndarray) -> list:
        """Translate ``search`` row indices to point ids (requires a
        view built via ``from_gallery`` or with ``ids=``). Shape is
        preserved as nested lists."""
        if self.ids is None:
            raise ValueError("this view was built from raw vectors — "
                             "construct with ids= or from_gallery for "
                             "id translation")
        # Rows past the id list (row-keyed appends never recorded an
        # id; approx_max_k pads short results with arbitrary indices
        # next to -inf sentinel scores) map to None — parity with
        # ShardedGallerySearcher.ids_of.
        n = len(self.ids)
        return [[self.ids[int(i)] if 0 <= int(i) < n else None
                 for i in row] for row in np.atleast_2d(idx)]

    # ------------------------------------------------------------ writes
    @property
    def _tile(self) -> int:
        # Fixed patch granularity that tiles the padded buffers exactly;
        # the default chunking (multiples of 2^18) always admits _TILE,
        # small test views fall back to 256-row tiles.
        return _TILE if self._padded % _TILE == 0 else 256

    def capacity_left(self) -> int:
        """Rows that can still be appended without a plane rebuild."""
        return self._padded - self.n_rows

    def upsert_rows(self, start: int, vectors: np.ndarray) -> None:
        """Overwrite/append rows [start, start+m) incrementally.

        Full tiles push straight from the new rows; partial edge tiles
        read back the bf16 tile, overlay, and re-push (the re-packed
        int4 of untouched rows differs only by bf16 rounding — far
        below int4's resolution). Appends must fit the build-time
        ``headroom``; beyond it, rebuild (documented trade: growing the
        planes is a full-size device copy either way)."""
        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim == 1:
            vectors = vectors[None]
        m, d = vectors.shape
        if d != self.dim:
            raise ValueError(f"dim {d} != view dim {self.dim}")
        if start < 0 or start > self.n_rows:
            raise ValueError(
                f"start {start} outside [0, {self.n_rows}] — capacity "
                "writes are overwrites or contiguous appends")
        end = start + m
        if end > self._padded:
            raise ValueError(
                f"write to row {end} exceeds capacity {self._padded}; "
                "rebuild the view (or build with headroom=)")
        tile = self._tile
        for ts in range((start // tile) * tile, end, tile):
            te = ts + tile
            if ts >= start and te <= end:
                staged = vectors[ts - start: te - start]
            else:
                # Edge tile: read back (tile x D bf16 — 4 MB at D=512),
                # overlay the new rows, re-push the whole tile.
                staged = np.array(_read_tile(self.dev_bf16, jnp.int32(ts),
                                             tile=tile))  # writable copy
                lo, hi = max(start, ts), min(end, te)
                staged[lo - ts: hi - ts] = vectors[lo - start: hi - start]
            # Reassign the attributes EVERY iteration: _fill_chunk donates
            # the old buffers, so holding them in locals across a mid-loop
            # failure (device OOM on a big multi-tile write) would leave
            # self.dev_* pointing at deleted arrays and brick the view
            # (ADVICE r3). A partial write now leaves a usable view.
            # Full-tile staged is a SLICE of the caller's vectors (often
            # the gallery's live host buffer) — copy-guard the transfer.
            self.dev_bf16, self.dev_packed, self.dev_scales = _fill_chunk(
                self.dev_bf16, self.dev_packed, self.dev_scales,
                search_lib.staged(staged), jnp.int32(ts))
        self.n_rows = max(self.n_rows, end)
        self._set_mask_range(start, end, True)

    def _set_mask_range(self, lo: int, hi: int, value: bool) -> None:
        self._host_mask[lo:hi] = value
        tile = self._tile
        for ts in range((lo // tile) * tile, hi, tile):
            # Reassign INSIDE the loop: _patch_mask_tile donates its
            # input, so holding the result in a local until after the
            # loop leaves self.dev_mask pointing at a deleted buffer if
            # a later iteration raises (same ADVICE-r3 class as
            # upsert_rows — a partial write must leave a usable view).
            self.dev_mask = _patch_mask_tile(
                self.dev_mask,
                search_lib.staged(self._host_mask[ts: ts + tile]),
                jnp.int32(ts))

    def _ensure_id_map(self) -> dict[str, int]:
        if self.ids is None:
            raise ValueError("id-keyed writes need a view built with "
                             "ids= (or from_gallery)")
        if self._id_to_row is None or len(self._id_to_row) != len(self.ids):
            self._id_to_row = {pid: i for i, pid in enumerate(self.ids)}
        return self._id_to_row

    def upsert(self, ids, vectors: np.ndarray) -> int:
        """Id-keyed insert-or-replace (Gallery.upsert semantics at
        capacity scale). Scattered rows are grouped into contiguous runs
        so each run pays one incremental patch."""
        return id_keyed_upsert(self, ids, vectors, self._padded)

    def set_rows_invalid(self, rows) -> int:
        """Tombstone rows BY INDEX via the mask — the planes stay put.
        Mask tiles are pushed ONCE for the whole batch (per-row pushes
        cost a tunnel round trip each; 1k deletes would be ~30 s of
        pure dispatch overhead at the scale this class serves)."""
        live = [int(r) for r in rows
                if 0 <= int(r) < self.n_rows and self._host_mask[int(r)]]
        for r in live:
            self._host_mask[r] = False
        if live:
            tile = self._tile
            for ts in sorted({(r // tile) * tile for r in live}):
                # In-loop reassignment: see _set_mask_range (donation
                # safety on partial failure).
                self.dev_mask = _patch_mask_tile(
                    self.dev_mask,
                    search_lib.staged(self._host_mask[ts: ts + tile]),
                    jnp.int32(ts))
        return len(live)

    def delete(self, ids) -> int:
        """Tombstone rows by id via the mask (see set_rows_invalid)."""
        id_map = self._ensure_id_map()
        return self.set_rows_invalid(
            [id_map[pid] for pid in ids if pid in id_map])

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
        # The final top-k ranks within the rescored candidate set — a
        # k beyond it must widen the set, not crash lax.top_k.
        rescore = min(max(rescore, k), self._padded)
        mask = self.dev_mask
        if extra_mask is not None:
            if (isinstance(extra_mask, jax.Array)
                    and extra_mask.shape[0] == self._padded):
                # Already padded + device-resident (the Gallery caches
                # per-filter masks — re-uploading N bools per query
                # would dominate small-query latency at 10M rows).
                mask = jnp.logical_and(mask, extra_mask)
            else:
                buf = np.zeros(self._padded, bool)
                # Clamp to the shorter of mask/view: a host mask built
                # before an append is still valid for the rows it
                # covers (appended rows default to excluded) — parity
                # with the sharded twin's handling.
                m = np.asarray(extra_mask, bool)
                n = min(self.n_rows, m.shape[0])
                buf[:n] = m[:n]
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


def id_keyed_upsert(view, ids, vectors: np.ndarray,
                    row_capacity: int) -> int:
    """Shared id-keyed insert-or-replace for the writable device views
    (``CapacitySearcher`` and ``ShardedGallerySearcher`` — one
    implementation so their Gallery.upsert semantics cannot drift).
    Scattered rows group into contiguous runs (one incremental patch
    each); new ids append within ``row_capacity``. The capacity
    PRE-CHECK runs before any id-map mutation so a mid-write overflow
    leaves no phantom ids mapped to unwritten rows (ADVICE r3 class).
    ``view`` provides: ``_ensure_id_map()``, ``n_rows``, ``ids``,
    ``capacity_left()``, ``upsert_rows(start, vecs)``."""
    vectors = np.asarray(vectors, np.float32)
    if vectors.ndim == 1:
        vectors = vectors[None]
    if len(ids) != vectors.shape[0]:
        raise ValueError("ids/vectors length mismatch")
    id_map = view._ensure_id_map()
    n_new = len({pid for pid in ids if pid not in id_map})
    if view.n_rows + n_new > row_capacity:
        raise ValueError(
            f"{n_new} new ids exceed capacity "
            f"({view.capacity_left()} rows left of {row_capacity}); "
            "rebuild the view (or build with headroom=)")
    rows = np.empty(len(ids), np.int64)
    next_row = view.n_rows
    for i, pid in enumerate(ids):
        row = id_map.get(pid)
        if row is None:  # new id -> contiguous append slot
            row = next_row
            id_map[pid] = row
            view.ids.append(pid)
            next_row += 1
        rows[i] = row
    order = np.argsort(rows, kind="stable")
    rows_s, vecs_s = rows[order], vectors[order]
    run_start = 0
    for i in range(1, len(rows_s) + 1):
        if i == len(rows_s) or rows_s[i] != rows_s[i - 1] + 1:
            view.upsert_rows(int(rows_s[run_start]), vecs_s[run_start:i])
            run_start = i
    return len(ids)
