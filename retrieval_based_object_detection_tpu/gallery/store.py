"""In-process vector gallery with Qdrant-equivalent semantics.

Capability contract (what the reference actually uses of Qdrant):
  * idempotent ``upsert`` keyed by deterministic IDs
    (31_clip_embedding_and_save_vector.py:176-179)
  * filtered ``scroll`` with/without vectors
    (32_create_delegate_vector.py:123-131, 33_run_all_experiments.py:96-150)
  * exact ``count`` (32_create_delegate_vector.py:66)
  * collection CRUD: list/create/rename/delete (util/qdrant_manager.py:41-141)
  * cosine similarity search (02_qdrant_environment_setting.txt:12-14)

Architecture: payloads live host-side in columnar NumPy (see
``schema.PayloadColumns``), vectors in a host float32 buffer mirrored lazily
into a padded device ``jax.Array``. Search never gathers: filters lower to a
boolean row mask and the device does one masked matmul + top_k
(``search.masked_cosine_topk``). A multi-device mesh variant lives in
``gallery.sharded``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_based_object_detection_tpu.gallery import search as search_lib
from retrieval_based_object_detection_tpu.gallery.schema import (
    Filter,
    Payload,
    PayloadColumns,
)


@dataclass
class Record:
    """One gallery point, as returned by scroll/retrieve/search."""

    id: str
    payload: Payload
    vector: np.ndarray | None = None
    score: float | None = None


class Gallery:
    """A single named collection of (id, vector, payload) points."""

    def __init__(self, name: str, dim: int = 512, capacity: int = 1024,
                 distance: str = "cosine"):
        if distance not in ("cosine", "dot", "euclid"):
            raise ValueError(f"unsupported distance: {distance}")
        self.name = name
        self.dim = dim
        self.distance = distance
        self._capacity = capacity
        self._vectors = np.zeros((capacity, dim), dtype=np.float32)
        self._payloads = PayloadColumns(capacity)
        self._ids: list[str] = []
        self._id_to_row: dict[str, int] = {}
        # Device mirrors (built lazily; invalidated by writes).
        self._dev_vectors: jax.Array | None = None
        self._dev_int8: jax.Array | None = None
        self._dev_valid: np.ndarray | None = None

    # ------------------------------------------------------------ size
    def __len__(self) -> int:
        return len(self._ids)

    def count(self, flt: Filter | None = None) -> int:
        if flt is None:
            return len(self._ids)
        return int(self._payloads.mask(flt).sum())

    # ------------------------------------------------------------ writes
    def _ensure_capacity(self, extra: int) -> None:
        need = len(self._ids) + extra
        if need <= self._capacity:
            return
        new_cap = self._capacity
        while new_cap < need:
            new_cap *= 2
        vecs = np.zeros((new_cap, self.dim), dtype=np.float32)
        vecs[: self._capacity] = self._vectors
        self._vectors = vecs
        self._payloads.grow(new_cap)
        self._capacity = new_cap

    def upsert(
        self,
        ids: Sequence[str],
        vectors: np.ndarray | Sequence[Sequence[float]],
        payloads: Sequence[Payload | dict],
    ) -> int:
        """Insert-or-replace a batch of points; returns number written."""
        if len(ids) == 0:
            return 0
        vectors = np.asarray(vectors, dtype=np.float32)
        if vectors.ndim == 1:
            vectors = vectors[None, :]
        if vectors.shape != (len(ids), self.dim):
            raise ValueError(
                f"vectors shape {vectors.shape} != ({len(ids)}, {self.dim})"
            )
        if len(payloads) != len(ids):
            raise ValueError("payloads/ids length mismatch")
        self._ensure_capacity(len(ids))
        for i, pid in enumerate(ids):
            payload = payloads[i]
            if isinstance(payload, dict):
                payload = Payload.from_dict(payload)
            row = self._id_to_row.get(pid)
            if row is None:
                row = len(self._ids)
                self._ids.append(pid)
                self._id_to_row[pid] = row
            self._vectors[row] = vectors[i]
            self._payloads.set_row(row, payload)
        self._dev_vectors = None
        return len(ids)

    def upsert_points(
        self, points: Iterable[tuple[str, np.ndarray, Payload]]
    ) -> int:
        pts = list(points)
        if not pts:
            return 0
        ids = [p[0] for p in pts]
        vecs = np.stack([np.asarray(p[1], dtype=np.float32) for p in pts])
        pls = [p[2] for p in pts]
        return self.upsert(ids, vecs, pls)

    def delete(self, ids: Sequence[str] | None = None,
               flt: Filter | None = None) -> int:
        """Delete by explicit IDs or by filter; returns number removed."""
        n = len(self._ids)
        drop = np.zeros(n, dtype=bool)
        if ids is not None:
            for pid in ids:
                row = self._id_to_row.get(pid)
                if row is not None:
                    drop[row] = True
        if flt is not None:
            drop |= self._payloads.mask(flt)
        if not drop.any():
            return 0
        keep = ~drop
        self._vectors[: keep.sum()] = self._vectors[:n][keep]
        self._payloads.compact(keep)
        new_ids: list[str] = []
        new_map: dict[str, int] = {}
        for i, pid in enumerate(self._ids):
            if keep[i]:
                new_map[pid] = len(new_ids)
                new_ids.append(pid)
        removed = n - len(new_ids)
        self._ids = new_ids
        self._id_to_row = new_map
        self._dev_vectors = None
        return removed

    # ------------------------------------------------------------ reads
    def retrieve(self, ids: Sequence[str], with_vectors: bool = True
                 ) -> list[Record]:
        out = []
        for pid in ids:
            row = self._id_to_row.get(pid)
            if row is None:
                continue
            out.append(
                Record(
                    id=pid,
                    payload=self._payloads.get_row(row),
                    vector=self._vectors[row].copy() if with_vectors else None,
                )
            )
        return out

    def get_by_path(self, img_path: str, with_vectors: bool = True
                    ) -> Record | None:
        """O(1) lookup by exact img_path (33_run_all_experiments.py:96-110)."""
        row = self._payloads.row_by_path(img_path)
        if row is None:
            return None
        return Record(
            id=self._ids[row],
            payload=self._payloads.get_row(row),
            vector=self._vectors[row].copy() if with_vectors else None,
        )

    def scroll(
        self,
        flt: Filter | None = None,
        limit: int = 10,
        offset: int = 0,
        with_vectors: bool = False,
    ) -> tuple[list[Record], int | None]:
        """Paginated filtered listing in insertion order.

        Returns (records, next_offset) where next_offset is None when
        exhausted — the same pagination contract as Qdrant's scroll.
        """
        mask = self._payloads.mask(flt)
        rows = np.nonzero(mask)[0]
        window = rows[offset : offset + limit]
        records = [
            Record(
                id=self._ids[r],
                payload=self._payloads.get_row(int(r)),
                vector=self._vectors[r].copy() if with_vectors else None,
            )
            for r in window
        ]
        next_offset = offset + limit if offset + limit < len(rows) else None
        return records, next_offset

    def distinct(self, fieldname: str, flt: Filter | None = None
                 ) -> list:
        """Sorted distinct values of a dictionary-encoded field among rows
        matching the filter — O(rows) on the codes column, no scrolling."""
        cols = self._payloads
        if fieldname not in cols._CODED:
            raise KeyError(f"not a coded field: {fieldname}")
        mask = cols.mask(flt)
        codes = np.unique(cols._cols[fieldname][: self.count()][mask])
        decode = cols._decode[fieldname]
        return sorted(decode[c] for c in codes if c >= 0)

    def vectors_matching(self, flt: Filter | None = None) -> np.ndarray:
        """All vectors matching a filter as one [M, D] float32 array."""
        mask = self._payloads.mask(flt)
        return self._vectors[: len(self._ids)][mask].copy()

    # ------------------------------------------------------------ search
    def _device_state(self) -> tuple[jax.Array, np.ndarray]:
        """Padded, L2-pre-normalised device mirror. Rebuilt lazily after
        writes (``_dev_vectors`` is invalidated to None); pre-normalising
        once per sync means queries pay one matmul, not an extra
        normalisation pass over the whole gallery in HBM."""
        n = len(self._ids)
        padded = search_lib.pad_rows(n)
        if self._dev_vectors is None or self._dev_vectors.shape[0] != padded:
            buf = np.zeros((padded, self.dim), dtype=np.float32)
            rows = self._vectors[:n]
            norms = np.linalg.norm(rows, axis=1, keepdims=True)
            buf[:n] = rows / np.maximum(norms, 1e-12)
            self._dev_vectors = jnp.asarray(buf)
            self._dev_int8 = None
            valid = np.zeros(padded, dtype=bool)
            valid[:n] = True
            self._dev_valid = valid
        return self._dev_vectors, self._dev_valid

    def _device_int8(self) -> jax.Array:
        """int8 mirror of the normalised rows (built on first int8 query)."""
        dev_vectors, _ = self._device_state()
        if self._dev_int8 is None:
            self._dev_int8 = search_lib.quantize_rows_int8(dev_vectors)
        return self._dev_int8

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        flt: Filter | None = None,
        exact: bool = True,
        with_vectors: bool = False,
        method: str | None = None,
    ) -> list[list[Record]]:
        """Batched cosine top-k. ``queries`` is [Q, D] or [D].

        ``method``: "exact" (f32 HIGHEST), "bf16" (fast MXU scan), or
        "int8" (quarter-bandwidth int8 scan + exact f32 rescore of the top
        candidates). Defaults from the legacy ``exact`` flag.
        """
        if method is None:
            method = "exact" if exact else "bf16"
        queries = np.asarray(queries, dtype=np.float32)
        single = queries.ndim == 1
        if single:
            queries = queries[None, :]
        n = len(self._ids)
        if n == 0:
            return [[] for _ in range(queries.shape[0])]
        dev_vectors, valid = self._device_state()
        mask = np.zeros(dev_vectors.shape[0], dtype=bool)
        mask[:n] = self._payloads.mask(flt)
        k_eff = min(k, n)
        if method == "int8":
            scores, idx = search_lib.int8_cosine_topk(
                jnp.asarray(queries), self._device_int8(), dev_vectors,
                jnp.asarray(mask), k=k_eff,
                rescore=min(max(4 * k_eff, 64), dev_vectors.shape[0]),
            )
        else:
            scores, idx = search_lib.masked_cosine_topk(
                jnp.asarray(queries), dev_vectors, jnp.asarray(mask),
                k=k_eff, exact=(method == "exact"), gallery_normalized=True,
            )
        scores = np.asarray(scores)
        idx = np.asarray(idx)
        results: list[list[Record]] = []
        for qi in range(queries.shape[0]):
            hits = []
            for j in range(k_eff):
                if scores[qi, j] <= float(search_lib.NEG_INF) / 2:
                    break
                row = int(idx[qi, j])
                hits.append(
                    Record(
                        id=self._ids[row],
                        payload=self._payloads.get_row(row),
                        vector=self._vectors[row].copy()
                        if with_vectors else None,
                        score=float(scores[qi, j]),
                    )
                )
            results.append(hits)
        return results

    # ------------------------------------------------------------ export
    def to_arrays(self) -> dict[str, Any]:
        n = len(self._ids)
        return {
            "ids": list(self._ids),
            "vectors": self._vectors[:n].copy(),
            "payloads": [self._payloads.get_row(i).to_dict() for i in range(n)],
            "dim": self.dim,
            "distance": self.distance,
        }

    @staticmethod
    def from_arrays(name: str, data: dict[str, Any]) -> "Gallery":
        dim = int(data["dim"])
        g = Gallery(name, dim=dim,
                    capacity=max(1024, len(data["ids"])),
                    distance=data.get("distance", "cosine"))
        payloads = [Payload.from_dict(p) for p in data["payloads"]]
        if data["ids"]:
            g.upsert(data["ids"], data["vectors"], payloads)
        return g


class VectorStore:
    """Named-collection manager (the util/qdrant_manager.py equivalent)."""

    def __init__(self) -> None:
        self._collections: dict[str, Gallery] = {}
        # Names whose snapshots should be removed at next save — only
        # explicit deletes/renames go here, never load failures (a
        # skipped-on-load collection must survive unrelated saves).
        self._tombstones: set[str] = set()

    def list_collections(self) -> list[tuple[str, int]]:
        """[(name, point_count)] — mirrors qdrant_manager.py:41-50."""
        return [(n, len(g)) for n, g in sorted(self._collections.items())]

    def create_collection(self, name: str, dim: int = 512,
                          distance: str = "cosine",
                          recreate: bool = True) -> Gallery:
        """Create (or recreate, matching ``recreate_collection`` semantics at
        qdrant_manager.py:82-85) a collection."""
        if name in self._collections and not recreate:
            raise KeyError(f"collection exists: {name}")
        g = Gallery(name, dim=dim, distance=distance)
        self._collections[name] = g
        self._tombstones.discard(name)
        return g

    def get(self, name: str) -> Gallery:
        return self._collections[name]

    def __contains__(self, name: str) -> bool:
        return name in self._collections

    def rename_collection(self, old: str, new: str) -> None:
        """Copy-then-delete rename (qdrant_manager.py:90-102)."""
        if new in self._collections:
            raise KeyError(f"collection exists: {new}")
        g = self._collections.pop(old)
        g.name = new
        self._collections[new] = g
        self._tombstones.add(old)
        self._tombstones.discard(new)

    def delete_collection(self, name: str) -> None:
        del self._collections[name]
        self._tombstones.add(name)

    def delete_all_collections(self) -> int:
        n = len(self._collections)
        self._tombstones.update(self._collections)
        self._collections.clear()
        return n
