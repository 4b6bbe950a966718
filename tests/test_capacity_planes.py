"""Capacity-plane sidecar (gallery/planes.py): host/device quantise
parity, snapshot-keyed validity, and the restored view's writability.

The sidecar is the restart fast path for the capacity tier: the planes
are persisted at save time and streamed straight to device on the next
restart (DESIGN.md "capacity_10m" restart numbers) — so the tests pin
(a) that host-built planes are the same bytes the device build would
produce, (b) that a restored view answers exactly like a fresh build,
and (c) that any state drift past the sidecar falls back to the build.
"""

import numpy as np
import pytest

from retrieval_based_object_detection_tpu.gallery import (
    persist,
    planes,
    search as search_lib,
)
from retrieval_based_object_detection_tpu.gallery.capacity import (
    CapacitySearcher,
)
from retrieval_based_object_detection_tpu.gallery.schema import Payload
from retrieval_based_object_detection_tpu.gallery.store import (
    Gallery, VectorStore,
)


def _mk_gallery(n=1500, d=64, seed=0, name="planes") -> Gallery:
    rng = np.random.default_rng(seed)
    g = Gallery(name, dim=d, capacity=n + 64)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    ids = [f"p{i:05d}" for i in range(n)]
    pls = [Payload(data_type="original_images", class_name=f"c{i % 7}",
                   img_path=f"/i/{i}.png") for i in range(n)]
    g.upsert(ids, vecs, pls)
    return g


# ---------------------------------------------------------------- parity
def test_host_pack_matches_device_pack():
    """int4 codes and scales from the NumPy twin equal the device pack
    bit-for-bit on identical normalised rows (both round half-even);
    the bf16 mirror equals the device cast (both RTNE)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    rows = rng.normal(size=(257, 128)).astype(np.float32)
    h_bf16, h_packed, h_scales = planes.host_pack_planes(rows)

    norm = np.linalg.norm(rows, axis=1, keepdims=True).astype(np.float32)
    normed = rows / np.maximum(norm, 1e-12)
    d_packed, d_scales = search_lib.pack_rows_int4(jnp.asarray(normed))
    np.testing.assert_array_equal(h_packed, np.asarray(d_packed))
    np.testing.assert_allclose(h_scales, np.asarray(d_scales), rtol=1e-6)
    d_bf16 = jnp.asarray(normed).astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        h_bf16.view(np.uint16), np.asarray(d_bf16).view(np.uint16))


def test_sidecar_view_search_parity(tmp_path):
    """A view restored from the sidecar returns the same top-k rows and
    scores as a fresh chunked build from the f32 rows."""
    g = _mk_gallery()
    n = g._nrows
    store = VectorStore()
    store._collections["planes"] = g
    persist.save_store(store, tmp_path)
    persist.save_capacity_planes(g, tmp_path)

    fresh = CapacitySearcher(g._vectors[:n], g._alive[:n].copy(),
                             chunk=512)
    hdr, bf16, packed, scales = planes.open_sections(
        planes.sidecar_path(tmp_path, "planes"))
    assert hdr["n"] == n and hdr["dim"] == g.dim
    restored = CapacitySearcher.from_host_planes(
        bf16, packed, scales, g._alive[:n].copy(), n, chunk=512)

    q = np.random.default_rng(5).normal(size=(8, g.dim)
                                        ).astype(np.float32)
    s1, i1 = fresh.search(q, k=10)
    s2, i2 = restored.search(q, k=10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)


# ------------------------------------------------------------- lifecycle
def test_restart_uses_sidecar_and_stays_writable(tmp_path, monkeypatch):
    g = _mk_gallery()
    store = VectorStore()
    store._collections["planes"] = g
    persist.save_store(store, tmp_path)
    persist.save_capacity_planes(g, tmp_path)

    s2 = persist.load_store(tmp_path)
    g2 = s2.get("planes")
    assert g2._planes_path == str(planes.sidecar_path(tmp_path, "planes"))

    # Prove the sidecar path is taken: the chunked-build constructor
    # must never run.
    def boom(*a, **k):
        raise AssertionError("fresh build ran despite a valid sidecar")

    monkeypatch.setattr(CapacitySearcher, "__init__", boom)
    hits = g2.search(np.asarray(g2._vectors[7], np.float32), k=3,
                     exact=False, method="capacity")
    assert hits[0][0].id == "p00007"
    monkeypatch.undo()

    # The restored view must accept writes (headroom + tile patches).
    new = np.random.default_rng(9).normal(size=(4, g2.dim)
                                          ).astype(np.float32)
    ids = [f"new{i}" for i in range(4)]
    g2.upsert(ids, new, [Payload(data_type="original_images",
                                 class_name="nw", img_path=f"/n/{i}.png")
                         for i in range(4)])
    hits = g2.search(new[:1], k=1, exact=False, method="capacity")
    assert hits[0][0].id == "new0"
    # ... and deletes tombstone through the restored mask.
    g2.delete(ids=["p00007"])
    hits = g2.search(np.asarray(g2._vectors[7], np.float32), k=3,
                     exact=False, method="capacity")
    assert all(r.id != "p00007" for r in hits[0])


def test_stale_sidecar_falls_back(tmp_path, monkeypatch):
    """Any churn past the sidecar's (base_id, seq) must reject it."""
    g = _mk_gallery(n=600)
    store = VectorStore()
    store._collections["planes"] = g
    persist.save_store(store, tmp_path)
    persist.save_capacity_planes(g, tmp_path)
    # A delta save AFTER the sidecar: seq moves past the header's.
    g.upsert(["extra"], np.ones((1, g.dim), np.float32),
             [Payload(data_type="original_images", class_name="x",
                      img_path="/x.png")])
    persist.save_store(store, tmp_path)

    g2 = persist.load_store(tmp_path).get("planes")
    assert g2._planes_path is not None  # recorded, but stale

    def boom(*a, **k):
        raise AssertionError("stale sidecar was used")

    monkeypatch.setattr(CapacitySearcher, "from_host_planes", boom)
    hits = g2.search(np.ones(g2.dim, np.float32), k=1, exact=False,
                     method="capacity")
    assert hits[0][0].id == "extra"


def test_unsaved_churn_after_load_skips_sidecar(tmp_path, monkeypatch):
    g = _mk_gallery(n=400)
    store = VectorStore()
    store._collections["planes"] = g
    persist.save_store(store, tmp_path)
    persist.save_capacity_planes(g, tmp_path)

    g2 = persist.load_store(tmp_path).get("planes")
    g2.upsert(["live"], np.ones((1, g2.dim), np.float32),
              [Payload(data_type="original_images", class_name="x",
                       img_path="/l.png")])  # live write BEFORE first search

    def boom(*a, **k):
        raise AssertionError("sidecar used despite unsaved churn")

    monkeypatch.setattr(CapacitySearcher, "from_host_planes", boom)
    hits = g2.search(np.ones(g2.dim, np.float32), k=1, exact=False,
                     method="capacity")
    assert hits[0][0].id == "live"


def test_full_base_rewrite_unlinks_sidecar(tmp_path):
    g = _mk_gallery(n=300)
    store = VectorStore()
    store._collections["planes"] = g
    persist.save_store(store, tmp_path)
    persist.save_capacity_planes(g, tmp_path)
    path = planes.sidecar_path(tmp_path, "planes")
    assert path.exists()
    persist.save_gallery(g, tmp_path, incremental=False)
    assert not path.exists()
    assert g._planes_path is None


def test_save_requires_clean_snapshot_state(tmp_path):
    g = _mk_gallery(n=200)
    with pytest.raises(ValueError, match="save_gallery"):
        persist.save_capacity_planes(g, tmp_path)  # never saved
    store = VectorStore()
    store._collections["planes"] = g
    persist.save_store(store, tmp_path)
    g.upsert(["dirty"], np.ones((1, g.dim), np.float32),
             [Payload(data_type="original_images", class_name="x",
                      img_path="/d.png")])
    with pytest.raises(ValueError, match="unsaved churn"):
        persist.save_capacity_planes(g, tmp_path)


def test_delta_then_replanes_revalidates(tmp_path, monkeypatch):
    """save → planes → write → save (delta) → planes again: the second
    sidecar carries the new seq and is used after a restart."""
    g = _mk_gallery(n=350)
    store = VectorStore()
    store._collections["planes"] = g
    persist.save_store(store, tmp_path)
    persist.save_capacity_planes(g, tmp_path)
    g.upsert(["d1"], np.full((1, g.dim), 0.5, np.float32),
             [Payload(data_type="original_images", class_name="x",
                      img_path="/d1.png")])
    persist.save_store(store, tmp_path)
    persist.save_capacity_planes(g, tmp_path)

    g2 = persist.load_store(tmp_path).get("planes")

    def boom(*a, **k):
        raise AssertionError("fresh build ran despite a fresh sidecar")

    monkeypatch.setattr(CapacitySearcher, "__init__", boom)
    hits = g2.search(np.full(g2.dim, 0.5, np.float32), k=1, exact=False,
                     method="capacity")
    assert hits[0][0].id == "d1"
