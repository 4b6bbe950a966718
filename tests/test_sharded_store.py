"""The ICI-sharded tier BEHIND the one store API (VERDICT r3 #1).

Round 3 left `ShardedGallerySearcher` reachable only as a hand-built
library object; these tests drive it through `Gallery.search` on the
8-device CPU mesh: attach_mesh auto-routing, tier parity vs the
single-device paths, interleaved writes/deletes/filters through the
pending-op sync, cached sharded filter masks, and Record translation
(ids/payloads/scores) — the Qdrant-server replacement role served by
ONE API (02_qdrant_environment_setting.txt:1-8).
"""

import numpy as np
import pytest

from retrieval_based_object_detection_tpu.gallery.schema import Filter, Payload
from retrieval_based_object_detection_tpu.gallery.store import (
    Gallery,
    VectorStore,
)
from retrieval_based_object_detection_tpu.parallel.mesh import gallery_mesh

DIM = 32


def _mk(rng, n, start=0, cls=None):
    ids = [f"id{start + i}" for i in range(n)]
    vecs = rng.normal(size=(n, DIM)).astype(np.float32)
    pls = [Payload(data_type="original_images",
                   class_name=cls or ("a" if (start + i) % 2 else "b"),
                   img_path=f"/t/{start + i}.png") for i in range(n)]
    return ids, vecs, pls


def _fill(rng, n=400):
    g = Gallery("sh", dim=DIM)
    ids, vecs, pls = _mk(rng, n)
    g.upsert(ids, vecs, pls)
    return g, ids, vecs


def test_attach_mesh_auto_routes_and_matches_exact(rng):
    g, ids, vecs = _fill(rng)
    q = rng.normal(size=(3, DIM)).astype(np.float32)
    want = g.search(q, k=5)  # single-device exact (no mesh yet)
    g.attach_mesh(gallery_mesh(8))
    got = g.search(q, k=5)   # method=None -> auto "sharded"
    assert g._shard_view is not None
    for w_row, g_row in zip(want, got):
        assert [h.id for h in w_row] == [h.id for h in g_row]
        np.testing.assert_allclose([h.score for h in w_row],
                                   [h.score for h in g_row], atol=1e-5)
        # Records carry payloads through the sharded route too.
        assert all(h.payload.img_path for h in g_row)


def test_sharded_tiers_through_store_api(rng):
    g, ids, vecs = _fill(rng)
    mesh = gallery_mesh(8)
    g.attach_mesh(mesh)
    q = vecs[17] + 0.01 * rng.normal(size=DIM).astype(np.float32)
    exact = [h.id for h in g.search(q, k=5, method="sharded_exact")[0]]
    assert exact[0] == "id17"
    for tier in ("sharded_bf16", "sharded_int8", "sharded_int4"):
        got = [h.id for h in g.search(q, k=5, method=tier)[0]]
        assert got[0] == "id17", tier
        assert len(set(got) & set(exact)) >= 4, (tier, got, exact)


def test_sharded_requires_mesh(rng):
    g, *_ = _fill(rng, 40)
    with pytest.raises(ValueError, match="attach_mesh"):
        g.search(np.zeros(DIM, np.float32), method="sharded")
    with pytest.raises(ValueError, match="gallery"):
        from retrieval_based_object_detection_tpu.parallel.mesh import (
            make_mesh,
        )

        g.attach_mesh(make_mesh({"dp": 2, "tp": 4}))


def test_filtered_sharded_search_and_mask_cache(rng):
    g, ids, vecs = _fill(rng)
    g.attach_mesh(gallery_mesh(8))
    flt = Filter(must={"class_name": "a"})
    q = rng.normal(size=DIM).astype(np.float32)
    want = [h.id for h in g.search(q, k=5, flt=flt, method="exact")[0]]
    got = [h.id for h in g.search(q, k=5, flt=flt)[0]]
    assert got == want
    assert all(g.retrieve([h])[0].payload.class_name == "a" for h in got)
    # The per-filter sharded mask is CACHED (no re-upload per query)...
    key = flt.cache_key()
    cached = g._shard_mask_cache[key]
    g.search(q, k=5, flt=flt)
    assert g._shard_mask_cache[key] is cached
    # ...and invalidated by writes.
    nid, nv, npl = _mk(rng, 1, start=9000, cls="a")
    g.upsert(nid, nv, npl)
    assert key not in g._shard_mask_cache
    got2 = [h.id for h in g.search(nv[0], k=1, flt=flt)[0]]
    assert got2 == ["id9000"]


def test_interleaved_writes_deletes_through_api(rng):
    """The pending-op sync: mutations through the NORMAL store API keep
    the sharded view fresh — never a rebuild, never a stale read."""
    g, ids, vecs = _fill(rng, 300)
    g.attach_mesh(gallery_mesh(8))
    q0 = vecs[7]
    assert g.search(q0, k=1)[0][0].id == "id7"  # view built
    view = g._shard_view

    # Overwrite id7 with a far-away vector: its old location must lose.
    new7 = -vecs[7]
    g.upsert(["id7"], new7[None],
             [Payload(data_type="original_images", class_name="b",
                      img_path="/t/new7.png")])
    assert g._shard_view is view  # patched, not rebuilt
    hit = g.search(new7, k=1)[0][0]
    assert hit.id == "id7" and hit.payload.img_path == "/t/new7.png"

    # Delete a point: vanishes from the sharded route immediately.
    g.delete(ids=["id12"])
    assert all(h.id != "id12" for h in g.search(vecs[12], k=3)[0])
    assert g._shard_view is view

    # Append new points: land within headroom, searchable.
    aid, av, apl = _mk(rng, 5, start=500, cls="a")
    g.upsert(aid, av, apl)
    assert g.search(av[2], k=1)[0][0].id == "id502"
    assert g._shard_view is view

    # Re-upserting the deleted id resurrects it (Gallery semantics).
    g.upsert(["id12"], vecs[12][None],
             [Payload(data_type="original_images", class_name="a",
                      img_path="/t/12.png")])
    assert g.search(vecs[12], k=1)[0][0].id == "id12"

    # Full parity sweep vs single-device exact after all mutations.
    q = rng.normal(size=(4, DIM)).astype(np.float32)
    want = g.search(q, k=6, method="exact")
    got = g.search(q, k=6, method="sharded_exact")
    for w_row, g_row in zip(want, got):
        assert [h.id for h in w_row] == [h.id for h in g_row]


def test_tombstones_do_not_revive_inside_patched_runs(rng):
    """A write spanning rows around a tombstone must not mark the dead
    row valid again (the exact row-set pending-op contract — the same
    mask-revival bug class the capacity tier hit twice)."""
    g, ids, vecs = _fill(rng, 100)
    g.attach_mesh(gallery_mesh(8))
    g.search(vecs[0], k=1)
    g.delete(ids=["id50"])
    # Overwrite the rows AROUND the tombstone in one batch.
    g.upsert(["id49", "id51"], vecs[[49, 51]],
             [Payload(data_type="original_images", class_name="a",
                      img_path=f"/t/{i}.png") for i in (49, 51)])
    assert all(h.id != "id50" for h in g.search(vecs[50], k=5)[0])


def test_headroom_overflow_transparent_rebuild(rng):
    g, ids, vecs = _fill(rng, 64)
    g.attach_mesh(gallery_mesh(8))
    g.search(vecs[0], k=1)
    view = g._shard_view
    total = view.dev_vectors.shape[0]
    # Append past the padded capacity: one transparent rebuild.
    extra = total - 64 + 10
    aid, av, apl = _mk(rng, extra, start=1000, cls="a")
    g.upsert(aid, av, apl)
    assert g.search(av[-1], k=1)[0][0].id == aid[-1]
    assert g._shard_view is not view  # rebuilt once, then incremental


def test_compaction_rebuilds_view_consistently(rng, monkeypatch):
    monkeypatch.setattr(Gallery, "_COMPACT_DEAD_MIN", 8)
    g, ids, vecs = _fill(rng, 200)
    g.attach_mesh(gallery_mesh(8))
    g.search(vecs[0], k=1)
    g.delete(ids=[f"id{i}" for i in range(0, 120, 2)])  # 60 dead
    assert g._compact_due  # deferred (live sharded view)
    g.maintain()
    q = rng.normal(size=(2, DIM)).astype(np.float32)
    want = g.search(q, k=5, method="exact")
    got = g.search(q, k=5)  # auto sharded, view rebuilt post-compact
    for w_row, g_row in zip(want, got):
        assert [h.id for h in w_row] == [h.id for h in g_row]


def test_store_level_mesh_config(rng):
    store = VectorStore()
    g1 = store.create_collection("one", dim=DIM)
    ids, vecs, pls = _mk(rng, 60)
    g1.upsert(ids, vecs, pls)
    assert store.attach_mesh(gallery_mesh(8)) == 1
    assert g1.search(vecs[3], k=1)[0][0].id == "id3"
    assert g1._shard_view is not None
    # Collections created AFTER attach inherit the mesh.
    g2 = store.create_collection("two", dim=DIM)
    g2.upsert(ids, vecs, pls)
    g2.search(vecs[5], k=1)
    assert g2._shard_view is not None
    store.detach_mesh()
    assert g1._gallery_mesh is None and g2._gallery_mesh is None


def test_sharded_view_id_keyed_write_parity(rng):
    """ShardedGallerySearcher.upsert/delete — id-keyed parity with the
    capacity view (VERDICT r3 #1)."""
    from retrieval_based_object_detection_tpu.gallery.sharded import (
        ShardedGallerySearcher,
    )

    g, ids, vecs = _fill(rng, 120)
    mesh = gallery_mesh(8)
    view = ShardedGallerySearcher.from_gallery(g, mesh, headroom=64)
    # Overwrite by id + append a new id.
    newv = rng.normal(size=(2, DIM)).astype(np.float32)
    assert view.upsert(["id10", "fresh"], newv) == 2
    _, idx = view.search(newv[0], k=1)
    assert view.ids_of(idx)[0][0] == "id10"
    _, idx = view.search(newv[1], k=1)
    assert view.ids_of(idx)[0][0] == "fresh"
    # Id-keyed delete.
    assert view.delete(["id10", "missing"]) == 1
    _, idx = view.search(newv[0], k=1)
    assert view.ids_of(idx)[0][0] != "id10"


def test_capacity_scale_exact_raises_not_degrades(rng, monkeypatch):
    """Past the per-chip budget the sharded view keeps bf16+int4 planes
    only; a default (exact=True) search must FAIL LOUDLY, not silently
    serve int4-quantised top-k as if it were exact (review finding).
    exact=False and pinned sub-tiers keep serving."""
    monkeypatch.setattr(Gallery, "CAPACITY_AUTO_BYTES", 1)
    g, ids, vecs = _fill(rng)
    g.attach_mesh(gallery_mesh(8))
    with pytest.raises(ValueError, match="exact search is unavailable"):
        g.search(vecs[3], k=5)
    assert g._shard_view.capacity  # the view did build in capacity mode
    got = [h.id for h in g.search(vecs[3], k=5, exact=False)[0]]
    assert got[0] == "id3"
    got = [h.id for h in g.search(vecs[3], k=5,
                                  method="sharded_int4")[0]]
    assert got[0] == "id3"


def test_attach_mesh_drops_stale_capacity_view(rng):
    """attach_mesh must drop a live capacity view: auto-routing then
    targets the sharded tier, so the cap view would never be consulted
    again while every upsert/delete kept growing its pending-op log."""
    g, ids, vecs = _fill(rng)
    q = rng.normal(size=(2, DIM)).astype(np.float32)
    want = g.search(q, k=5)
    g.search(q, k=5, exact=False, method="capacity")  # builds _cap_view
    assert g._cap_view is not None
    g.attach_mesh(gallery_mesh(8))
    assert g._cap_view is None and not g._cap_pending
    # Writes with the mesh attached must not accrue cap-pending ops.
    nids, nvecs, npls = _mk(rng, 8, start=1000)
    g.upsert(nids, nvecs, npls)
    g.delete(ids=[ids[0]])
    assert not g._cap_pending
    # The sharded route serves the post-write state correctly.
    got = g.search(q, k=5)
    for w_row, g_row in zip(want, got):
        assert [h.id for h in w_row if h.id != ids[0]] \
            == [h.id for h in g_row if h.id not in set(nids)][
                : len([h for h in w_row if h.id != ids[0]])]
    # An explicit capacity search still works on demand (rebuilds).
    again = g.search(q, k=5, exact=False, method="capacity")
    assert g._cap_view is not None
    assert [h.id for h in again[0]]


def test_sharded_random_ops_match_exact_oracle(rng):
    """Randomised upsert/delete/filtered-search interleavings through
    the ONE store API with a mesh attached: the sharded route's top-1
    must always match the single-device exact tier, and tombstoned
    points must never surface — the capacity tier's fuzz oracle,
    applied to multi-chip (same mask-revival bug class)."""
    g = Gallery("shfuzz", dim=DIM)
    ids0, vecs0, pls0 = _mk(rng, 300)
    g.upsert(ids0, vecs0, pls0)
    g.attach_mesh(gallery_mesh(8))
    g.search(rng.normal(size=DIM).astype(np.float32), k=1)  # build view
    live = set(ids0)
    next_id = 1000
    for step in range(25):
        op = int(rng.integers(0, 3))
        if op == 0:  # upsert: mix of overwrites and appends
            n_w = int(rng.integers(1, 5))
            ids = []
            for _ in range(n_w):
                if live and rng.random() < 0.5:
                    ids.append(sorted(live)[int(rng.integers(0, len(live)))])
                else:
                    ids.append(f"id{next_id}")
                    next_id += 1
            ids = list(dict.fromkeys(ids))
            vecs = rng.normal(size=(len(ids), DIM)).astype(np.float32)
            g.upsert(ids, vecs,
                     [Payload(data_type="original_images",
                              class_name="a" if i % 2 else "b",
                              img_path=f"/f/{pid}.png")
                      for i, pid in enumerate(ids)])
            live.update(ids)
        elif op == 1 and len(live) > 5:  # delete some
            victims = [sorted(live)[int(i)] for i in
                       rng.integers(0, len(live), size=2)]
            g.delete(ids=victims)
            live.difference_update(victims)
        else:  # search: sharded top-1 == exact top-1 (self-retrieval)
            target = sorted(live)[int(rng.integers(0, len(live)))]
            row = g._id_to_row[target]
            q = g._vectors[row] + 0.001 * rng.normal(size=DIM).astype(
                np.float32)
            sh = g.search(q, k=3)[0]                      # auto sharded
            # Oracle WITHOUT detaching: explicit method="exact" bypasses
            # auto-routing, so the live shard view keeps syncing
            # incrementally across ops (the thing under test).
            exact = g.search(q, k=3, method="exact")[0]
            assert g._shard_view is not None
            assert sh[0].id == exact[0].id == target, (step, target)
            assert all(h.id in live for h in sh), (step, sh)
            # Filtered: results obey the filter AND liveness.
            flt = Filter(must={"class_name": "a"})
            fh = g.search(q, k=5, flt=flt)[0]
            assert all(h.payload.class_name == "a" and h.id in live
                       for h in fh), (step, fh)


def test_sharded_capacity_chunked_build_matches_direct_planes(rng):
    """The chunk-wise capacity build (bf16 + int4 patched via donated
    DUS on sharded buffers) must equal a direct full-array build
    bit-for-bit — chunking is a memory-layout decision, never a
    numerics one."""
    import jax.numpy as jnp

    from retrieval_based_object_detection_tpu.gallery import (
        search as search_lib,
    )
    from retrieval_based_object_detection_tpu.gallery import sharded as sh

    n = 700  # not chunk- or shard-aligned: exercises padding + tail
    vecs = rng.normal(size=(n, DIM)).astype(np.float32)
    mask = np.ones(n, bool)
    view = sh.ShardedGallerySearcher(vecs, mask, gallery_mesh(8),
                                     capacity=True)
    total = int(view.dev_vectors.shape[0])
    rows = vecs / np.maximum(
        np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    full = np.zeros((total, DIM), np.float32)
    full[:n] = rows
    want_bf16 = jnp.asarray(full).astype(jnp.bfloat16)
    want_packed, want_scales = search_lib.pack_rows_int4(
        jnp.asarray(full))
    got_packed, got_scales = view._dev_int4
    np.testing.assert_array_equal(
        np.asarray(view.dev_vectors, np.float32),
        np.asarray(want_bf16, np.float32))
    np.testing.assert_array_equal(np.asarray(got_packed),
                                  np.asarray(want_packed))
    np.testing.assert_allclose(np.asarray(got_scales),
                               np.asarray(want_scales), rtol=1e-6)
