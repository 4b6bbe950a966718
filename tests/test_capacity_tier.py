"""Gallery.search(method="capacity"): the beyond-mirror-scale serving
tier through the ONE store API — lazily built writable CapacitySearcher,
kept in sync via the pending-op log (upsert ranges, delete masks), with
cached per-filter device masks and auto-routing once the standard
mirrors would exceed the HBM budget.
"""

import numpy as np
import pytest

from retrieval_based_object_detection_tpu.gallery.schema import Filter, Payload
from retrieval_based_object_detection_tpu.gallery.store import Gallery

DIM = 64


@pytest.fixture
def rng():
    return np.random.default_rng(5)


def _fill(g, rng, n, start=0):
    vecs = rng.normal(size=(n, DIM)).astype(np.float32)
    g.upsert([f"p{start + i}" for i in range(n)], vecs,
             [Payload(data_type="original_images",
                      class_name=f"c{(start + i) % 4}",
                      img_path=f"/c/{start + i}.png") for i in range(n)])
    return vecs


def test_capacity_method_matches_exact_modulo_bf16(rng):
    g = Gallery("cap", dim=DIM)
    vecs = _fill(g, rng, 800)
    q = vecs[123] + 0.01 * rng.normal(size=DIM).astype(np.float32)
    exact = g.search(q, k=5, method="exact")[0]
    cap = g.search(q, k=5, method="capacity")[0]
    assert cap[0].id == exact[0].id == "p123"
    assert {h.id for h in cap} == {h.id for h in exact}
    for e, c in zip(exact, cap):
        assert abs(e.score - c.score) < 2e-2  # bf16 rescore drift


def test_capacity_tier_syncs_incrementally(rng):
    g = Gallery("capw", dim=DIM)
    _fill(g, rng, 500)
    g.search(rng.normal(size=DIM).astype(np.float32), k=3,
             method="capacity")
    view = g._cap_view
    assert view is not None

    # Overwrite + append + delete through the NORMAL store API.
    new = rng.normal(size=(2, DIM)).astype(np.float32)
    g.upsert(["p7", "extra"], new,
             [Payload(data_type="original_images", class_name="c0",
                      img_path="/c/7n.png"),
              Payload(data_type="original_images", class_name="c0",
                      img_path="/c/extra.png")])
    g.delete(ids=["p100"])
    hits = g.search(new[0], k=1, method="capacity")[0]
    assert hits[0].id == "p7"
    hits = g.search(new[1], k=1, method="capacity")[0]
    assert hits[0].id == "extra"
    assert g._cap_view is view  # patched, not rebuilt
    # Deleted point is masked out of the capacity tier: its own vector
    # no longer finds it.
    p100_vec = g._vectors[100]
    hits = g.search(p100_vec, k=1, method="capacity")[0]
    assert hits[0].id != "p100"


def test_capacity_tier_filters_and_cache(rng):
    g = Gallery("capf", dim=DIM)
    vecs = _fill(g, rng, 600)
    flt = Filter(must={"class_name": "c2"})
    hits = g.search(vecs[2], k=5, method="capacity", flt=flt)[0]
    assert hits and all(h.payload.class_name == "c2" for h in hits)
    assert hits[0].id == "p2"
    assert len(g._cap_mask_cache) == 1
    cached = next(iter(g._cap_mask_cache.values()))
    g.search(vecs[6], k=5, method="capacity",
             flt=Filter(must={"class_name": "c2"}))
    assert next(iter(g._cap_mask_cache.values())) is cached
    # A write invalidates the filter-mask cache.
    g.upsert(["p0"], vecs[:1],
             [Payload(data_type="original_images", class_name="c2",
                      img_path="/c/0.png")])
    assert len(g._cap_mask_cache) == 0


def test_capacity_auto_route_past_hbm_budget(rng, monkeypatch):
    monkeypatch.setattr(Gallery, "CAPACITY_AUTO_BYTES", 1)
    g = Gallery("capauto", dim=DIM)
    vecs = _fill(g, rng, 300)
    hits = g.search(vecs[9], k=1, exact=False)[0]
    assert hits[0].id == "p9"
    assert g._cap_view is not None      # served via the capacity tier
    assert g._dev_f32 is None           # standard mirrors never built


def test_capacity_headroom_overflow_rebuilds(rng):
    from retrieval_based_object_detection_tpu.gallery.capacity import (
        CapacitySearcher,
    )

    g = Gallery("capovf", dim=DIM)
    _fill(g, rng, 256)
    # Force a view with ZERO effective append slack: chunk=256 makes the
    # padding exactly n (the default 2^18 chunk would leave ~261k rows
    # of slack and never overflow).
    g._cap_view = CapacitySearcher(g._vectors[:256],
                                   g._alive[:256].copy(), chunk=256,
                                   headroom=0)
    assert g._cap_view.capacity_left() == 0
    g._cap_pending.clear()
    extra = _fill(g, rng, 10, start=1000)  # appends exceed headroom
    hits = g.search(extra[3], k=1, method="capacity")[0]
    assert hits[0].id == "p1003"  # rebuilt transparently
    assert g._cap_view.n_rows == 266


def test_pending_replay_does_not_revive_tombstones(rng):
    """The pending-op log must carry EXACT row sets: a covering range
    replayed through upsert_rows marked every row in between valid,
    resurrecting deleted points (review finding)."""
    g = Gallery("caprev", dim=DIM)
    vecs = _fill(g, rng, 400)
    g.search(vecs[0], k=1, method="capacity")  # build the view
    g.delete(ids=["p5"])
    # One upsert touching rows on BOTH sides of the tombstone.
    new = rng.normal(size=(2, DIM)).astype(np.float32)
    g.upsert(["p3", "p7"], new,
             [Payload(data_type="original_images", class_name="c0",
                      img_path=f"/c/{i}.png") for i in (3, 7)])
    hits = g.search(vecs[5], k=1, method="capacity")[0]
    assert hits[0].id != "p5"  # deleted point must NOT resurface
    assert g.search(new[0], k=1, method="capacity")[0][0].id == "p3"
    assert g.search(new[1], k=1, method="capacity")[0][0].id == "p7"


def test_capacity_random_ops_match_exact_oracle():
    """Randomised upsert/delete/search interleavings: the capacity
    tier's top-1 must always match exact search, and tombstoned points
    must never surface (the mask-revival bug class both review passes
    caught, generalised)."""
    rng = np.random.default_rng(77)
    g = Gallery("capfuzz", dim=DIM)
    _fill(g, rng, 300)
    g.search(g._vectors[0], k=1, method="capacity")  # build the view
    live = {f"p{i}" for i in range(300)}
    next_id = 1000
    for step in range(25):
        op = rng.integers(0, 3)
        if op == 0:  # upsert: mix of overwrites and appends
            n_w = int(rng.integers(1, 5))
            ids = []
            for _ in range(n_w):
                if live and rng.random() < 0.5:
                    ids.append(sorted(live)[int(rng.integers(0, len(live)))])
                else:
                    ids.append(f"p{next_id}")
                    next_id += 1
            ids = list(dict.fromkeys(ids))
            vecs = rng.normal(size=(len(ids), DIM)).astype(np.float32)
            g.upsert(ids, vecs,
                     [Payload(data_type="original_images",
                              class_name="c0", img_path=f"/f/{pid}.png")
                      for pid in ids])
            live.update(ids)
        elif op == 1 and len(live) > 5:  # delete some
            victims = [sorted(live)[int(i)] for i in
                       rng.integers(0, len(live), size=2)]
            g.delete(ids=victims)
            live.difference_update(victims)
        else:  # search: capacity top-1 == exact top-1
            target = sorted(live)[int(rng.integers(0, len(live)))]
            row = g._id_to_row[target]
            q = g._vectors[row] + 0.001 * rng.normal(size=DIM).astype(
                np.float32)
            exact = g.search(q, k=3, method="exact")[0]
            cap = g.search(q, k=3, method="capacity")[0]
            assert cap[0].id == exact[0].id == target, (step, target)
            assert all(h.id in live for h in cap), (step, cap)


def test_memmap_backed_gallery_full_lifecycle(rng, tmp_path):
    """The flagship-scale configuration at test scale: disk-backed host
    vectors (vectors_path=), capacity-route searches, id-keyed writes,
    snapshot + mmap restart (VERDICT r3 #2 — bench_capacity_10m drives
    the same lifecycle at 10M on hardware)."""
    import numpy as np

    from retrieval_based_object_detection_tpu.gallery import persist
    from retrieval_based_object_detection_tpu.gallery.schema import (
        Filter, Payload,
    )
    from retrieval_based_object_detection_tpu.gallery.store import (
        Gallery, VectorStore,
    )

    n, d = 3000, 32
    store = VectorStore()
    g = Gallery("mmback", dim=d, capacity=256,
                vectors_path=str(tmp_path / "host.f32"))
    store._collections["mmback"] = g
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    for lo in range(0, n, 500):  # chunked ingest across memmap growth
        g.upsert([f"{i:06d}" for i in range(lo, lo + 500)],
                 vecs[lo:lo + 500],
                 [Payload(data_type="original_images",
                          class_name=f"c{i % 7}",
                          img_path=f"/d/{i}.png")
                  for i in range(lo, lo + 500)])
    assert isinstance(g._vectors, np.memmap)
    hits = g.search(vecs[42], k=5, method="capacity")[0]
    assert hits[0].id == "000042"
    # Filtered capacity search off the disk-backed rows.
    f_hits = g.search(vecs[42], k=3, method="capacity",
                      flt=Filter(must={"class_name": "c0"}))[0]
    assert all(h.payload.class_name == "c0" for h in f_hits)
    # Id-keyed write -> visible through the capacity route.
    nv = rng.normal(size=(1, d)).astype(np.float32)
    g.upsert(["000042"], nv, [Payload(data_type="original_images",
                                      class_name="w",
                                      img_path="/d/new.png")])
    assert g.search(nv[0], k=1, method="capacity")[0][0].id == "000042"
    # Snapshot + mmap restart parity.
    persist.save_store(store, tmp_path / "snap")
    g2 = persist.load_store(tmp_path / "snap",
                            mmap_vectors=True).get("mmback")
    assert len(g2) == n
    np.testing.assert_allclose(g2.retrieve(["000042"])[0].vector, nv[0])
    assert [h.id for h in g2.search(vecs[17], k=5)[0]] == \
        [h.id for h in g.search(vecs[17], k=5)[0]]
