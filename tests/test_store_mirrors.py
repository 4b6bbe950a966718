"""Incremental device-mirror + cached-filter-mask regression tests.

Round-2 write-path rework: ``Gallery.upsert`` is vectorised, device
mirrors (f32/bf16/int8) are patched incrementally with donated
``dynamic_update_slice`` chunks instead of a full O(N·D) host
re-normalise + re-upload per write/query cycle, and per-filter device
masks are cached (no per-query O(N) host mask build).
"""

import numpy as np
import pytest

from retrieval_based_object_detection_tpu.gallery import search as search_lib
from retrieval_based_object_detection_tpu.gallery.schema import Filter, Payload
from retrieval_based_object_detection_tpu.gallery.store import Gallery


def _payload(i, cls="a"):
    return Payload(data_type="original_images", class_name=cls,
                   img_path=f"/img/{i}.jpg")


def _mk(rng, n, dim=32, cls="a", start=0):
    ids = [f"id{start + i}" for i in range(n)]
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    pls = [_payload(start + i, cls) for i in range(n)]
    return ids, vecs, pls


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _top_ids(g, q, **kw):
    return [[r.id for r in hits] for hits in g.search(q, **kw)]


def test_incremental_append_matches_fresh_build(rng):
    dim = 32
    g = Gallery("inc", dim=dim)
    ids, vecs, pls = _mk(rng, 300, dim)
    g.upsert(ids, vecs, pls)
    q = rng.normal(size=(4, dim)).astype(np.float32)
    g.search(q, k=5)  # forces the first full mirror build
    assert g._synced == 300 and g._dev_f32 is not None

    ids2, vecs2, pls2 = _mk(rng, 40, dim, start=300)
    g.upsert(ids2, vecs2, pls2)
    mirror_before = g._dev_f32
    res_inc = _top_ids(g, q, k=5)
    # The mirror was patched, not rebuilt (same padded buffer lineage
    # would be hard to assert; assert no growth and synced advanced).
    assert g._synced == 340

    fresh = Gallery("fresh", dim=dim)
    fresh.upsert(ids + ids2, np.concatenate([vecs, vecs2]), pls + pls2)
    assert res_inc == _top_ids(fresh, q, k=5)
    del mirror_before


def test_incremental_overwrite_matches_fresh_build(rng):
    dim = 16
    g = Gallery("ovw", dim=dim)
    ids, vecs, pls = _mk(rng, 100, dim)
    g.upsert(ids, vecs, pls)
    q = rng.normal(size=(3, dim)).astype(np.float32)
    g.search(q, k=4)
    # Overwrite a mid-range slice with new vectors.
    new_vecs = rng.normal(size=(10, dim)).astype(np.float32)
    g.upsert(ids[40:50], new_vecs, pls[40:50])
    res = _top_ids(g, q, k=4)

    all_vecs = vecs.copy()
    all_vecs[40:50] = new_vecs
    fresh = Gallery("fresh", dim=dim)
    fresh.upsert(ids, all_vecs, pls)
    assert res == _top_ids(fresh, q, k=4)


def test_growth_rebuilds_and_stays_correct(rng):
    dim = 16
    g = Gallery("grow", dim=dim)
    ids, vecs, pls = _mk(rng, 10, dim)
    g.upsert(ids, vecs, pls)
    q = rng.normal(size=(2, dim)).astype(np.float32)
    g.search(q, k=3)
    padded0 = g._padded
    ids2, vecs2, pls2 = _mk(rng, 600, dim, start=10)  # beyond padded0
    g.upsert(ids2, vecs2, pls2)
    res = _top_ids(g, q, k=3)
    assert g._padded > padded0
    fresh = Gallery("fresh", dim=dim)
    fresh.upsert(ids + ids2, np.concatenate([vecs, vecs2]), pls + pls2)
    assert res == _top_ids(fresh, q, k=3)


def test_filter_mask_cache_hit_and_invalidation(rng):
    dim = 16
    g = Gallery("cache", dim=dim)
    ids, vecs, _ = _mk(rng, 50, dim)
    pls = [_payload(i, "a" if i % 2 else "b") for i in range(50)]
    g.upsert(ids, vecs, pls)
    q = rng.normal(size=(2, dim)).astype(np.float32)
    flt = Filter(must={"class_name": "a"})
    g.search(q, k=3, flt=flt)
    assert len(g._mask_cache) == 1
    mask_obj = next(iter(g._mask_cache.values()))
    g.search(q, k=3, flt=Filter(must={"class_name": "a"}))
    assert next(iter(g._mask_cache.values())) is mask_obj  # cache hit
    # Any write invalidates.
    g.upsert([ids[0]], vecs[:1], [pls[0]])
    assert len(g._mask_cache) == 0
    hits = g.search(q, k=3, flt=flt)
    assert all(r.payload.class_name == "a" for h in hits for r in h)


def test_upsert_duplicate_ids_last_wins(rng):
    dim = 8
    g = Gallery("dup", dim=dim)
    v1 = rng.normal(size=(1, dim)).astype(np.float32)
    v2 = rng.normal(size=(1, dim)).astype(np.float32)
    g.upsert(["x", "x"], np.concatenate([v1, v2]),
             [_payload(0), _payload(1)])
    assert len(g) == 1
    rec = g.retrieve(["x"])[0]
    np.testing.assert_allclose(rec.vector, v2[0])
    assert rec.payload.img_path == "/img/1.jpg"


def test_vectorised_payload_roundtrip(rng):
    dim = 8
    g = Gallery("pl", dim=dim)
    ids, vecs, _ = _mk(rng, 20, dim)
    pls = [Payload(data_type="natural_images", class_name=f"c{i % 3}",
                   img_path=f"/p/{i}.jpg", is_cropped=bool(i % 2),
                   is_delegate=(i == 5),
                   delegate_type="medoid" if i == 5 else None)
           for i in range(20)]
    g.upsert(ids, vecs, pls)
    recs, _ = g.scroll(limit=20)
    assert [r.payload for r in recs] == pls
    assert g.get_by_path("/p/7.jpg").id == "id7"
    # Overwrite moves the path index.
    g.upsert(["id7"], vecs[7:8],
             [Payload(data_type="natural_images", class_name="z",
                      img_path="/p/new.jpg")])
    assert g.get_by_path("/p/7.jpg") is None
    assert g.get_by_path("/p/new.jpg").id == "id7"


def test_int8_scan_topk_interpret_matches_xla_int8(rng):
    dim, n, q_n, k = 128, 512, 4, 10
    import jax.numpy as jnp

    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    g_i8 = np.asarray(search_lib.quantize_rows_int8(jnp.asarray(vecs)))
    q = rng.normal(size=(q_n, dim)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[::7] = False

    s_scan, i_scan = search_lib.int8_scan_topk(
        jnp.asarray(q), jnp.asarray(g_i8), jnp.asarray(vecs),
        jnp.asarray(mask), k=k, rescore=64, interpret=True)
    s_ref, i_ref = search_lib.int8_cosine_topk(
        jnp.asarray(q), jnp.asarray(g_i8), jnp.asarray(vecs),
        jnp.asarray(mask), k=k, rescore=64)
    np.testing.assert_allclose(np.asarray(s_scan), np.asarray(s_ref),
                               rtol=1e-6)
    # Indices may permute only among exact ties; scores already compared.
    assert (np.asarray(i_scan) == np.asarray(i_ref)).mean() > 0.95


def test_search_method_int8_on_cpu_small(rng):
    dim = 64
    g = Gallery("i8", dim=dim)
    ids, vecs, pls = _mk(rng, 200, dim)
    g.upsert(ids, vecs, pls)
    q = rng.normal(size=(2, dim)).astype(np.float32)
    exact = _top_ids(g, q, k=5, method="exact")
    i8 = _top_ids(g, q, k=5, method="int8")
    assert exact == i8  # rescore recovers exact top-k on random data


def test_overwrite_patches_only_dirty_range(rng):
    """A one-row overwrite after mirrors are synced must patch the dirty
    chunk only — not re-push the whole gallery (the round-2 regression:
    hi extended to n unconditionally)."""
    g = Gallery("t", dim=16)
    n = 2000
    vecs = rng.normal(size=(n, 16)).astype(np.float32)
    g.upsert([f"id{i}" for i in range(n)], vecs,
             [Payload(data_type="original_images", class_name="c",
                      img_path=f"/{i}.png") for i in range(n)])
    probe = rng.normal(size=(16,)).astype(np.float32)
    g.search(probe, k=1)  # build + sync mirrors

    patched = []
    orig = g._patch_mirrors
    g._patch_mirrors = lambda lo, hi: (patched.append((lo, hi)),
                                       orig(lo, hi))[1]
    new0 = rng.normal(size=(1, 16)).astype(np.float32)
    g.upsert(["id0"], new0,
             [Payload(data_type="original_images", class_name="c",
                      img_path="/0.png")])
    hits = g.search(new0[0], k=1)[0]
    assert hits[0].id == "id0"
    assert patched == [(0, 1)], patched  # one dirty row, not (0, 2000)


def test_overwrite_plus_append_patches_disjoint_ranges(rng):
    """One upsert that rewrites row 0 AND appends must patch TWO disjoint
    ranges — not the covering span (0, n), which would re-push the whole
    gallery (ADVICE r2)."""
    g = Gallery("oa", dim=16)
    n = 2000
    vecs = rng.normal(size=(n, 16)).astype(np.float32)
    pls = [Payload(data_type="original_images", class_name="c",
                   img_path=f"/{i}.png") for i in range(n)]
    g.upsert([f"id{i}" for i in range(n)], vecs, pls)
    probe = rng.normal(size=(16,)).astype(np.float32)
    g.search(probe, k=1)  # build + sync mirrors

    patched = []
    orig = g._patch_mirrors
    g._patch_mirrors = lambda lo, hi: (patched.append((lo, hi)),
                                       orig(lo, hi))[1]
    batch_v = rng.normal(size=(4, 16)).astype(np.float32)
    batch_p = [Payload(data_type="original_images", class_name="c",
                       img_path=p) for p in
               ["/0.png", "/n0.png", "/n1.png", "/n2.png"]]
    g.upsert(["id0", "new0", "new1", "new2"], batch_v, batch_p)
    res = _top_ids(g, batch_v, k=1)
    assert res == [["id0"], ["new0"], ["new1"], ["new2"]]
    assert patched == [(0, 1), (n, n + 3)], patched


def test_resolved_index_survives_writes_incrementally(rng, tmp_path):
    """The resolved-path fallback index must be PATCHED across writes,
    not dropped wholesale (ADVICE r2: write+miss-lookup interleave
    rebuilt it O(N) with per-row syscalls every time)."""
    import os

    g = Gallery("ri", dim=8)
    imgs = []
    for i in range(20):
        p = tmp_path / f"im{i}.png"
        p.write_bytes(b"x")
        imgs.append(str(p))
    g.upsert([f"id{i}" for i in range(20)],
             rng.normal(size=(20, 8)).astype(np.float32),
             [Payload(data_type="original_images", class_name="c",
                      img_path=imgs[i]) for i in range(20)])
    # Miss-path lookup (relative spelling) builds the index.
    rel = os.path.relpath(imgs[3])
    assert g.get_by_path(rel).id == "id3"
    idx_obj = g._resolved_paths
    assert idx_obj is not None

    # Overwrite id3's path + append a new point: the index object
    # survives (incremental patch, not wholesale clear).
    newp = tmp_path / "renamed.png"
    newp.write_bytes(b"x")
    g.upsert(["id3", "id20"],
             rng.normal(size=(2, 8)).astype(np.float32),
             [Payload(data_type="original_images", class_name="c",
                      img_path=str(newp)),
              Payload(data_type="original_images", class_name="c",
                      img_path=str(tmp_path / "fresh.png"))])
    assert g._resolved_paths is idx_obj
    assert g.get_by_path(rel) is None  # old spelling no longer matches
    assert g.get_by_path(os.path.relpath(str(newp))).id == "id3"
    assert g.get_by_path("./" + os.path.relpath(
        str(tmp_path / "fresh.png"))).id == "id20"
    assert g._resolved_paths is idx_obj

    # A small delete TOMBSTONES (no compaction): the index survives and
    # the dead row's entry is removed in place.
    g.delete(ids=["id0"])
    assert g._resolved_paths is idx_obj
    assert g.get_by_path(os.path.relpath(imgs[0])) is None
    assert g.get_by_path(os.path.relpath(str(newp))).id == "id3"
    # Explicit compaction renumbers rows -> the index must rebuild.
    assert g.compact() == 1
    assert g._resolved_paths is None
    assert g.get_by_path(os.path.relpath(str(newp))).id == "id3"
