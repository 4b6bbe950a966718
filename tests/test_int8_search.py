"""int8 scan + f32 rescore search path: exactness vs the f32 reference."""

import numpy as np

from retrieval_based_object_detection_tpu.gallery import Filter, Payload
from retrieval_based_object_detection_tpu.gallery.store import Gallery

DIM = 64


def fill(g, n, rng, cls="c"):
    vecs = rng.normal(size=(n, DIM)).astype(np.float32)
    g.upsert([f"{cls}{i}" for i in range(n)], vecs,
             [Payload(data_type="original_images", class_name=cls,
                      img_path=f"/{cls}/{i}.png") for i in range(n)])
    return vecs


def test_int8_matches_exact_topk(rng):
    g = Gallery("t", dim=DIM)
    fill(g, 2000, rng)
    queries = rng.normal(size=(8, DIM)).astype(np.float32)
    exact = g.search(queries, k=10, method="exact")
    fast = g.search(queries, k=10, method="int8")
    for e_hits, f_hits in zip(exact, fast):
        assert [h.id for h in e_hits] == [h.id for h in f_hits]
        for e, f in zip(e_hits, f_hits):
            # Rescore is f32: scores match the exact path to fp tolerance.
            assert abs(e.score - f.score) < 1e-4


def test_int8_respects_filter(rng):
    g = Gallery("t", dim=DIM)
    fill(g, 300, rng, cls="a")
    vb = fill(g, 300, rng, cls="b")
    hits = g.search(vb[0], k=5, method="int8",
                    flt=Filter(must={"class_name": "a"}))[0]
    assert all(h.payload.class_name == "a" for h in hits)


def test_int8_after_write_invalidation(rng):
    g = Gallery("t", dim=DIM)
    vecs = fill(g, 100, rng)
    _ = g.search(vecs[0], k=1, method="int8")  # build int8 mirror
    new = rng.normal(size=DIM).astype(np.float32)
    g.upsert(["brand-new"], new[None],
             [Payload(data_type="original_images", class_name="z")])
    hits = g.search(new, k=1, method="int8")[0]
    assert hits[0].id == "brand-new"  # stale mirror would miss it


def test_int8_small_gallery(rng):
    g = Gallery("t", dim=DIM)
    vecs = fill(g, 3, rng)
    hits = g.search(vecs[1], k=10, method="int8")[0]
    assert hits[0].id == "c1" and len(hits) == 3
