"""Property test: a LAZILY loaded gallery is observationally identical
to an eagerly loaded twin under any op sequence.

The restart path now has real machinery behind laziness — raw-id-table
binary probes with alive-awareness, per-row path slices off the unsplit
blob, pending path overlays from row-indexed delta replay, and
materialise-on-write transitions (store._row_of / _id_at,
schema._row_path_lazy / _pending_paths). This drives random churn +
delta chains through a save, loads the snapshot both ways, then applies
a random interleaving of reads and writes to both galleries — every
observable (retrieve, search ids+scores, scroll, count, get_by_path,
delete counts) must agree at every step.
"""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from retrieval_based_object_detection_tpu.gallery import persist
from retrieval_based_object_detection_tpu.gallery.schema import Filter, Payload
from retrieval_based_object_detection_tpu.gallery.store import (
    Gallery,
    VectorStore,
)

DIM = 8
N0 = 64
IDS = [f"p{i:04d}" for i in range(N0 + 16)]


def _payload(i, cls):
    return Payload(data_type="original_images", class_name=cls,
                   img_path=f"/img/{i}.png", is_segmented=bool(i % 2))


# ops applied BEFORE the save (shape the delta chain) and AFTER the
# load (exercise the lazy state machine).
op = st.one_of(
    st.tuples(st.just("upsert"), st.integers(0, len(IDS) - 1),
              st.sampled_from(["a", "b"])),
    st.tuples(st.just("delete"), st.integers(0, len(IDS) - 1)),
    st.tuples(st.just("retrieve"), st.integers(0, len(IDS) - 1)),
    st.tuples(st.just("search"), st.integers(0, 2 ** 16)),
    st.tuples(st.just("count"), st.sampled_from(
        [None, {"class_name": "a"}, {"is_segmented": True}])),
    st.tuples(st.just("by_path"), st.integers(0, len(IDS) - 1)),
    st.tuples(st.just("scroll"), st.sampled_from(
        [None, {"class_name": "b"}])),
)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(pre=st.lists(op, max_size=10), post=st.lists(op, max_size=14),
       seed=st.integers(0, 2 ** 16))
def test_lazy_load_equals_eager_load(pre, post, seed, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("lz")
    rng = np.random.default_rng(seed)
    store = VectorStore()
    g = Gallery("lz", dim=DIM)
    store._collections["lz"] = g
    vecs = rng.normal(size=(N0, DIM)).astype(np.float32)
    g.upsert(IDS[:N0], vecs, [_payload(i, "a") for i in range(N0)])
    persist.save_store(store, tmp_path)          # base

    def apply(gal, o, rng_op):
        kind = o[0]
        if kind == "upsert":
            _, i, cls = o
            v = rng_op.normal(size=(1, DIM)).astype(np.float32)
            gal.upsert([IDS[i]], v, [_payload(i, cls)])
            return ("w", None)
        if kind == "delete":
            return ("d", gal.delete(ids=[IDS[o[1]]]))
        if kind == "retrieve":
            r = gal.retrieve([IDS[o[1]]])
            return ("r", [(x.id, x.payload,
                           np.asarray(x.vector).round(5).tobytes())
                          for x in r])
        if kind == "search":
            q = np.random.default_rng(o[1]).normal(size=DIM)
            hits = gal.search(q.astype(np.float32), k=5)[0]
            return ("s", [(h.id, round(h.score, 5)) for h in hits])
        if kind == "count":
            flt = Filter(must=o[1]) if o[1] else None
            return ("c", gal.count(flt))
        if kind == "by_path":
            r = gal.get_by_path(f"/img/{o[1]}.png")
            return ("p", None if r is None else (r.id, r.payload))
        if kind == "scroll":
            flt = Filter(must=o[1]) if o[1] else None
            return ("l", [(x.id, x.payload) for x in gal.scroll_all(flt)])
        raise AssertionError(kind)

    # Pre-save churn -> one or more row-indexed deltas.
    rng_pre = np.random.default_rng(seed + 1)
    for o in pre:
        apply(g, o, rng_pre)
    persist.save_store(store, tmp_path)          # delta (maybe empty)

    lazy = persist.load_store(tmp_path, mmap_vectors=True).get("lz")
    eager = persist.load_store(tmp_path, mmap_vectors=False).get("lz")
    # Force the "eager" twin onto the dict-backed paths — a binary load
    # is lazy regardless of mmap_vectors, and two lazy twins would let
    # a systematic probe/overlay bug agree with itself (review finding).
    _ = eager._id_to_row
    eager._payloads._ensure_paths()
    assert eager._id_map is not None
    assert eager._payloads._paths_lazy is None

    rng_a = np.random.default_rng(seed + 2)
    rng_b = np.random.default_rng(seed + 2)
    for o in post:
        ra = apply(lazy, o, rng_a)
        rb = apply(eager, o, rng_b)
        assert ra == rb, (o, ra, rb)
    assert len(lazy) == len(eager)
