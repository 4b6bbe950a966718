"""Property-based model test of the Gallery's Qdrant-contract semantics.

A random interleaving of upserts (new ids, overwrites, duplicate-id
batches), deletes (by id and by filter), scrolls, counts and searches is
applied both to the Gallery and to a plain-Python dict model; every
observable must agree. This is the strongest form of the "idempotent
upsert / filtered scroll / exact count / cosine search" contract claims
(SURVEY §2 #4/#12), exercising the incremental-mirror and mask-cache
machinery through thousands of interleavings.
"""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from retrieval_based_object_detection_tpu.gallery.schema import Filter, Payload
from retrieval_based_object_detection_tpu.gallery.store import Gallery

DIM = 8
IDS = [f"p{i}" for i in range(12)]
CLASSES = ["a", "b"]
FILTERS = [
    None,
    {"class_name": "a"},
    {"is_delegate": True},
    {"class_name": "b", "is_segmented": True},
    {"data_type": "natural_images"},
]


def _payload(cls, delegate, segmented, path_i):
    return Payload(
        data_type="natural_images" if segmented else "original_images",
        class_name=cls, is_delegate=delegate, is_segmented=segmented,
        delegate_type="average" if delegate else None,
        img_path=f"/img/{path_i}.jpg")


op_upsert = st.tuples(
    st.just("upsert"),
    st.lists(st.sampled_from(IDS), min_size=1, max_size=4),
    st.randoms(use_true_random=False),
    st.sampled_from(CLASSES),
    st.booleans(),
    st.booleans(),
)
op_delete_ids = st.tuples(st.just("delete_ids"),
                          st.lists(st.sampled_from(IDS), min_size=1,
                                   max_size=3))
op_delete_flt = st.tuples(st.just("delete_flt"),
                          st.sampled_from(FILTERS[1:]))
op_check = st.tuples(st.just("check"), st.sampled_from(FILTERS))
op_search = st.tuples(st.just("search"), st.sampled_from(FILTERS))

ops_strategy = st.lists(
    st.one_of(op_upsert, op_delete_ids, op_delete_flt, op_check, op_search),
    min_size=1, max_size=24)


def _model_match(row, must):
    if must is None:
        return True
    return all(getattr(row["payload"], k) == v for k, v in must.items())


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ops=ops_strategy, seed=st.integers(0, 2 ** 16))
def test_gallery_matches_dict_model(ops, seed):
    rng = np.random.default_rng(seed)
    g = Gallery("prop", dim=DIM)
    model: dict[str, dict] = {}  # id -> {"vector", "payload"}
    order: list[str] = []        # insertion order of live ids

    qi = 0
    for op in ops:
        kind = op[0]
        if kind == "upsert":
            _, ids, _, cls, delegate, segmented = op
            vecs = rng.normal(size=(len(ids), DIM)).astype(np.float32)
            pls = [_payload(cls, delegate, segmented, i)
                   for i in range(len(ids))]
            g.upsert(ids, vecs, pls)
            for i, pid in enumerate(ids):  # last-wins, like the store
                if pid not in model:
                    order.append(pid)
                model[pid] = {"vector": vecs[i], "payload": pls[i]}
        elif kind == "delete_ids":
            _, ids = op
            removed = g.delete(ids=ids)
            expect = sum(1 for pid in set(ids) if pid in model)
            assert removed == expect
            for pid in set(ids):
                if pid in model:
                    del model[pid]
                    order.remove(pid)
        elif kind == "delete_flt":
            _, must = op
            removed = g.delete(flt=Filter(must=must))
            victims = [pid for pid in order
                       if _model_match(model[pid], must)]
            assert removed == len(victims)
            for pid in victims:
                del model[pid]
                order.remove(pid)
        elif kind == "check":
            _, must = op
            flt = Filter(must=must) if must else None
            expect_ids = [pid for pid in order
                          if _model_match(model[pid], must)]
            assert g.count(flt) == len(expect_ids)
            recs = g.scroll_all(flt, with_vectors=True)
            assert [r.id for r in recs] == expect_ids
            for r in recs:
                np.testing.assert_allclose(r.vector,
                                           model[r.id]["vector"])
                assert r.payload == model[r.id]["payload"]
        elif kind == "search":
            _, must = op
            flt = Filter(must=must) if must else None
            qi += 1
            q = rng.normal(size=DIM).astype(np.float32)
            hits = g.search(q, k=3, flt=flt)[0]
            cand = [pid for pid in order if _model_match(model[pid], must)]
            if not cand:
                assert hits == []
                continue
            qn = q / max(np.linalg.norm(q), 1e-12)
            sims = {}
            for pid in cand:
                v = model[pid]["vector"]
                sims[pid] = float(qn @ (v / max(np.linalg.norm(v), 1e-12)))
            expect = sorted(cand, key=lambda p: -sims[p])[:3]
            got = [r.id for r in hits]
            # scores must match to fp tolerance; ids up to exact ties
            for r in hits:
                np.testing.assert_allclose(r.score, sims[r.id], atol=1e-5)
            assert sorted(sims[p] for p in got) == sorted(
                sims[p] for p in got)
            assert abs(len(got) - len(expect)) == 0
            for a, b in zip(got, expect):
                if a != b:
                    np.testing.assert_allclose(sims[a], sims[b], atol=1e-5)
