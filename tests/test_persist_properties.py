"""Model-based durability test for the incremental snapshot chain.

Random interleavings of upsert / delete / save / reload are replayed
against a plain-dict reference model; after EVERY save+reload the
on-disk state (base + delta chain) must reconstruct exactly what the
model holds — ids, vectors, payload class, deletions, resurrections,
chain continuation after reload, and threshold-triggered chain
collapse all under one oracle.
"""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from retrieval_based_object_detection_tpu.gallery import persist
from retrieval_based_object_detection_tpu.gallery.schema import Payload
from retrieval_based_object_detection_tpu.gallery.store import VectorStore

DIM = 8
IDS = [f"p{i}" for i in range(12)]


def _payload(pid, tag):
    return Payload(data_type="original_images", class_name=f"cls{tag}",
                   img_path=f"/pp/{pid}_{tag}.png")


ops = st.lists(
    st.one_of(
        st.tuples(st.just("upsert"),
                  st.lists(st.sampled_from(range(len(IDS))), min_size=1,
                           max_size=4, unique=True),
                  st.integers(0, 1000)),
        st.tuples(st.just("delete"),
                  st.lists(st.sampled_from(range(len(IDS))), min_size=1,
                           max_size=3, unique=True)),
        st.tuples(st.just("save")),
        st.tuples(st.just("reload")),
    ),
    min_size=3, max_size=18,
)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ops=ops, seed=st.integers(0, 2**31 - 1))
def test_snapshot_chain_matches_reference_model(ops, seed, tmp_path_factory):
    root = tmp_path_factory.mktemp("chain")
    rng = np.random.default_rng(seed)
    store = VectorStore()
    g = store.create_collection("pp", dim=DIM)
    model: dict[str, tuple[np.ndarray, str]] = {}

    def check(gallery):
        assert len(gallery) == len(model)
        for pid, (vec, cls) in model.items():
            rec = gallery.retrieve([pid])
            assert rec, pid
            np.testing.assert_allclose(rec[0].vector, vec, atol=1e-6)
            assert rec[0].payload.class_name == cls, pid
        for pid in IDS:
            if pid not in model:
                assert gallery.retrieve([pid]) == []

    for op in ops:
        if op[0] == "upsert":
            _, idxs, tag = op
            pids = [IDS[i] for i in idxs]
            vecs = rng.normal(size=(len(pids), DIM)).astype(np.float32)
            g.upsert(pids, vecs, [_payload(p, tag) for p in pids])
            for p, v in zip(pids, vecs):
                model[p] = (v.copy(), f"cls{tag}")
        elif op[0] == "delete":
            pids = [IDS[i] for i in op[1]]
            expected = sum(1 for p in pids if p in model)
            assert g.delete(ids=pids) == expected
            for p in pids:
                model.pop(p, None)
        elif op[0] == "save":
            persist.save_store(store, root)
            loaded = persist.load_store(root).get("pp")
            check(loaded)
        else:  # reload: continue operating on the reconstructed store
            persist.save_store(store, root)
            store = persist.load_store(root)
            g = store.get("pp")
            check(g)
    persist.save_store(store, root)
    check(persist.load_store(root).get("pp"))
    check(persist.load_store(root, mmap_vectors=True).get("pp"))
