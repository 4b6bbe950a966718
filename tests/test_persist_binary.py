"""Format-3 binary snapshot meta (VERDICT r3 #4): roundtrip fidelity,
lazy id/path materialisation, v2 backward compatibility, delta interop."""

import json

import numpy as np
import pytest

from retrieval_based_object_detection_tpu import native
from retrieval_based_object_detection_tpu.gallery import persist
from retrieval_based_object_detection_tpu.gallery.schema import Filter, Payload
from retrieval_based_object_detection_tpu.gallery.store import (
    Gallery,
    VectorStore,
)

DIM = 16


def _mk(rng, n, start=0):
    ids = [f"{start + i:032x}" for i in range(n)]
    vecs = rng.normal(size=(n, DIM)).astype(np.float32)
    pls = [Payload(data_type="original_images",
                   class_name=f"cls{(start + i) % 3}",
                   img_path=f"/data/c{(start + i) % 3}/img_{start + i}.png",
                   is_segmented=bool(i % 2),
                   is_delegate=False) for i in range(n)]
    return ids, vecs, pls


def _roundtrip(store, tmp_path, mmap_vectors=False):
    persist.save_store(store, tmp_path)
    return persist.load_store(tmp_path, mmap_vectors=mmap_vectors)


@pytest.mark.parametrize("mmap_vectors", [False, True])
def test_binary_roundtrip_full_fidelity(rng, tmp_path, mmap_vectors):
    store = VectorStore()
    g = store.create_collection("bin", dim=DIM)
    ids, vecs, pls = _mk(rng, 300)
    g.upsert(ids, vecs, pls)
    # A delegate row with None delegate_type decode + unicode strings.
    g.upsert(["dlg"], rng.normal(size=(1, DIM)).astype(np.float32),
             [Payload(data_type="original_images", class_name="콜라-제로",
                      img_path="/데이터/콜라.png", is_delegate=True,
                      delegate_type="average")])
    g2 = _roundtrip(store, tmp_path, mmap_vectors).get("bin")
    assert len(g2) == 301
    assert g2._ids == g._ids
    for pid in [ids[0], ids[157], "dlg"]:
        a = g.retrieve([pid])[0]
        b = g2.retrieve([pid])[0]
        np.testing.assert_allclose(a.vector, b.vector)
        assert a.payload == b.payload
    # Filters over the re-imported coded/bool columns.
    for flt in (Filter(must={"class_name": "cls1"}),
                Filter(must={"is_segmented": True}),
                Filter(must={"is_delegate": True}),
                Filter(must={"delegate_type": None, "class_name": "cls2"})):
        assert g2.count(flt) == g.count(flt), flt
    # Path lookup through the lazily-built index.
    assert g2.get_by_path("/데이터/콜라.png").id == "dlg"
    assert g2.get_by_path(ids and f"/data/c1/img_1.png").id == ids[1]
    # Search parity.
    q = vecs[42]
    assert [h.id for h in g2.search(q, k=3)[0]] == \
        [h.id for h in g.search(q, k=3)[0]]


def test_load_is_lazy_until_first_use(rng, tmp_path):
    store = VectorStore()
    g = store.create_collection("lazy", dim=DIM)
    ids, vecs, pls = _mk(rng, 2000)
    g.upsert(ids, vecs, pls)
    persist.save_store(store, tmp_path)
    g2 = persist.load_store(tmp_path, mmap_vectors=True).get("lazy")
    # Nothing materialised by the load itself:
    assert g2._ids_list is None and g2._ids_arr is not None
    assert g2._id_map is None
    assert g2._payloads._paths_lazy is not None
    # len/count don't materialise (header-sized work only).
    assert len(g2) == 2000
    assert g2._ids_list is None and g2._id_map is None
    # First id-keyed op builds the map; first path op builds the index.
    assert g2.retrieve([ids[5]])[0].payload.class_name == "cls2"
    assert g2._id_map is not None
    assert g2.get_by_path("/data/c0/img_0.png").id == ids[0]
    assert g2._payloads._paths_lazy is None
    # And writes after materialisation behave normally.
    g2.upsert(["new"], rng.normal(size=(1, DIM)).astype(np.float32),
              [Payload(data_type="original_images", class_name="cls0",
                       img_path="/data/new.png")])
    assert g2.get_by_path("/data/new.png").id == "new"


def test_write_after_lazy_load_before_any_read(rng, tmp_path):
    """An upsert as the VERY FIRST op after a lazy load must materialise
    whatever it needs (grow + path bookkeeping + id map) correctly."""
    store = VectorStore()
    g = store.create_collection("wfirst", dim=DIM)
    ids, vecs, pls = _mk(rng, 1500)
    g.upsert(ids, vecs, pls)
    persist.save_store(store, tmp_path)
    g2 = persist.load_store(tmp_path, mmap_vectors=True).get("wfirst")
    # Overwrite an existing id + append, NO reads first.
    nv = rng.normal(size=(2, DIM)).astype(np.float32)
    g2.upsert([ids[7], "fresh"], nv,
              [Payload(data_type="original_images", class_name="x",
                       img_path="/data/seven.png"),
               Payload(data_type="original_images", class_name="x",
                       img_path="/data/fresh.png")])
    assert len(g2) == 1501
    np.testing.assert_allclose(g2.retrieve([ids[7]])[0].vector, nv[0])
    assert g2.get_by_path("/data/seven.png").id == ids[7]
    # The OLD path of the overwritten row no longer resolves to it.
    assert g2.get_by_path("/data/c1/img_7.png") is None
    # Delete as first op also works on a fresh lazy load.
    g3 = persist.load_store(tmp_path, mmap_vectors=True).get("wfirst")
    assert g3.delete(ids=[ids[3]]) == 1
    assert g3.retrieve([ids[3]]) == []


def test_delta_chain_over_binary_base(rng, tmp_path):
    store = VectorStore()
    g = store.create_collection("mix", dim=DIM)
    ids, vecs, pls = _mk(rng, 200)
    g.upsert(ids, vecs, pls)
    persist.save_store(store, tmp_path)  # format-3 base
    g.upsert(["extra"], rng.normal(size=(1, DIM)).astype(np.float32),
             [Payload(data_type="original_images", class_name="z",
                      img_path="/z.png")])
    g.delete(ids=[ids[5]])
    persist.save_store(store, tmp_path)  # v2-JSON delta over binary base
    assert (tmp_path / "mix.rbod.d1").exists()
    g2 = persist.load_store(tmp_path, mmap_vectors=True).get("mix")
    assert len(g2) == 200
    assert g2.retrieve(["extra"])[0].payload.class_name == "z"
    assert g2.retrieve([ids[5]]) == []
    # Clean reload + save is still a no-op (chain identity carried).
    base_m = (tmp_path / "mix.rbod").stat().st_mtime_ns
    store2 = VectorStore()
    store2._collections["mix"] = g2
    persist.save_store(store2, tmp_path)
    assert (tmp_path / "mix.rbod").stat().st_mtime_ns == base_m


def test_format2_snapshots_still_load(rng, tmp_path):
    """Round-3 (v2 JSON) snapshots remain loadable."""
    g = Gallery("old", dim=DIM)
    ids, vecs, pls = _mk(rng, 64)
    g.upsert(ids, vecs, pls)
    g.compact()
    meta = {
        "format": 2,
        "snapshot_id": "abc",
        "name": "old",
        "dim": DIM,
        "distance": "cosine",
        "ids": list(g._ids),
        "columns": g._payloads.export_columns(64),
    }
    native.snapshot_write(tmp_path / "old.rbod", g._vectors[:64],
                          json.dumps(meta).encode())
    (tmp_path / "manifest.json").write_text(
        json.dumps({"collections": ["old"]}))
    for mm in (False, True):
        g2 = persist.load_store(tmp_path, mmap_vectors=mm).get("old")
        assert g2._ids == ids
        assert g2.get_by_path("/data/c1/img_1.png").id == ids[1]
        np.testing.assert_allclose(g2.retrieve([ids[3]])[0].vector,
                                   vecs[3])


def test_empty_and_tiny_collections(rng, tmp_path):
    store = VectorStore()
    store.create_collection("empty", dim=DIM)
    g = store.create_collection("one", dim=DIM)
    g.upsert(["solo"], rng.normal(size=(1, DIM)).astype(np.float32),
             [Payload(data_type="original_images", class_name="s",
                      img_path="")])  # empty path stays out of the index
    s2 = _roundtrip(store, tmp_path, mmap_vectors=True)
    assert len(s2.get("empty")) == 0
    assert s2.get("empty").search(np.zeros(DIM, np.float32), k=3) == [[]]
    assert len(s2.get("one")) == 1
    assert s2.get("one").retrieve(["solo"])[0].payload.img_path == ""
    assert s2.get("one").get_by_path("") is None


def test_variable_width_ids(rng, tmp_path):
    store = VectorStore()
    g = store.create_collection("vw", dim=DIM)
    ids = ["a", "id-with-some-length", "x" * 200, "유니코드-아이디"]
    vecs = rng.normal(size=(4, DIM)).astype(np.float32)
    g.upsert(ids, vecs,
             [Payload(data_type="original_images", class_name="c",
                      img_path=f"/p{i}.png") for i in range(4)])
    g2 = _roundtrip(store, tmp_path).get("vw")
    assert g2._ids == ids
    for i, pid in enumerate(ids):
        np.testing.assert_allclose(g2.retrieve([pid])[0].vector, vecs[i])
